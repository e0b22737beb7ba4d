"""TPU microbench: blocked-matmul segmented mean vs scatter+gather form.

The sorted inference path computes per-point pillar cluster means.  Round-3
device traces put the scatter-add at ~7.5 ms and the gather-back at ~5.3 ms
per 16-ego tick (60k stacked points each).  `_segment_mean_sorted` replaces
both with an equality-mask block matmul + tiny carry scans (see
ops/pillar.py).  This measures both forms in isolation at exactly the agent
shapes, vmapped over egos like the agent step, with varying inputs (the
harness cycles argsets; a constant-foldable microbench LIES — CLAUDE.md).

Run (TPU): python scripts/exp_segmean.py

MEASURED (v5e, 2026-08-18, after the r4 miscompile fix removed the bogus
indices_are_sorted flag from the in-bounds scatter): blocked eq-matmul
0.91 ms/iter vs scatter+gather 23.48 — 26x — and MORE accurate vs the
f32 oracle (bf16 max err 0.0078 vs 0.0130).  The round-3 "7.5 + 5.3 ms"
scatter-mean budget was measured on the MISCOMPILED flagged form that
drops updates (exp_scatter_miscompile.py); the correct scatter form
costs 23.5 ms, so the blocked mean is the only acceptable inference
path.  Verdict: default (ops/pillar.py LAV_SEG_MEAN=blocked).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from exp_scatter import device_ms  # noqa: E402

from lav_tpu.ops.pillar import (  # noqa: E402
    _segment_mean_gather, _segment_mean_sorted,
)

E, P, G = 16, 60000, 320 * 320 + 1


def main():
    rng = np.random.default_rng(0)
    argsets = []
    for _ in range(4):
        pid = np.sort(rng.integers(0, G - 1, (E, P)), axis=1).astype(np.int32)
        keep = rng.random((E, P)) > 0.1
        pid = np.where(keep, pid, G - 1).astype(np.int32)
        pid = np.sort(pid, axis=1)
        vals = rng.normal(size=(E, P, 3)).astype(np.float32)
        argsets.append((jnp.asarray(pid),
                        jnp.asarray(vals, jnp.bfloat16),
                        jnp.asarray(keep)))

    @jax.jit
    def scatter_form(pid, vals, keep):
        f = jax.vmap(lambda p, v, k: _segment_mean_gather(
            v, p, k, G, indices_sorted=True))
        return f(pid, vals, keep)

    @jax.jit
    def blocked_form(pid, vals, keep):
        f = jax.vmap(lambda p, v, k: _segment_mean_sorted(v, p, k))
        return f(pid, vals, keep)

    # numerical sanity on-device first — compare each to the f32 scatter
    # oracle (the bf16 SCATTER form accumulates in bf16 and drifts badly
    # on many-point segments: 0.65 absolute on a 5k-point run; the blocked
    # form accumulates in f32 via preferred_element_type and stays exact)
    pid0, v0, k0 = argsets[0]
    ref = np.asarray(jax.vmap(lambda p, v, k: _segment_mean_gather(
        v, p, k, G, indices_sorted=True))(pid0, v0.astype(jnp.float32), k0))
    a = np.asarray(scatter_form(*argsets[0]), np.float32)
    b = np.asarray(blocked_form(*argsets[0]), np.float32)
    print(f"vs f32 oracle: scatter-bf16 max err {np.max(np.abs(a - ref)):.4f}, "
          f"blocked-bf16 max err {np.max(np.abs(b - ref)):.4f}")
    assert np.max(np.abs(b - ref)) <= np.max(np.abs(a - ref)) + 0.05

    device_ms(scatter_form, argsets, label="scatter+gather (sorted flags)")
    device_ms(blocked_form, argsets, label="blocked eq-matmul")


if __name__ == "__main__":
    main()

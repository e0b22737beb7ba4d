"""Does the drop-mode scatter's cost scale with IN-BOUNDS rows or ALL rows?

If OOB (dropped) rows are cheap at issue time, the sorted canvas emit can
pre-merge adjacent equal-pid pairs (one masked elementwise pass) and mark
the merged-away rows OOB — halving the effective update count per level.

Run (TPU): python scripts/exp_canvas_oob.py

MEASURED (v5e, 2026-08-18): 7.34 ms/iter at 0%, 50% AND 90% OOB — the
flagged drop-mode emitter pays per ISSUED row whether or not it lands,
so pre-merging sorted pairs (marking merged-away rows OOB) saves
nothing.  The canvas emit is a ~7.6 ns/row floor at 16x60k rows; only
genuinely fewer rows (point budget) can shrink it.  Verdict: no change.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from exp_scatter import device_ms  # noqa: E402

G, P, C, E = 320 * 320, 60000, 128, 16


def main():
    rng = np.random.default_rng(3)

    def form():
        def one(p, v):
            return jnp.zeros((G, C), v.dtype).at[p].max(
                v, mode="drop", indices_are_sorted=True)
        return jax.jit(jax.vmap(one))

    f = form()
    for frac_oob in (0.0, 0.5, 0.9):
        argsets = []
        for _ in range(4):
            pid = np.sort(rng.integers(0, G, (E, P)), axis=1).astype(np.int32)
            # mark a sorted-preserving suffix-per-run subset OOB
            oob = rng.random((E, P)) < frac_oob
            pid = np.where(oob, G, pid).astype(np.int32)
            pid = np.sort(pid, axis=1)
            vals = rng.normal(size=(E, P, C)).astype(np.float32)
            argsets.append((jnp.asarray(pid), jnp.asarray(vals, jnp.bfloat16)))
        device_ms(f, argsets, label=f"drop-max oob={frac_oob:.0%}")


if __name__ == "__main__":
    main()

"""Regression guards for the round-4 XLA TPU scatter miscompile.

XLA's TPU emitter miscompiles vmapped `indices_are_sorted=True` scatters
with 128-wide update rows in PROMISE_IN_BOUNDS mode — most updates are
silently dropped (scripts/exp_scatter_miscompile.py documents the full
form-by-form campaign; max|tpu-cpu| ~9.3 at agent shapes).  The fix keeps
the flag ONLY on the drop-mode canvas scatter-max (verified exact, and
genuinely 2x).

Two guards:

1. (always, CPU) a STATIC jaxpr audit of the production pillar featurizer
   at agent shapes: no scatter may carry the poisoned combination
   (sorted + in-bounds + >=128-wide updates).  This catches the flag
   being reintroduced by a refactor — the failure mode is silent wrong
   answers on hardware the test suite never touches.
2. (opt-in, LAV_TPU_TESTS=1) the numeric TPU-vs-CPU check of the three
   production segment-op forms, the same math bench.py::numerics_guard
   re-runs before every published number.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lav_tpu.ops import pillar


SCATTER_PRIMS = {"scatter", "scatter-add", "scatter-max", "scatter-min",
                 "scatter-mul"}


def _iter_scatters(jaxpr):
    """Yield (primitive_name, params, update_width) for every scatter in a
    jaxpr, recursing into call/scan/cond/pjit sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in SCATTER_PRIMS:
            upd = eqn.invars[2].aval.shape
            width = upd[-1] if len(upd) else 1
            yield eqn.primitive.name, eqn.params, width
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", v)
            if hasattr(sub, "eqns"):
                yield from _iter_scatters(sub)
            elif isinstance(v, (list, tuple)):
                for vi in v:
                    svi = getattr(vi, "jaxpr", vi)
                    if hasattr(svi, "eqns"):
                        yield from _iter_scatters(svi)


def test_no_poisoned_scatter_form_in_featurizer():
    """Static audit at production shapes (vmapped 2-ego, 320x320 grid,
    C=128 pillar features): every sorted-flag scatter must be drop-mode."""
    from jax.lax import GatherScatterMode

    cfg_kw = dict(min_x=-10.0, max_x=70.0, min_y=-40.0, max_y=40.0,
                  pixels_per_meter=4, num_features=[32, 128])
    # linear_0 consumes raw columns + the 5 decoration columns
    params = pillar.point_pillar_init(jax.random.key(0), 9 + 5, [32, 128])
    pts = jnp.zeros((1, 4096, 9), jnp.float32)
    valid = jnp.ones((1, 4096), bool)

    def fwd(p, pts, valid):
        return pillar.point_pillar_apply(p, pts, valid, train=False,
                                         **cfg_kw)[0]

    jaxpr = jax.make_jaxpr(jax.vmap(fwd, in_axes=(None, 0, 0)))(
        params, pts[None].repeat(2, 0), valid[None].repeat(2, 0))
    scatters = list(_iter_scatters(jaxpr.jaxpr))
    assert scatters, "featurizer unexpectedly contains no scatters"
    poisoned = [
        (name, w) for name, prm, w in scatters
        if prm.get("indices_are_sorted")
        and prm.get("mode") == GatherScatterMode.PROMISE_IN_BOUNDS
        and w >= 128
    ]
    assert not poisoned, (
        f"poisoned scatter form reintroduced {poisoned}: vmapped sorted "
        "in-bounds >=128-wide scatters MISCOMPILE on TPU "
        "(scripts/exp_scatter_miscompile.py)"
    )


_TPU_CHECK_SRC = """
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from lav_tpu.ops.pillar import _segment_mean_gather, _segment_mean_sorted

G = 320 * 320
P, C, E = 60000, 128, 2
rng = np.random.default_rng(0)
pid = np.sort(rng.integers(0, G + 1, (E, P)), axis=1).astype(np.int32)
keep = pid < G
a_pid, a_keep = jnp.asarray(pid), jnp.asarray(keep)
a_xyz = jnp.asarray(rng.normal(size=(E, P, 3)), jnp.bfloat16)
a_feat = jnp.asarray(rng.normal(size=(E, P, C)), jnp.bfloat16)

def canvas_rowsum(p, v):
    cv = jnp.zeros((G, C), v.dtype).at[p].max(
        v, mode="drop", indices_are_sorted=True)
    return jnp.sum(jnp.abs(cv.astype(jnp.float32)), -1)

@jax.jit
def combined(p, v, k, f):
    return (
        jax.vmap(lambda pi, vi, ki: _segment_mean_sorted(
            vi, pi, ki).astype(jnp.float32))(p, v, k),
        jax.vmap(lambda pi, vi, ki: _segment_mean_gather(
            vi, pi, ki, G + 1).astype(jnp.float32))(p, v, k),
        jax.vmap(canvas_rowsum)(p, f),
    )

tpu = jax.tree.map(np.asarray, combined(a_pid, a_xyz, a_keep, a_feat))
with jax.default_device(jax.devices("cpu")[0]):
    cpu = jax.tree.map(np.asarray, combined(a_pid, a_xyz, a_keep, a_feat))
for name, t, c in zip(("mean_sorted", "mean_gather", "canvas_max"), tpu, cpu):
    err = float(np.max(np.abs(t - c)))
    print(f"{name} {err:.6f}")
    assert err < 0.1, (name, err)
print("TPU_FORMS_OK")
"""


@pytest.mark.skipif(
    not os.environ.get("LAV_TPU_TESTS"),
    reason="needs the real TPU (set LAV_TPU_TESTS=1; do not run beside "
           "another TPU process — the single chip serializes them)",
)
def test_production_segment_ops_exact_on_tpu():
    r = subprocess.run([sys.executable, "-c", _TPU_CHECK_SRC],
                       capture_output=True, text=True, timeout=1200,
                       cwd="/root/repo")
    assert "TPU_FORMS_OK" in r.stdout, (r.stdout, r.stderr[-2000:])

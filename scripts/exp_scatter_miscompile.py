"""Repro: XLA TPU miscompiles vmapped sorted scatters at 128-wide rows.

Round-4 finding (measured on v5e via the axon tunnel, 2026-08-18): a
vmapped scatter with `indices_are_sorted=True` and update rows of width
C=128 silently DROPS most updates on the TPU backend — max|tpu-cpu| ~9.3
on f32 scatter-add at agent shapes (E=4, P=60k, G=102401), ~17M of 52M
output elements wrong.  The same op is EXACT in every neighboring form:

    single (un-vmapped) sorted C=128 add/max     exact
    vmapped sorted C<=96 add                     exact
    vmapped UNsorted C=128 add/max               exact
    vmapped sorted C=128 max mode='drop'         exact (and 2x faster
                                                 than unflagged: 7.3 vs
                                                 14.4 ms at 16x60k —
                                                 see exp_canvasmax.py)
    vmapped sorted C=128 gather (.at[].get)      exact

Production impact (fixed in the same round): `_segment_mean_gather`'s
128-wide in-bounds scatter-add ran under the 16-ego vmap with the flag —
round-3's claimed "sorted fast path" speedup (13.4 -> 7.3 ms) was this
miscompile being fast by dropping work.  The flag no longer reaches
in-bounds wide scatters (ops/pillar.py), the cluster mean now uses the
scatter-free blocked form (_segment_mean_sorted), and bench.py's
numerics_guard re-verifies every production segment-op form against the
CPU backend on each run — CPU unit tests can never catch a TPU-side
miscompile.

Run (TPU): python scripts/exp_scatter_miscompile.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

G, P = 320 * 320 + 1, 60000
E = 4


def check(name, fn, *args):
    tpu = np.asarray(jax.jit(fn)(*args))
    with jax.default_device(jax.devices("cpu")[0]):
        cpu = np.asarray(jax.jit(fn)(*args))
    d = np.abs(tpu - cpu)
    status = "EXACT" if d.max() < 1e-3 else "WRONG"
    print(f"{name:44s} max|tpu-cpu|={d.max():8.4f}  nbad={int((d > 1e-3).sum()):>9d}  {status}")


def main():
    rng = np.random.default_rng(1)
    pid = np.sort(rng.integers(0, G - 1, (E, P)), axis=1).astype(np.int32)
    jp = jnp.asarray(pid)

    for C in (64, 96, 128):
        vals = rng.normal(size=(E, P, C)).astype(np.float32)
        jv = jnp.asarray(vals)

        def sadd(p, v, flag, C=C):
            return jnp.zeros((G, C), v.dtype).at[p].add(
                v, indices_are_sorted=flag)

        def smax_drop(p, v, flag, C=C):
            return jnp.zeros((G - 1, C), v.dtype).at[p].max(
                v, mode="drop", indices_are_sorted=flag)

        check(f"single scatter-add sorted C={C}",
              lambda p, v: sadd(p, v, True), jp[0], jv[0])
        check(f"vmap scatter-add sorted C={C}",
              jax.vmap(lambda p, v: sadd(p, v, True)), jp, jv)
        check(f"vmap scatter-add UNsorted C={C}",
              jax.vmap(lambda p, v: sadd(p, v, False)), jp, jv)
        check(f"vmap scatter-max-drop sorted C={C}",
              jax.vmap(lambda p, v: smax_drop(p, v, True)), jp, jv)


if __name__ == "__main__":
    main()

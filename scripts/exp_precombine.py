"""TPU microbench: do DROPPED scatter rows cost issue slots?

If XLA's scatter emitter discards OOB (mode='drop') update rows BEFORE
its serial per-row phase, then with SORTED pillar ids an adjacent-
duplicate pre-combine can cut the canvas scatter-max's effective rows:
merge feat[2i] and feat[2i+1] when pid[2i] == pid[2i+1] (max is
associative) and route the absorbed row out of bounds.  At the bench's
60k-points-uniform load ~30-40%% of sorted rows have an equal neighbour;
real CARLA sweeps concentrate harder.

This measures the prerequisite: scatter-max at agent shapes with 0%%,
25%%, 50%%, 75%% of rows OOB-dropped.  If time scales with the KEPT rows,
implement the pre-combine in ops/pillar.py; if it is flat, dropped rows
still issue and the idea is dead — record either way.

Run (TPU): python scripts/exp_precombine.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from exp_scatter import device_ms  # noqa: E402

E, P, G = 16, 60000, 320 * 320


def main():
    rng = np.random.default_rng(0)

    # NOTE on the sorted flag: a mid-row absorbed OOB id breaks strict
    # monotonicity, so the pre-combined scatter runs UNSORTED — it only
    # pays if (unsorted + dropped rows) beats (sorted + all rows, 7.3 ms).
    for frac, sflag in ((0.0, True), (0.0, False), (0.25, False),
                        (0.5, False), (0.75, False)):
        argsets = []
        for i in range(4):
            pid = np.sort(rng.integers(0, G, (E, P)), axis=1).astype(np.int32)
            drop = rng.random((E, P)) < frac
            pid = np.where(drop, G, pid).astype(np.int32)
            feat = rng.random((E, P, 128)).astype(np.float32)
            argsets.append((jnp.asarray(pid), jnp.asarray(feat, jnp.bfloat16)))

        def mk(sflag):
            @jax.jit
            def scat(pid, feat):
                def one(pid, feat):
                    c = jnp.zeros((G, 128), feat.dtype)
                    return c.at[pid].max(feat, mode="drop",
                                         indices_are_sorted=sflag)
                return jax.vmap(one)(pid, feat)
            return scat

        device_ms(mk(sflag), argsets,
                  label=f"max {int(frac*100)}% OOB sorted={sflag}")

    # the actual pre-combine transform cost (vectorized, no scatter):
    argsets2 = []
    for i in range(4):
        pid = jnp.asarray(np.sort(rng.integers(0, G, (E, P)), 1), jnp.int32)
        feat = jnp.asarray(rng.random((E, P, 128)), jnp.bfloat16)
        argsets2.append((pid, feat))

    @jax.jit
    def precombine(pid, feat):
        same = pid[:, 1::2] == pid[:, ::2]          # (E, P/2)
        f_even = feat[:, ::2]
        f_odd = feat[:, 1::2]
        f_even = jnp.where(same[..., None], jnp.maximum(f_even, f_odd), f_even)
        pid_odd = jnp.where(same, G, pid[:, 1::2])  # absorbed -> OOB
        return (jnp.concatenate([pid[:, ::2], pid_odd], 1),
                jnp.concatenate([f_even, f_odd], 1))

    device_ms(precombine, argsets2, label="pairwise pre-combine transform")


if __name__ == "__main__":
    main()

"""Pallas TPU kernel: pillar scatter-max into a VMEM-resident canvas.

XLA's scatter dominates the fused agent tick (~82 ms of ~300 ms at 16 egos
on v5e for 49k points -> 102k pillars x 64 features).  This kernel keeps
the ENTIRE canvas in VMEM (bf16, two pillars packed per 128-lane row) and
streams point chunks through it with per-point dynamic-row max updates —
a sequential TPU grid has no write races, and VMEM read-modify-write is
orders of magnitude cheaper than HBM scatter.

Layout: canvas_packed (ceil(G/2), 128); pillar p lives at row p//2,
lanes [64*(p%2), 64*(p%2)+64).  G includes the dump row for invalid
points.  VMEM cost at G=102401, C=64, bf16: 13.1 MB — fits v5e's ~16 MB.

Inference-path only (no custom VJP yet); training keeps the XLA scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(pid_ref, feat_ref, out_ref, *, slab: int, c_feat: int):
    """One grid step = one point slab.  out_ref is the full packed canvas,
    revisited every step (constant index_map keeps it resident in VMEM)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, NEG)

    def body(i, _):
        p = pid_ref[i]
        row = p // 2
        left = (p % 2) == 0
        f = feat_ref[i, :c_feat]

        @pl.when(left)
        def _l():
            cur = out_ref[pl.ds(row, 1), 0:c_feat]
            out_ref[pl.ds(row, 1), 0:c_feat] = jnp.maximum(cur, f[None])

        @pl.when(jnp.logical_not(left))
        def _r():
            cur = out_ref[pl.ds(row, 1), c_feat:2 * c_feat]
            out_ref[pl.ds(row, 1), c_feat:2 * c_feat] = jnp.maximum(
                cur, f[None]
            )

        return 0

    jax.lax.fori_loop(0, slab, body, 0)


@functools.partial(jax.jit, static_argnames=("num_segments", "slab",
                                             "interpret"))
def pillar_scatter_max_pallas(feat, pid, *, num_segments: int,
                              slab: int = 2048, interpret: bool = False):
    """feat (P, C<=64), pid (P,) int32 in [0, num_segments) — invalid points
    must already carry NEG features (max is then a no-op).
    Returns (num_segments, C) with 0 for untouched pillars."""
    P, C = feat.shape
    assert C <= 64, "packing assumes C<=64 (two pillars per 128-lane row)"
    pad = (-P) % slab
    if pad:
        feat = jnp.pad(feat, ((0, pad), (0, 0)), constant_values=NEG)
        pid = jnp.pad(pid, (0, pad), constant_values=num_segments - 1)
    P_pad = P + pad
    g2 = (num_segments + 1) // 2

    packed = pl.pallas_call(
        functools.partial(_kernel, slab=slab, c_feat=C),
        grid=(P_pad // slab,),
        in_specs=[
            pl.BlockSpec((slab,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((slab, C), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g2, 2 * C), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2, 2 * C), feat.dtype),
        interpret=interpret,
    )(pid.astype(jnp.int32), feat)

    canvas = packed.reshape(2 * g2, C)[:num_segments]
    return jnp.where(canvas > NEG, canvas, jnp.zeros((), feat.dtype))

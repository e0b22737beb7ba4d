"""Pallas TPU kernel: pillar scatter-max via a VMEM-resident canvas.

XLA's scatter dominates the fused agent tick (~82 ms of ~300 ms at 16 egos
on v5e for 49k points -> 102k pillars x 64 features).  This kernel holds
the canvas in VMEM *scratch* (scratch is never pipeline-buffered — a
pipelined 13 MB output block would double-buffer past the 16 MB VMEM
budget) and streams point chunks through it with per-point masked block
read-modify-writes; the finished canvas is DMA'd to an HBM output at the
last chunk.  A sequential TPU grid has no write races.

Mosaic constraint shaping (v5e, bf16 tile = (16, 128)):
  * canvas packed 2 pillars per 128-lane row, stored (ceil(G/2)/16, 16,
    128) so the per-point dynamic index lands on the UNTILED leading dim;
    target sublane/lane selected with iota masks (dynamic sublane slices
    must be statically 8/16-aligned).
  * features pre-duplicated into both lane halves (Mosaic cannot
    lane-rotate non-32-bit vectors).
  * pillar ids ride in SMEM 2-D tiles (vmap-batchable).

Inference-path only (no custom VJP); training keeps the XLA scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
SUB = 16  # sublane tile (bf16-safe; also fine for f32)


def _kernel(pid_ref, feat_ref, out_hbm, canvas, sem, *, slab: int,
            c_feat: int, n_chunks: int, batched: bool,
            dma_flush: bool = True):
    step = pl.program_id(1 if batched else 0)

    @pl.when(step == 0)
    def _init():
        canvas[...] = jnp.full(canvas.shape, NEG, canvas.dtype)

    pid_lead = (0,) * (len(pid_ref.shape) - 2)
    feat_lead = (0,) * (len(feat_ref.shape) - 3)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)

    def body(i, _):
        p = pid_ref[pid_lead + (i // 128, i % 128)]
        row = p // 2
        half = p % 2
        blk = row // SUB
        sub = row % SUB

        fsel = feat_lead + (pl.ds(i // SUB, 1), slice(None), slice(None))
        fblk = feat_ref[fsel]  # (1, SUB, 128), features in both halves
        frow = jnp.sum(
            jnp.where(sub_iota[None] == (i % SUB), fblk, 0.0), axis=1,
            keepdims=True,
        )  # (1, 1, 128)

        oblk = canvas[pl.ds(blk, 1)]
        lane_off = half * c_feat
        lane_ok = (lane_iota[None] >= lane_off) & (
            lane_iota[None] < lane_off + c_feat
        )
        mask = (sub_iota[None] == sub) & lane_ok
        canvas[pl.ds(blk, 1)] = jnp.where(
            mask, jnp.maximum(oblk, frow), oblk
        )
        return 0

    jax.lax.fori_loop(0, slab, body, 0)

    @pl.when(step == n_chunks - 1)
    def _flush():
        if dma_flush:  # ANY-space output, written by explicit DMA
            dst = out_hbm.at[pl.program_id(0)] if batched else out_hbm
            copy = pltpu.make_async_copy(canvas, dst, sem)
            copy.start()
            copy.wait()
        else:  # interpret mode: blocked VMEM output, plain copy
            out_hbm[...] = canvas[...][None]


def _packed_call(featb, pidb, *, num_segments: int, slab: int,
                 interpret: bool):
    """Batched core: featb (B, P, C), pidb (B, P) -> packed canvases
    (B, g2_pad//SUB, SUB, 128) in HBM."""
    B, P, C = featb.shape
    assert C <= 64, "packing assumes C<=64 (two pillars per 128-lane row)"
    assert slab % 128 == 0 and slab % SUB == 0
    pad = (-P) % slab
    if pad:
        featb = jnp.pad(featb, ((0, 0), (0, pad), (0, 0)),
                        constant_values=NEG)
        pidb = jnp.pad(pidb, ((0, 0), (0, pad)),
                       constant_values=num_segments - 1)
    P_pad = P + pad
    n_chunks = P_pad // slab
    g2 = (num_segments + 1) // 2
    g2_pad = ((g2 + SUB - 1) // SUB) * SUB

    pid_tiles = pidb.astype(jnp.int32).reshape(B, n_chunks, slab // 128, 128)
    feat_pad = jnp.concatenate(
        [featb, featb,
         jnp.full((B, P_pad, 128 - 2 * C), NEG, featb.dtype)],
        axis=-1,
    )
    feat_tiles = feat_pad.reshape(B, n_chunks, slab // SUB, SUB, 128)

    if interpret:
        out_spec = pl.BlockSpec((1, g2_pad // SUB, SUB, 128),
                                lambda b, c: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    return pl.pallas_call(
        functools.partial(_kernel, slab=slab, c_feat=C, n_chunks=n_chunks,
                          batched=True, dma_flush=not interpret),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, slab // 128, 128),
                         lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, slab // SUB, SUB, 128),
                         lambda b, c: (b, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, g2_pad // SUB, SUB, 128), featb.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((g2_pad // SUB, SUB, 128), featb.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pid_tiles, feat_tiles)


def _unpack(packed, num_segments: int, C: int):
    """(..., g2_pad//SUB, SUB, 128) -> (..., num_segments, C)."""
    lead = packed.shape[:-3]
    g2_pad = packed.shape[-3] * SUB
    flat = packed.reshape(*lead, g2_pad, 128)
    even = flat[..., :C]
    odd = flat[..., C:2 * C]
    canvas = jnp.stack([even, odd], axis=-2).reshape(*lead, 2 * g2_pad, C)
    canvas = canvas[..., :num_segments, :]
    return jnp.where(canvas > NEG, canvas, jnp.zeros((), packed.dtype))


@functools.lru_cache(maxsize=None)
def _make_scatter(num_segments: int, slab: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def scatter(feat, pid):
        packed = _packed_call(
            feat[None], pid[None], num_segments=num_segments, slab=slab,
            interpret=interpret,
        )
        return _unpack(packed[0], num_segments, feat.shape[-1])

    @scatter.def_vmap
    def _rule(axis_size, in_batched, feat, pid):
        feat_b, pid_b = in_batched
        if not feat_b:
            feat = jnp.broadcast_to(feat, (axis_size,) + feat.shape)
        if not pid_b:
            pid = jnp.broadcast_to(pid, (axis_size,) + pid.shape)
        packed = _packed_call(feat, pid, num_segments=num_segments,
                              slab=slab, interpret=interpret)
        return _unpack(packed, num_segments, feat.shape[-1]), True

    return scatter


def pillar_scatter_max_pallas(feat, pid, *, num_segments: int,
                              slab: int = 2048, interpret: bool = False):
    """feat (P, C<=64), pid (P,) int32 in [0, num_segments) — invalid points
    must already carry NEG features (max is then a no-op).
    Returns (num_segments, C) with 0 for untouched pillars.

    vmap over a leading batch axis routes into a natively-batched grid
    (custom_vmap) — Pallas's default batching rule would pipeline-buffer
    the 13 MB canvas per batch element and blow VMEM."""
    return _make_scatter(num_segments, slab, interpret)(feat, pid)

"""Pallas TPU kernel, round 3: pillar scatter (max & add) vs the XLA wall.

Round-2 measured the XLA pillar scatters ISSUE-bound at ~15.7 ns per
128-lane update row (width/dtype-independent), making the two scatters
24.7 ms of the 92 ms 16-ego tick; the round-2 Pallas attempt
(ops/pillar_pallas.py) lost to XLA (~49 ns/row) because each point paid
a masked read-modify-write over a full (16, 128) block PLUS a masked-sum
row extraction over another (16, 128) block.

This kernel restructures the per-point work to the minimum Mosaic can
issue:

  * canvas UNPACKED (segments, 128) f32, VMEM-resident scratch
    (320*320 segments -> 52.5 MB; v5e has 128 MB physical VMEM) laid out
    (n_blk, 8, 128) so a point's row lives in block pid>>3, sublane pid&7
  * per 8-point group, ONE tiny MXU matmul (E @ g, E[r,j]=[r//8==j])
    expands the group's rows into 8 aligned (8, 128) broadcast blocks —
    no per-point row extraction
  * per point: scalar pid load + shift/and, one vector compare
    (sublane iota == target sublane), one aligned (8, 128) RMW
    (load, max/add, select, store).  No lane masking at all: feature
    lanes beyond the payload are zero, and max/add with zero against the
    zero-initialized canvas is a no-op.
  * fully unrolled 8-point inner body; fori only over groups

Semantics (inference fast path only):
  op="max": zero-init scatter-max — valid ONLY for ReLU-nonneg features
    with invalid points routed to the dump slot (exactly the XLA
    inference fast path in ops/pillar.py).
  op="add": scatter-add of zero-masked rows (the decoration mean
    accumulator; lanes 0-2 = xyz, lane 3 = count).

Replaces: torch_scatter scatter_max/scatter_mean + dense canvas scatter
(/root/reference/lav/models/point_pillar.py:33,62,87-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8          # f32 sublane tile
GROUP = 8        # points per MXU broadcast-expansion


def _kernel(pid_ref, feat_ref, out_hbm, canvas, exp, sem, *, slab: int,
            n_chunks: int, op: str, out_dtype, dma_flush: bool):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        canvas[...] = jnp.zeros(canvas.shape, canvas.dtype)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, SUB, 128), 1)
    # E[r, j] = 1 where r // SUB == j: one matmul turns the group's
    # (GROUP, 128) rows into GROUP aligned (SUB, 128) broadcast blocks
    E = (jax.lax.broadcasted_iota(jnp.int32, (GROUP * SUB, GROUP), 0) // SUB
         == jax.lax.broadcasted_iota(jnp.int32, (GROUP * SUB, GROUP), 1)
         ).astype(feat_ref.dtype)

    combine = jnp.maximum if op == "max" else jnp.add

    def body(g, _):
        base = g * GROUP
        grp = feat_ref[0, 0, pl.ds(g, 1)][0]       # (GROUP, 128)
        exp[...] = jax.lax.dot_general(
            E, grp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for j in range(GROUP):
            p = pid_ref[0, 0, base + j]
            blk = p >> 3
            sub = p & 7
            cblk = canvas[pl.ds(blk, 1)]           # (1, SUB, 128)
            upd = combine(cblk, exp[pl.ds(j * SUB, SUB)][None])
            canvas[pl.ds(blk, 1)] = jnp.where(sub_iota == sub, upd, cblk)
        return 0

    jax.lax.fori_loop(0, slab // GROUP, body, 0, unroll=1)

    @pl.when(step == n_chunks - 1)
    def _flush():
        if dma_flush:
            dst = out_hbm.at[pl.program_id(0)]
            copy = pltpu.make_async_copy(canvas, dst, sem)
            copy.start()
            copy.wait()
        else:  # interpret mode: blocked VMEM output, plain copy
            out_hbm[...] = canvas[...][None].astype(out_dtype)


def _call(featb, pidb, *, num_segments: int, op: str, slab: int,
          interpret: bool):
    """featb (B, P, 128) payload-in-low-lanes, pidb (B, P) int32 with
    invalid points at the dump slot -> (B, n_blk*SUB, 128) f32."""
    B, P, W = featb.shape
    assert W == 128, "feature rows must be padded to 128 lanes"
    assert slab % GROUP == 0
    pad = (-P) % slab
    if pad:
        # padding points: zero rows at the dump slot — no-ops for both ops
        featb = jnp.pad(featb, ((0, 0), (0, pad), (0, 0)))
        pidb = jnp.pad(pidb, ((0, 0), (0, pad)),
                       constant_values=num_segments - 1)
    P_pad = P + pad
    n_chunks = P_pad // slab
    n_blk = (num_segments + SUB - 1) // SUB

    pid_tiles = pidb.astype(jnp.int32).reshape(B, n_chunks, slab)
    feat_tiles = featb.reshape(B, n_chunks, slab // GROUP, GROUP, 128)

    if interpret:
        out_spec = pl.BlockSpec((1, n_blk, SUB, 128),
                                lambda b, c: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    return pl.pallas_call(
        functools.partial(_kernel, slab=slab, n_chunks=n_chunks, op=op,
                          out_dtype=jnp.float32, dma_flush=not interpret),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, slab), lambda b, c: (b, c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, slab // GROUP, GROUP, 128),
                         lambda b, c: (b, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_blk, SUB, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_blk, SUB, 128), jnp.float32),
            pltpu.VMEM((GROUP * SUB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 2 ** 20,
        ),
        interpret=interpret,
    )(pid_tiles, feat_tiles)


@functools.lru_cache(maxsize=None)
def _make(num_segments: int, op: str, slab: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def scatter(feat, pid):
        out = _call(feat[None], pid[None], num_segments=num_segments,
                    op=op, slab=slab, interpret=interpret)
        return out[0].reshape(-1, 128)[:num_segments]

    @scatter.def_vmap
    def _rule(axis_size, in_batched, feat, pid):
        feat_b, pid_b = in_batched
        if not feat_b:
            feat = jnp.broadcast_to(feat, (axis_size,) + feat.shape)
        if not pid_b:
            pid = jnp.broadcast_to(pid, (axis_size,) + pid.shape)
        out = _call(feat, pid, num_segments=num_segments, op=op,
                    slab=slab, interpret=interpret)
        B = out.shape[0]
        return out.reshape(B, -1, 128)[:, :num_segments], True

    return scatter


def scatter_pallas(feat, pid, *, op: str, num_segments: int,
                   slab: int = 4096, interpret: bool = False):
    """feat (P, C<=128) — nonneg payload for op="max" (post-ReLU), zero
    rows for invalid points; pid (P,) int32 in [0, num_segments) with
    invalid points at the dump slot (num_segments-1 or any zero-payload
    target).  Returns the (num_segments, 128) f32 accumulator (zeros in
    untouched rows and in lanes >= C).

    vmap over a leading batch axis routes into a natively-batched grid
    (custom_vmap), exactly like ops/pillar_pallas.py."""
    P, C = feat.shape
    if C < 128:
        feat = jnp.pad(feat, ((0, 0), (0, 128 - C)))
    return _make(num_segments, op, slab, interpret)(
        feat.astype(jnp.float32 if op == "add" else feat.dtype), pid)

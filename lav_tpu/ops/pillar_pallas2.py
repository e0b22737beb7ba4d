"""Pallas TPU kernel, round 3: pillar scatter (max & add) vs the XLA wall.

VERDICT (round 3, measured on v5e at the agent's shapes — 16 egos x 49k
points = 786k update rows into 102k segments, device-trace timing via
scripts/exp_scatter.py): **XLA's scatter emitter is at the per-update
issue floor for this op on this hardware.**  The full campaign:

    variant                                         ns/row   exact?
    ----------------------------------------------  ------   ------
    XLA scatter-max (B,P,128)bf16 batch-folded       15.76    yes
    XLA scatter-add (B,P,4->128)f32                  17.68    yes
    r2 kernel: masked (16,128)-block RMW + row sum   ~49      yes
    r3 "rmw": MXU row-broadcast + aligned block RMW  20-25    yes
    r3 "rmw" n_copies=2 (anti-alias canvases)        same     yes
    r3 "stream": fori-carried register accumulator,
      VMEM touched only on block change              ~40      yes
      (coherent vs uniform pid order: NO difference
       -> Mosaic spills the carried (8,128) acc)
    sorted reformulation: sort_key_val is cheap
      (0.70 ms) but XLA row-GATHERS are issue-bound
      too (10.7 ms for (786k,128)) — reordering the
      payload costs more than the scatter saves      n/a      —

Conclusion: every Mosaic form pays >=20 ns/point for the dynamic-address
VMEM round trip + scalar address chain; XLA's emitter (which internally
sorts, see the 0.69 ms sort in its trace) retires one update row per
~15.7 ns regardless of width/dtype/sortedness/locality.  The only levers
that remain are FEWER ROWS (point budget, utils/point_budget.py) and
keeping the scatters off the critical path.  Kernels kept for the
record + regression measurement; off by default.

History: round-2 measured the XLA scatters at 24.7 ms of the 92 ms
16-ego tick; the round-2 attempt (ops/pillar_pallas.py) lost at ~49
ns/row because each point paid a masked read-modify-write over a full
(16, 128) block PLUS a masked-sum row extraction over another block.

This kernel restructures the per-point work to the minimum Mosaic can
issue:

  * canvas UNPACKED (segments, 128), VMEM-resident scratch
    (320*320 segments -> 26 MB bf16 / 52 MB f32; v5e has 128 MB physical
    VMEM) laid out (n_blk, SUBT, 128) so a point's row lives in block
    pid//SUBT, sublane pid%SUBT (SUBT = native sublane tile: 8 f32,
    16 bf16 — keeps every dynamic block access tile-aligned)
  * N_COPIES canvases with points assigned round-robin (point j ->
    canvas j%N): consecutive points can never read-modify-write the same
    VMEM block back to back, so Mosaic's may-alias store->load
    serialization stops costing a full VMEM round trip per point; the
    copies are combined once at flush time (max/add is associative and
    commutative)
  * per GROUP-point group, ONE tiny MXU matmul (E @ g, E[r,j]=[r//S==j])
    expands the group's rows into GROUP aligned (SUBT, 128) broadcast
    blocks — no per-point row extraction
  * per point: scalar pid load + shift/and, one vector compare
    (sublane iota == target sublane), one aligned (SUBT, 128) RMW
    (load, max/add, select, store).  No lane masking at all: feature
    lanes beyond the payload are zero, and max/add with zero against the
    zero-initialized canvas is a no-op.
  * fully unrolled GROUP-point inner body; fori only over groups

Semantics (inference fast path only):
  op="max": zero-init scatter-max — valid ONLY for ReLU-nonneg features
    with invalid points routed to the dump slot (exactly the XLA
    inference fast path in ops/pillar.py).  bf16 canvas.
  op="add": scatter-add of zero-masked rows (the decoration mean
    accumulator; lanes 0-2 = xyz, lane 3 = count).  f32 canvas.

Replaces: torch_scatter scatter_max/scatter_mean + dense canvas scatter
(/root/reference/lav/models/point_pillar.py:33,62,87-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8        # points per MXU broadcast-expansion


def _kernel(pid_ref, feat_ref, out_hbm, canvas, exp, sem, *, slab: int,
            n_chunks: int, op: str, sub_tile: int, n_copies: int,
            dma_flush: bool):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        canvas[...] = jnp.zeros(canvas.shape, canvas.dtype)

    sub_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, sub_tile, 128), 1)
    # E[r, j] = 1 where r // sub_tile == j: one matmul turns the group's
    # (GROUP, 128) rows into GROUP aligned (sub_tile, 128) broadcast blocks
    R = GROUP * sub_tile
    E = (jax.lax.broadcasted_iota(jnp.int32, (R, GROUP), 0) // sub_tile
         == jax.lax.broadcasted_iota(jnp.int32, (R, GROUP), 1)
         ).astype(feat_ref.dtype)

    combine = jnp.maximum if op == "max" else jnp.add
    shift = sub_tile.bit_length() - 1

    def body(g, _):
        base = g * GROUP
        grp = feat_ref[0, 0, pl.ds(g, 1)][0]       # (GROUP, 128)
        exp[...] = jax.lax.dot_general(
            E, grp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,    # MXU acc must be 32-bit
        ).astype(canvas.dtype)
        for j in range(GROUP):
            i = base + j
            p = pid_ref[0, 0, i // 128, i % 128]
            blk = p >> shift
            sub = p & (sub_tile - 1)
            c = j % n_copies                       # static per unrolled j
            cblk = canvas[c, pl.ds(blk, 1)]        # (1, sub_tile, 128)
            upd = combine(cblk, exp[pl.ds(j * sub_tile, sub_tile)][None])
            canvas[c, pl.ds(blk, 1)] = jnp.where(sub_iota == sub, upd, cblk)
        return 0

    jax.lax.fori_loop(0, slab // GROUP, body, 0, unroll=1)

    @pl.when(step == n_chunks - 1)
    def _flush():
        if n_copies > 1:
            acc = canvas[0]
            for c in range(1, n_copies):
                acc = combine(acc, canvas[c])
            canvas[0] = acc
        if dma_flush:
            dst = out_hbm.at[pl.program_id(0)]
            copy = pltpu.make_async_copy(canvas.at[0], dst, sem)
            copy.start()
            copy.wait()
        else:  # interpret mode: blocked VMEM output, plain copy
            out_hbm[...] = canvas[0][None]


def _kernel_stream(pid_ref, feat_ref, out_hbm, canvas, state, sem, *,
                   slab: int, n_chunks: int, op: str, sub_tile: int,
                   dma_flush: bool):
    """Streaming register-accumulator variant: the current canvas block's
    partial reduction rides in a fori-carried (sub_tile, 128) value (vector
    registers), and VMEM is only touched on block CHANGES — a
    read-modify-write flush of the block being left.  On azimuth-coherent
    lidar streams consecutive points overwhelmingly share a block, so the
    per-point cost collapses to a handful of register ops; on adversarial
    orderings every point flushes and the cost degrades to the plain
    per-point RMW kernel's.  Correctness is order-independent (max/add are
    commutative+associative; each flush COMBINES into the canvas).

    Block n_blk (one past the real canvas) is a trash block: `cur`
    initializes to it, so the first real point's flush lands harmlessly.
    """
    b = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        canvas[...] = jnp.zeros(canvas.shape, canvas.dtype)
        state[0] = canvas.shape[0] - 1  # cur = trash block

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_tile, 128), 0)
    R = GROUP * sub_tile
    E = (jax.lax.broadcasted_iota(jnp.int32, (R, GROUP), 0) // sub_tile
         == jax.lax.broadcasted_iota(jnp.int32, (R, GROUP), 1)
         ).astype(feat_ref.dtype)
    combine = jnp.maximum if op == "max" else jnp.add
    shift = sub_tile.bit_length() - 1

    # re-seed the carried accumulator from the canvas content of `cur`
    # (the carry was parked there at the end of the previous chunk) and
    # CLEAR that block so nothing is counted twice when acc flushes back
    cur0 = state[0]
    acc0 = canvas[cur0]
    canvas[pl.ds(cur0, 1)] = jnp.zeros((1,) + canvas.shape[1:], canvas.dtype)

    def body(g, carry):
        acc, cur = carry
        base = g * GROUP
        grp = feat_ref[0, 0, pl.ds(g, 1)][0]       # (GROUP, 128)
        exp_v = jax.lax.dot_general(
            E, grp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(canvas.dtype)
        for j in range(GROUP):
            i = base + j
            p = pid_ref[0, 0, i // 128, i % 128]
            blk = p >> shift
            sub = p & (sub_tile - 1)
            same = blk == cur

            @pl.when(jnp.logical_not(same))
            def _flush(acc=acc, cur=cur):
                cb = canvas[pl.ds(cur, 1)]
                canvas[pl.ds(cur, 1)] = combine(cb, acc[None])

            acc = jnp.where(same, acc, jnp.zeros_like(acc))
            bcast = exp_v[j * sub_tile:(j + 1) * sub_tile]
            acc = jnp.where(sub_iota == sub, combine(acc, bcast), acc)
            cur = blk
        return acc, cur

    acc, cur = jax.lax.fori_loop(0, slab // GROUP, body, (acc0, cur0),
                                 unroll=1)
    # park the carry: flush acc into its block, remember cur for re-seed
    cb = canvas[pl.ds(cur, 1)]
    canvas[pl.ds(cur, 1)] = combine(cb, acc[None])
    state[0] = cur

    @pl.when(step == n_chunks - 1)
    def _out():
        # the trash block rides along in the output (sliced off by the
        # caller) — a whole-scratch DMA avoids sliced-ref copy rules
        if dma_flush:
            dst = out_hbm.at[b]
            copy = pltpu.make_async_copy(canvas, dst, sem)
            copy.start()
            copy.wait()
        else:
            out_hbm[...] = canvas[...][None]


def _call(featb, pidb, *, num_segments: int, op: str, slab: int,
          n_copies: int, mode: str, interpret: bool):
    """featb (B, P, 128) payload-in-low-lanes, pidb (B, P) int32 with
    invalid points at the dump slot -> (B, n_out, SUBT, 128) canvas blocks
    (mode="stream" appends one trash block, sliced off by the wrapper)."""
    B, P, W = featb.shape
    assert W == 128, "feature rows must be padded to 128 lanes"
    assert slab % GROUP == 0 and slab % 128 == 0
    cdtype = jnp.float32 if op == "add" else featb.dtype
    sub_tile = 16 if cdtype == jnp.bfloat16 else 8
    pad = (-P) % slab
    if pad:
        # padding points: zero rows at the dump slot — no-ops for both ops
        featb = jnp.pad(featb, ((0, 0), (0, pad), (0, 0)))
        pidb = jnp.pad(pidb, ((0, 0), (0, pad)),
                       constant_values=num_segments - 1)
    P_pad = P + pad
    n_chunks = P_pad // slab
    n_blk = (num_segments + sub_tile - 1) // sub_tile
    n_out = n_blk + (1 if mode == "stream" else 0)

    pid_tiles = pidb.astype(jnp.int32).reshape(B, n_chunks, slab // 128, 128)
    feat_tiles = featb.astype(cdtype if op == "add" else featb.dtype).reshape(
        B, n_chunks, slab // GROUP, GROUP, 128)

    if interpret:
        out_spec = pl.BlockSpec((1, n_out, sub_tile, 128),
                                lambda b, c: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    if mode == "stream":
        kern = functools.partial(
            _kernel_stream, slab=slab, n_chunks=n_chunks, op=op,
            sub_tile=sub_tile, dma_flush=not interpret)
        scratch = [
            pltpu.VMEM((n_out, sub_tile, 128), cdtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kern = functools.partial(
            _kernel, slab=slab, n_chunks=n_chunks, op=op,
            sub_tile=sub_tile, n_copies=n_copies, dma_flush=not interpret)
        scratch = [
            pltpu.VMEM((n_copies, n_blk, sub_tile, 128), cdtype),
            pltpu.VMEM((GROUP * sub_tile, 128), cdtype),
            pltpu.SemaphoreType.DMA,
        ]

    return pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, slab // 128, 128), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, slab // GROUP, GROUP, 128),
                         lambda b, c: (b, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_out, sub_tile, 128), cdtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 2 ** 20,
        ),
        interpret=interpret,
    )(pid_tiles, feat_tiles)


@functools.lru_cache(maxsize=None)
def _make(num_segments: int, op: str, slab: int, n_copies: int,
          mode: str, interpret: bool):
    @jax.custom_batching.custom_vmap
    def scatter(feat, pid):
        out = _call(feat[None], pid[None], num_segments=num_segments,
                    op=op, slab=slab, n_copies=n_copies, mode=mode,
                    interpret=interpret)
        return out[0].reshape(-1, 128)[:num_segments]

    @scatter.def_vmap
    def _rule(axis_size, in_batched, feat, pid):
        feat_b, pid_b = in_batched
        if not feat_b:
            feat = jnp.broadcast_to(feat, (axis_size,) + feat.shape)
        if not pid_b:
            pid = jnp.broadcast_to(pid, (axis_size,) + pid.shape)
        out = _call(feat, pid, num_segments=num_segments, op=op,
                    slab=slab, n_copies=n_copies, mode=mode,
                    interpret=interpret)
        B = out.shape[0]
        return out.reshape(B, -1, 128)[:, :num_segments], True

    return scatter


def scatter_pallas(feat, pid, *, op: str, num_segments: int,
                   slab: int = 4096, n_copies: int = 1,
                   mode: str = "stream", interpret: bool = False):
    """feat (P, C<=128) — nonneg payload for op="max" (post-ReLU), zero
    rows for invalid points; pid (P,) int32 in [0, num_segments) with
    invalid points at the dump slot (num_segments-1 or any zero-payload
    target).  Returns the (num_segments, 128) accumulator (zeros in
    untouched rows and in lanes >= C); dtype = feat dtype for "max",
    f32 for "add".

    vmap over a leading batch axis routes into a natively-batched grid
    (custom_vmap), exactly like ops/pillar_pallas.py."""
    P, C = feat.shape
    if C < 128:
        feat = jnp.pad(feat, ((0, 0), (0, 128 - C)))
    if op == "add":
        feat = feat.astype(jnp.float32)
    return _make(num_segments, op, slab, n_copies, mode, interpret)(feat, pid)

"""Pallas TPU kernel: fused multi-crop bilinear sampling from one source.

Replaces the XLA (2,2,C)-slice gather form of `grid_sample_shared`
(core/warp.py) on the agent's hot path — the detection-crop fetch was 69 ms
of a ~185 ms 16-ego tick on v5e (4x byte inflation + per-slice issue cost;
XLA's gather emitter streams the same 19.6 MB source from HBM once per
2x2 tap).

Key observation: the sampling grids are rigid transforms with scale <= ~1.3
source px per output px, so any GS x GS block of output pixels reads from a
bounded (<= TS x TS) axis-aligned source tile.  That turns the random-access
gather into structure the TPU loves:

  * the source map rides in VMEM (see "source residency" below);
  * per output group, ONE aligned-rows dynamic slice pulls the (TS, TS, CB)
    tile;
  * exact align_corners=True zero-pad bilinear weights are built in
    registers as a separable outer product  W[t, p] = wy(td(t), p) *
    wx(tm(t), p)  with the hinge  w(u) = max(0, 1 - |pos - u|)  — identical
    (including clamped-edge partial weights) to the XLA path's formula;
  * the 4-tap lerp becomes one (TS*TS, GS*GS)^T x (TS*TS, CB) MXU matmul.

Source residency: the source is a grid-blocked VMEM input (constant across
the crop axis -> fetched once per channel block).  Mosaic double-buffers
pipelined blocks by default; for narrow-channel sources the lane (minor)
dim pads to 128 (a 320x320x5 f32 BEV map occupies 52.4 MB of VMEM, 25.6x
its logical 2 MB) and the double-buffered form overflows the 128 MB
physical VMEM (measured: 136 MB asked, compile fails).  Those sources get
`pl.Buffered(buffer_count=1)` — the pipeline stalls for one ~2 MB logical
DMA per (batch item, channel block), amortized over all K crops x 576
output groups.  NOTE an ANY-memory-space source + manual per-item DMA does
NOT work here: Mosaic requires HBM memref slices to be 128-aligned on the
tiled lane dim, so a (B,H,W,5) array cannot even be .at[b]-sliced.

Batching: a leading batch axis becomes the outermost grid dimension via
jax.custom_batching.custom_vmap (Pallas's default batching rule would works
too, but the explicit grid keeps the buffer-count decision in one place and
matches the pillar kernel's pattern).

Traffic per 16-ego v2 tick drops from ~6.8 GB of gathered slices to
~0.9 GB of tile reads + the 1.7 GB crop write.

Semantics: matches `grid_sample_shared` — weights computed in f32 then cast
to the source dtype; matmul accumulates in f32 (the XLA einsum on bf16 does
the same).  Gradients: same custom VJP (wide-row scatter-add backward, grid
gets zero gradient).

Reference for what this computes: /root/reference/lav/models/bev_planner.py
:224-266 (crop_feature) and team_code_v2/model_inference.py:204-238.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TSY = 16  # source tile rows; must cover a group's taps:
          # (GS-1)*step*sqrt(2)+3 <= TSY
TSX = 24  # source tile cols; wider because the x start is aligned DOWN to a
          # multiple of 8 — Mosaic crashes on unaligned dynamic sublane
          # slices, and pl.multiple_of(tx, 8) takes the supported path

# padded-bytes budget for the pipelined source window (out of 128 MB
# physical VMEM; leave room for the double-buffered output window)
_PIPE_BUDGET = 96 << 20
_SINGLEBUF_BUDGET = 100 << 20


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _pick_gs(step_px: float) -> int:
    """Largest output-group edge whose taps fit the fixed tile.

    Bigger groups mean fewer, larger MXU matmuls ((TSY*TSX, GS^2) lhs); the
    agent's 0.6 px/px crops support GS=16, generic <=1.3 px/px crops GS=8.
    """
    for gs in (16, 8):
        if (gs - 1) * step_px * 1.4143 + 3.0 <= TSY:
            return gs
    return 0


def supports(img_shape, out_hw, step_px: float, itemsize: int = 4) -> bool:
    """Static eligibility: shapes divisible, tile bound holds, source tall
    enough for the tile slice, and at least one residency mode fits VMEM."""
    H, W, C = img_shape
    Ho, Wo = out_hw
    gs = _pick_gs(step_px)
    if not (gs and Ho % gs == 0 and Wo % gs == 0 and H >= TSY and W >= TSX):
        return False
    if C % 128 == 0:
        # wide sources are channel-blockable, but the SMALLEST block
        # (cb=128) must still fit double-buffered — huge H*W sources
        # can't, and must fall back to the XLA path rather than commit to
        # a Mosaic compile that overflows VMEM
        return 2 * (H * W + Ho * Wo) * 128 * itemsize <= _PIPE_BUDGET
    # narrow sources ride full-C with a single-buffered source window
    cpad = _pad128(C)
    return (H * W + 2 * Ho * Wo) * cpad * itemsize <= _SINGLEBUF_BUDGET


def _kernel(starts_ref, fx_ref, fy_ref, inv_s_ref, src_ref, out_ref, *,
            ngx: int, gs: int, unroll: bool, q8: bool, s2d: bool,
            tsy: int = TSY, tsx: int = TSX):
    """One (batch, channel-block, crop) grid step: all output groups of one
    crop.  Refs arrive batched: starts (1,1,ng,2) SMEM, fx/fy (1,1,ng,GS*GS),
    inv_s (1,1) SMEM (int8 epilogue inverse scale; ignored unless q8),
    src (1,H,W,CB), out (1,1,Ho,Wo,CB).

    q8: quantize the sampled crop IN the epilogue — out = clip(round(
    bilinear / x_scale), ±127) as int8, while the group result is still
    in registers.  This is the int8 crop-resnet's activation quantize
    (nn/quant.py conv2d_int8) fused into the producer: the standalone
    clamp/convert pass over the (K+1)-crop stack cost 4.0 ms/tick at 16
    egos, and the crop write to HBM halves."""
    CB = src_ref.shape[-1]
    dtype = src_ref.dtype

    def tile_at(ty, tx):
        return src_ref[0, pl.ds(ty, tsy), pl.ds(tx, tsx), :]

    ng = fx_ref.shape[2]
    GS = gs

    # hinge positions along each tile axis (f32, built once)
    pos_y = jax.lax.broadcasted_iota(jnp.int32, (tsy, GS * GS), 0).astype(
        jnp.float32
    )
    pos_x = jax.lax.broadcasted_iota(jnp.int32, (tsx, GS * GS), 0).astype(
        jnp.float32
    )

    def acc_for(g):
        ty = starts_ref[0, 0, g, 0]
        tx = pl.multiple_of(starts_ref[0, 0, g, 1], 8)
        tile = tile_at(ty, tx).reshape(tsy * tsx, CB)

        fx = fx_ref[0, 0, pl.ds(g, 1), :]  # (1, GS*GS) f32, rel to tile
        fy = fy_ref[0, 0, pl.ds(g, 1), :]
        # exact zero-pad bilinear: w(u) = max(0, 1 - |pos - u|); only the two
        # columns adjacent to each sample are nonzero, clamped edges get the
        # same partial weights as the XLA path
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - pos_x))  # (tsx, GS*GS)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - pos_y))  # (tsy, GS*GS)
        w = (wy[:, None, :] * wx[None, :, :]).reshape(tsy * tsx, GS * GS)
        # f32 sources need full-precision MXU passes: the default reduced
        # (bf16-pass) f32 matmul costs ~1.6e-2 abs error on unit-scale
        # features — far beyond the XLA path's rounding.  bf16 sources keep
        # the default (operands are bf16 anyway; accumulation is f32).
        acc = jax.lax.dot_general(
            w.astype(dtype), tile,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if dtype == jnp.float32 else None),
        )  # (GS*GS, CB)

        if q8:
            # acc is the f32 bilinear result: round/clip/convert here is
            # the quant path's round(crop / x_scale) with one fewer bf16
            # rounding (the intermediate crop tensor never exists)
            acc = jnp.clip(jnp.round(acc * inv_s_ref[0, 0]), -127.0, 127.0)
        return acc

    g2 = GS // 2
    if s2d and g2 % 8:
        # space-to-depth emit, QUAD mode: int8 sub-tile stores need
        # second-minor offsets that are multiples of 8, and a single
        # gs=8 group's phase slab is only g2=4 wide.  Process a 2x2
        # group quad per iteration (same tiles, same per-output matmul
        # and hinge-build cost as the plain path — an ENLARGED-tile
        # gs=16 variant was measured 2x slower: the dense hinge-weight
        # build scales with tile_rows x group_size) and store each
        # phase as one aligned (gs, gs) block.  Caller guarantees
        # ngy/ngx even (_s2d_plan).
        nqx = ngx // 2
        n = g2 * g2

        def body(qi, _):
            qy, qx = qi // nqx, qi % nqx
            accs = [acc_for((2 * qy + a) * ngx + (2 * qx + b))
                    for a in (0, 1) for b in (0, 1)]
            oy = pl.multiple_of(qy * GS, 8)
            ox = pl.multiple_of(qx * GS, 8)
            for p in range(4):
                blks = [a[p * n:(p + 1) * n].reshape(g2, g2, CB)
                        for a in accs]
                blk = jnp.concatenate(
                    [jnp.concatenate([blks[0], blks[1]], axis=1),
                     jnp.concatenate([blks[2], blks[3]], axis=1)], axis=0)
                out_ref[0, 0, pl.ds(oy, GS), pl.ds(ox, GS),
                        p * CB:(p + 1) * CB] = blk.astype(out_ref.dtype)
            return 0

        n_units = ng // 4
    elif s2d:
        # space-to-depth emit, direct mode (g2 is already 8-aligned):
        # the caller ordered each group's GS*GS output positions
        # PHASE-MAJOR (_s2d_group_order), so each phase is a contiguous
        # (GS/2)^2-row slab of acc and the crop lands directly in the
        # (Ho/2, Wo/2, 4*C) layout the stride-1 int8 conv1 wants — the
        # XLA transpose this replaces cost 5.8 ms/tick (exp_conv1.py)
        def body(g, _):
            acc = acc_for(g)
            oy = pl.multiple_of((g // ngx) * g2, 8)
            ox = pl.multiple_of((g % ngx) * g2, 8)
            for p in range(4):
                out_ref[0, 0, pl.ds(oy, g2), pl.ds(ox, g2),
                        p * CB:(p + 1) * CB] = (
                    acc[p * g2 * g2:(p + 1) * g2 * g2]
                    .reshape(g2, g2, CB).astype(out_ref.dtype))
            return 0

        n_units = ng
    else:
        def body(g, _):
            acc = acc_for(g)
            # the ox write offset lands on the sublane dim of the output
            # block — Mosaic needs the same alignment hint as tile reads
            oy = pl.multiple_of((g // ngx) * GS, GS)
            ox = pl.multiple_of((g % ngx) * GS, GS)
            out_ref[0, 0, pl.ds(oy, GS), pl.ds(ox, GS), :] = acc.reshape(
                GS, GS, CB
            ).astype(out_ref.dtype)
            return 0

        n_units = ng

    # full unroll is worth 2.3x at agent shapes (ng=144), but Mosaic only
    # supports unroll in {1, ng} and very large unrolled bodies (ng>=576,
    # the 192px BEV teacher crops) crash the compiler — cap it
    jax.lax.fori_loop(0, n_units, body, 0,
                      unroll=n_units if (unroll and n_units <= 300) else 1)


def _s2d_group_order(gs: int):
    """Static permutation putting a group's GS*GS raster positions in
    phase-major (dy, dx, ty/2, tx/2) order, so each 2x2-phase is a
    contiguous slab of the kernel's matmul output (the matmul column
    order IS the output-position order — reordering is free)."""
    import numpy as np

    g2 = gs // 2
    idx = [(2 * ty2 + dy) * gs + (2 * tx2 + dx)
           for dy in (0, 1) for dx in (0, 1)
           for ty2 in range(g2) for tx2 in range(g2)]
    return np.asarray(idx, np.int32)


@functools.partial(
    jax.jit, static_argnames=("cb", "gs", "interpret", "unroll", "q8", "s2d",
                              "tsy", "tsx")
)
def _grid_sample_pallas_batched(img, grid, inv_s, cb: int, gs: int,
                                interpret: bool, unroll: bool = True,
                                q8: bool = False, s2d: bool = False,
                                tsy: int = TSY, tsx: int = TSX):
    """Natively batched core: img (B,H,W,C), grid (B,K,Ho,Wo,2) ->
    (B,K,Ho,Wo,C) over a (B, channel-blocks, K) sequential grid.
    inv_s: (1,1) f32 int8 epilogue inverse scale (ignored unless q8).
    s2d: emit (B,K,Ho/2,Wo/2,4C) space-to-depth crops (requires cb == C;
    channel order (dy, dx, c) matching quant.conv2d_int8_s2d weights)."""
    B, H, W, C = img.shape
    _, K, Ho, Wo, _ = grid.shape
    GS = gs
    ngy, ngx = Ho // GS, Wo // GS
    ng = ngy * ngx
    assert not s2d or (cb == C and GS % 2 == 0 and q8)

    ix = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    def group_view(a):  # (B, K, Ho, Wo) -> (B, K, ng, GS*GS)
        a = a.reshape(B, K, ngy, GS, ngx, GS).transpose(0, 1, 2, 4, 3, 5)
        a = a.reshape(B, K, ng, GS * GS)
        return a[..., _s2d_group_order(GS)] if s2d else a

    gx, gy = group_view(ix), group_view(iy)
    x0 = jnp.clip(jnp.floor(gx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 2).astype(jnp.int32)
    # x starts aligned down to 8 (Mosaic dynamic sublane slices must be
    # aligned); the clip target W - TSX is not necessarily 8-aligned, so
    # align after the clip (alignment only lowers the start)
    tx = (jnp.clip(jnp.min(x0, axis=-1), 0, W - tsx) // 8) * 8
    ty = jnp.clip(jnp.min(y0, axis=-1), 0, H - tsy)
    starts = jnp.stack([ty, tx], axis=-1)                    # (B, K, ng, 2)
    fx = gx - tx[..., None].astype(jnp.float32)              # (B, K, ng, GS²)
    fy = gy - ty[..., None].astype(jnp.float32)

    itemsize = jnp.dtype(img.dtype).itemsize
    cb_pad = _pad128(cb)
    src_bytes = H * W * cb_pad * itemsize
    out_bytes = Ho * Wo * cb_pad * itemsize
    # lane-padded narrow-C sources can't afford Mosaic's default double
    # buffering (2 x 52.4 MB for a 320x320x5 f32 map); single-buffer them —
    # the pipeline stalls for one ~2 MB logical source DMA per (b, cblk),
    # amortized over K crops x ng output groups
    single_buf = 2 * (src_bytes + out_bytes) > _PIPE_BUDGET
    src_bufs = 1 if single_buf else 2
    # the fully-unrolled s2d quad body keeps 4 group accumulators + phase
    # blocks live across iterations — its scoped stack measured 64.7 MB
    # at agent shapes (v5e has 128 MB physical; a tight limit is only
    # needed when the pipelined windows themselves are big)
    slack = (70 << 20) if s2d else (1 << 22)
    vmem_bytes = min(src_bufs * src_bytes + 2 * out_bytes + slack,
                     120 << 20)
    ncb = C // cb

    src_spec = pl.BlockSpec(
        (1, H, W, cb), lambda b, c, k: (b, 0, 0, c),
        memory_space=pltpu.VMEM,
        pipeline_mode=pl.Buffered(buffer_count=src_bufs),
    )

    if s2d:
        out_spec = pl.BlockSpec((1, 1, Ho // 2, Wo // 2, 4 * cb),
                                lambda b, c, k: (b, k, 0, 0, c),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, K, Ho // 2, Wo // 2, 4 * C),
                                         jnp.int8)
    else:
        out_spec = pl.BlockSpec((1, 1, Ho, Wo, cb),
                                lambda b, c, k: (b, k, 0, 0, c),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (B, K, Ho, Wo, C), jnp.int8 if q8 else img.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, ngx=ngx, gs=gs, unroll=unroll, q8=q8,
                          s2d=s2d, tsy=tsy, tsx=tsx),
        grid=(B, ncb, K),
        in_specs=[
            pl.BlockSpec((1, 1, ng, 2), lambda b, c, k: (b, k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ng, GS * GS), lambda b, c, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ng, GS * GS), lambda b, c, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, c, k: (0, 0),
                         memory_space=pltpu.SMEM),
            src_spec,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)
        ),
        interpret=interpret,
    )(starts, fx, fy, inv_s, img)


def _pick_cb(C: int, H: int, W: int, Ho: int, Wo: int,
             itemsize: int) -> int:
    """Largest channel block whose double-buffered working set fits VMEM.

    Mosaic requires a block's minor dim to be 128-divisible or full-C.
    Bigger blocks mean fewer grid passes and wider MXU matmuls; v5e has
    128 MB VMEM, so the full C=384 agent block (53 MB) fits outright."""
    budget = _PIPE_BUDGET
    per_c = 2 * (H * W + Ho * Wo) * itemsize
    if C * per_c <= budget or C % 128 != 0:
        return C
    best = 128
    for mult in range(2, C // 128 + 1):
        cb = 128 * mult
        if C % cb == 0 and cb * per_c <= budget:
            best = cb
    return best


@functools.lru_cache(maxsize=None)
def _make_sampler(cb: int, gs: int, interpret: bool, q8: bool = False,
                  s2d: bool = False, tsy: int = TSY, tsx: int = TSX):
    @jax.custom_batching.custom_vmap
    def sample(img, grid, inv_s):
        out = _grid_sample_pallas_batched(img[None], grid[None], inv_s,
                                          cb, gs, interpret, q8=q8, s2d=s2d,
                                          tsy=tsy, tsx=tsx)
        return out[0]

    @sample.def_vmap
    def _rule(axis_size, in_batched, img, grid, inv_s):
        img_b, grid_b, s_b = in_batched
        if s_b:
            # per-tensor static scale is shared across the batch (it comes
            # from the calibrated params, which the ego vmap broadcasts)
            inv_s = inv_s[0]
        if not grid_b:
            grid = jnp.broadcast_to(grid, (axis_size,) + grid.shape)
        if not img_b:
            # ONE shared source for all batch elements: fold the batch into
            # the crop axis instead of materializing axis_size HBM copies
            # of the map (that is the kernel's whole single-source design)
            B, K, Ho, Wo, _ = grid.shape
            out = _grid_sample_pallas_batched(
                img[None], grid.reshape(1, B * K, Ho, Wo, 2), inv_s, cb, gs,
                interpret, q8=q8, s2d=s2d, tsy=tsy, tsx=tsx,
            )
            return out.reshape(B, K, *out.shape[2:]), True
        return _grid_sample_pallas_batched(img, grid, inv_s, cb, gs,
                                           interpret, q8=q8, s2d=s2d,
                                           tsy=tsy, tsx=tsx), True

    return sample


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_shared_pallas(img, grid, interpret: bool = False):
    """Drop-in for `grid_sample_shared` (img (H,W,C), grids (K,Ho,Wo,2) ->
    (K,Ho,Wo,C)) via the fused tile+MXU kernel.  Caller must ensure
    `supports(...)` — use `crop_feature_shared(..., use_pallas=True)`."""
    H, W, C = img.shape
    K, Ho, Wo, _ = grid.shape
    # The per-group tile bound cannot be derived from a TRACED grid, so this
    # entry point supports ONLY `_crop_theta`-derived grids, whose sampling
    # step equals the output/source shape ratio (what crop_feature_shared
    # passes).  A direct caller with a larger true step would silently read
    # zeros for taps outside the fixed tile — so enforce the same static
    # eligibility check the routing layer uses instead of trusting callers.
    step = (Ho / H) * (H - 1) / max(Ho - 1, 1)
    if not supports((H, W, C), (Ho, Wo), step,
                    jnp.dtype(img.dtype).itemsize):
        raise ValueError(
            f"grid_sample_shared_pallas: shape combo img={img.shape} "
            f"out=({Ho},{Wo}) step={step:.3f} fails supports(); only "
            "_crop_theta-derived grids routed via crop_feature_shared("
            "use_pallas=True) are eligible — use grid_sample_shared for "
            "arbitrary grids"
        )
    gs = _pick_gs(step) or 8
    if Ho % gs or Wo % gs:
        gs = 8
    cb = _pick_cb(C, H, W, Ho, Wo, jnp.dtype(img.dtype).itemsize)
    dummy = jnp.ones((1, 1), jnp.float32)
    return _make_sampler(cb, gs, interpret)(img, grid, dummy)


def _fwd(img, grid, interpret):
    return grid_sample_shared_pallas(img, grid, interpret), (img, grid)


def _bwd(interpret, res, g):
    # identical backward to the XLA path: 4 wide-row scatter-adds
    from lav_tpu.core.warp import _grid_sample_shared_bwd

    return _grid_sample_shared_bwd(res, g)


grid_sample_shared_pallas.defvjp(_fwd, _bwd)


def grid_sample_shared_pallas_q8(img, grid, x_scale, interpret: bool = False,
                                 s2d: bool = False):
    """int8-emitting variant (inference only, no VJP): returns
    clip(round(grid_sample_shared_pallas(img, grid) / x_scale), ±127) as
    int8, quantized in the kernel epilogue so the bf16 crop stack never
    exists in HBM.  Feed the result to nn.quant.conv2d_int8, which skips
    its own activation quantize for int8 inputs (same math: this IS that
    quantize, fused into the producer).

    s2d: additionally emit (K, Ho/2, Wo/2, 4C) space-to-depth crops
    (channel order (dy, dx, c)) for quant.conv2d_int8_s2d — the int8
    7x7s2 conv1 runs at 49% of int8 peak while the equivalent 4x4s1 conv
    on the s2d view hits 94% (scripts/exp_conv1.py), and emitting the
    layout here makes the 5.8 ms XLA transpose free."""
    H, W, C = img.shape
    K, Ho, Wo, _ = grid.shape
    step = (Ho / H) * (H - 1) / max(Ho - 1, 1)
    if not supports((H, W, C), (Ho, Wo), step,
                    jnp.dtype(img.dtype).itemsize):
        raise ValueError(
            f"grid_sample_shared_pallas_q8: img={img.shape} out=({Ho},{Wo}) "
            "fails supports(); route via crop_feature_shared"
        )
    cb = _pick_cb(C, H, W, Ho, Wo, jnp.dtype(img.dtype).itemsize)
    if s2d:
        plan = _s2d_plan((H, W, C), (Ho, Wo), cb, step)
        if plan is None:
            raise ValueError("s2d crop layout ineligible here — check "
                             "s2d_eligible() before requesting it")
        gs, tsy, tsx = plan
        inv = (1.0 / x_scale.astype(jnp.float32)).reshape(1, 1)
        return _make_sampler(cb, gs, interpret, q8=True, s2d=True,
                             tsy=tsy, tsx=tsx)(img, grid, inv)
    gs = _pick_gs(step) or 8
    if Ho % gs or Wo % gs:
        gs = 8
    inv = (1.0 / x_scale.astype(jnp.float32)).reshape(1, 1)
    return _make_sampler(cb, gs, interpret, q8=True)(img, grid, inv)


def _s2d_plan(img_shape, out_hw, cb, step):
    """(gs, tsy, tsx) for the s2d emit, or None if ineligible.

    Same group/tile selection as the plain path (an ENLARGED-tile gs=16
    variant was measured 2x slower — the dense hinge-weight build scales
    with tile_rows x group_size).  int8 sub-tile stores need 8-aligned
    second-minor offsets: at gs=16 the phase slab is already 8 wide
    (direct mode); at gs=8 the kernel processes 2x2 group QUADS and
    stores 8-wide combined blocks, which needs even group counts."""
    H, W, C = img_shape
    Ho, Wo = out_hw
    if cb != C:
        return None
    gs = _pick_gs(step) or 8
    if Ho % gs or Wo % gs:
        gs = 8
    if Ho % gs or Wo % gs:
        return None
    if gs % 16 and ((Ho // gs) % 2 or (Wo // gs) % 2):
        return None  # quad mode needs even ngy/ngx
    return gs, TSY, TSX


def s2d_eligible(img_shape, out_hw, itemsize: int) -> bool:
    """Static check: can the q8 kernel emit the s2d layout for this crop?
    (full-C channel block, gs=16 tile fits the source — see _s2d_plan)."""
    H, W, C = img_shape
    Ho, Wo = out_hw
    step = (Ho / H) * (H - 1) / max(Ho - 1, 1)
    if not supports(img_shape, out_hw, step, itemsize):
        return False
    cb = _pick_cb(C, H, W, Ho, Wo, itemsize)
    return _s2d_plan(img_shape, out_hw, cb, step) is not None

"""Differentiable affine warping (NHWC) with exact torch parity.

`affine_grid` + `grid_sample` reproduce torch.nn.functional semantics with
`align_corners=True`, bilinear interpolation, zero padding — the reference's
feature-crop path (/root/reference/lav/models/bev_planner.py:224-266
`crop_feature`) depends on these semantics at policy level.

TPU notes: the sampler is a pure gather + 4-tap lerp; XLA fuses it with
surrounding elementwise work.  All shapes static; batch handled by vmap-style
broadcasting inside one kernel rather than a Python loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# crop-gather lowering form, switchable for benchmarking: "block" = one
# (2,2,C)-slice gather (current best on v5e), "rows" = two (1,2,C) gathers
_GATHER_FORM = os.environ.get("LAV_GATHER_FORM", "block")


def affine_grid(theta, out_h: int, out_w: int):
    """Sampling grid for a batch of 2x3 affine maps.

    theta: (B, 2, 3) mapping normalized target coords (x_t, y_t, 1) to
    normalized source coords; returns grid (B, out_h, out_w, 2) with
    grid[..., 0] = x_s, grid[..., 1] = y_s.  align_corners=True: the
    normalized coords of pixel centers span exactly [-1, 1].
    """
    # grids are always f32: sampling POSITIONS are parity-critical even
    # when feature values run bf16 (bf16 would quantize positions ~0.4 px)
    xs = jnp.linspace(-1.0, 1.0, out_w, dtype=jnp.float32)
    ys = jnp.linspace(-1.0, 1.0, out_h, dtype=jnp.float32)
    base = jnp.stack(
        [
            jnp.tile(xs[None, :], (out_h, 1)),
            jnp.tile(ys[:, None], (1, out_w)),
            jnp.ones((out_h, out_w), jnp.float32),
        ],
        axis=-1,
    )  # (H, W, 3)
    return jnp.einsum(
        "hwk,bjk->bhwj", base, theta.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


def grid_sample(img, grid):
    """Bilinear sample `img` (B, H, W, C) at `grid` (B, Ho, Wo, 2).

    align_corners=True, zero padding: out-of-range taps contribute zero.
    grid[..., 0] is the x (width) coordinate in [-1, 1].
    """
    B, H, W, C = img.shape
    ix = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xf, yf, wx, wy):
        inb = (xf >= 0) & (xf <= W - 1) & (yf >= 0) & (yf <= H - 1)
        xi = jnp.clip(xf, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, H - 1).astype(jnp.int32)
        # gather per batch: (B, Ho, Wo, C)
        vals = jnp.take_along_axis(
            img.reshape(B, H * W, C),
            (yi * W + xi).reshape(B, -1, 1),
            axis=1,
        ).reshape(*xi.shape, C)
        w = (wx * wy * inb).astype(img.dtype)
        return vals * w[..., None]

    out = (
        tap(x0, y0, wx0, wy0)
        + tap(x1, y0, wx1, wy0)
        + tap(x0, y1, wx0, wy1)
        + tap(x1, y1, wx1, wy1)
    )
    return out.astype(img.dtype)


@jax.custom_vjp
def grid_sample_shared(img, grid):
    """Bilinear-sample ONE source `img` (H, W, C) at many grids
    (K, Ho, Wo, 2) -> (K, Ho, Wo, C).

    Custom VJP: XLA expands the gather's automatic backward into a
    serialized one-update-per-iteration while loop (767 ms of a 1.7 s
    distillation train step, measured on v5e); the hand-written backward is
    one wide-row scatter-add.  The grid receives ZERO gradient — every
    caller derives sampling positions from data (actor poses, jitters),
    never from parameters; assert that invariant at call sites if new uses
    appear.

    Memory- and bandwidth-critical variant of `grid_sample`:
      * gathers directly from the single source instead of broadcasting it
        K times (tiling a 384-channel map per detection was an 8.8 GB HLO
        temp on v5e);
      * fetches each sample's whole 2x2 neighborhood with ONE gather of a
        (2, 2, C) slice instead of four separate row gathers (the 4-tap
        form was 4 x 32 ms per 16-ego agent tick on v5e).

    Zero-padding semantics come from per-tap weights
    w = max(0, 1 - |pos - col|) masked to the valid range, which equals
    align_corners=True bilinear with zeros outside (taps clamped into the
    source window contribute exactly the right weight).
    """
    H, W, C = img.shape
    K, Ho, Wo, _ = grid.shape
    ix = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, H - 2).astype(jnp.int32)

    # NOTE: gathering (2, 2*C) segments from an (H, W*C) view was measured
    # 30x SLOWER on v5e (2.7 vs 78 steps/s full-agent) — XLA's gather
    # emitter handles the (2, 2, C) slice form far better.
    starts = jnp.stack(
        [y0.reshape(-1), x0.reshape(-1)], axis=-1
    )  # (N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    if _GATHER_FORM == "i32" and img.dtype == jnp.bfloat16 and C % 2 == 0:
        # halve the gathered ELEMENT count by packing bf16 channel pairs
        # into int32 lanes (pure bitcast, values untouched)
        packed = jax.lax.bitcast_convert_type(
            img.reshape(H, W, C // 2, 2), jnp.int32
        )  # (H, W, C//2)
        g32 = jax.lax.gather(
            packed, starts, dnums, slice_sizes=(2, 2, C // 2),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, C//2) int32
        neigh = jax.lax.bitcast_convert_type(g32, jnp.bfloat16).reshape(
            -1, 2, 2, C
        )
    elif _GATHER_FORM == "rows":
        # two (1,2,C) row gathers: each fetch is one contiguous 2C segment
        starts1 = starts.at[:, 0].add(1)
        top = jax.lax.gather(
            img, starts, dnums, slice_sizes=(1, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        bot = jax.lax.gather(
            img, starts1, dnums, slice_sizes=(1, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        neigh = jnp.concatenate([top, bot], axis=1)
    else:
        neigh = jax.lax.gather(
            img, starts, dnums, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, C)
    neigh = neigh.reshape(K, Ho, Wo, 2, 2, C)

    # per-tap clamp weights: w = max(0, 1 - |pos - col|) with cols clamped
    # into the window reproduces zero-pad bilinear exactly, INCLUDING
    # partial edge contributions (no extra in-bounds mask — that would
    # wrongly zero samples straddling the border)
    x0f = x0.astype(ix.dtype)
    y0f = y0.astype(iy.dtype)
    wy = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(iy - (y0f + d))) for d in (0, 1)],
        axis=-1,
    )  # (K, Ho, Wo, 2)
    wx = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(ix - (x0f + d))) for d in (0, 1)],
        axis=-1,
    )
    w = (wy[..., :, None] * wx[..., None, :]).astype(img.dtype)
    # one contraction over the (2, 2) neighborhood — slicing the gather
    # output into 4 views forced large layout copies on v5e
    return jnp.einsum("khwij,khwijc->khwc", w, neigh)


def _sample_geometry(img_shape, grid):
    """Shared index/weight computation for grid_sample_shared fwd/bwd."""
    H, W, C = img_shape
    ix = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, H - 2).astype(jnp.int32)
    wy = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(iy - (y0.astype(iy.dtype) + d)))
         for d in (0, 1)], axis=-1)
    wx = jnp.stack(
        [jnp.maximum(0.0, 1.0 - jnp.abs(ix - (x0.astype(ix.dtype) + d)))
         for d in (0, 1)], axis=-1)
    w = wy[..., :, None] * wx[..., None, :]  # (K, Ho, Wo, 2, 2)
    return x0, y0, w


def _grid_sample_shared_fwd(img, grid):
    # keep img in residuals for its (static) shape/dtype — residual leaves
    # must be JAX values, and shape ints would arrive as tracers
    return grid_sample_shared(img, grid), (img, grid)


def _grid_sample_shared_bwd(res, g):
    img, grid = res
    H, W, C = img.shape
    img_dtype = img.dtype
    x0, y0, w = _sample_geometry(img.shape, grid)
    base = (y0 * W + x0).reshape(-1)  # (N,)
    g_flat = g.reshape(-1, C)
    d_img = jnp.zeros((H * W, C), g.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            idx = base + dy * W + dx
            upd = g_flat * w[..., dy, dx].reshape(-1, 1).astype(g.dtype)
            d_img = d_img.at[idx].add(upd)
    return d_img.reshape(H, W, C).astype(img_dtype), None


grid_sample_shared.defvjp(_grid_sample_shared_fwd, _grid_sample_shared_bwd)


def _crop_theta(rel_locs, rel_oris, H, W, pixels_per_meter, crop_size,
                offset_x, offset_y, dtype=jnp.float32):
    del dtype  # thetas are always f32 (see affine_grid)
    rel = rel_locs.reshape(-1, 2).astype(jnp.float32) * pixels_per_meter / \
        jnp.array([H / 2.0, W / 2.0], jnp.float32)
    cos = jnp.cos(rel_oris.astype(jnp.float32))
    sin = jnp.sin(rel_oris.astype(jnp.float32))
    k = crop_size / H
    rot_x_off = -k * offset_x * cos + k * offset_y * sin + offset_x
    rot_y_off = -k * offset_x * sin - k * offset_y * cos + offset_y
    row0 = jnp.stack([k * cos, -k * sin, rot_x_off + rel[..., 0]], axis=-1)
    row1 = jnp.stack([k * sin, k * cos, rot_y_off + rel[..., 1]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # (K, 2, 3)


def pallas_crop_available() -> bool:
    """True when the fused Pallas crop kernel can run (TPU backend).

    Decided at trace time (backend identity is static); CPU tests and the
    goldens keep the XLA gather path bit-for-bit.  Respects a
    `jax.default_device(cpu)` override — int8 calibration replays the agent
    step eagerly on host CPU in a process whose default backend is the TPU
    (__graft_entry__._calibrate_v2_scales), where compiled Pallas would
    die with 'Only interpret mode is supported on CPU backend'."""
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return getattr(dev, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def crop_feature_shared(
    features,
    rel_locs,
    rel_oris,
    *,
    pixels_per_meter: float,
    crop_size: int,
    offset_x: float = 0.0,
    offset_y: float = 0.75,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    q8_x_scale=None,
    q8_s2d: bool = False,
):
    """K rotated crops from ONE feature map.

    features (H, W, C); rel_locs (K, 2) meters; rel_oris (K,) radians
    -> (K, crop_size, crop_size, C).  Same affine construction as
    `crop_feature` but without materializing K copies of the source —
    use this whenever many actors crop the same map (the planners' hot
    path, reference bev_planner.py:94 / uniplanner.py:77-78).

    use_pallas: route the sampling through the fused tile+MXU kernel
    (core/warp_pallas.py) when the shapes qualify — the crop sampling is
    a rigid transform with bounded step, which is exactly what the kernel
    requires.  Falls back to the XLA gather otherwise.

    q8_x_scale: emit int8 crops clip(round(crop / q8_x_scale), ±127) —
    the int8 crop-resnet's activation quantize fused into the producer
    (in the Pallas epilogue on TPU; a post-pass on the XLA fallback so
    CPU tests see identical semantics).  Inference only (no gradient).

    q8_s2d (requires q8_x_scale): emit (K, crop/2, crop/2, 4C)
    space-to-depth int8 crops, channel order (dy, dx, c), the exact
    input form of quant.conv2d_int8_s2d — the kernel writes the layout
    for free (phase-major matmul column order) where an XLA transpose
    costs 5.8 ms/tick.  Callers must gate on `s2d_crop_eligible` so the
    output shape is decided statically.
    """
    H, W, _ = features.shape
    theta = _crop_theta(rel_locs, rel_oris, H, W, pixels_per_meter,
                        crop_size, offset_x, offset_y, features.dtype)
    grid = affine_grid(theta, crop_size, crop_size)
    if use_pallas and not pallas_interpret and not pallas_crop_available():
        use_pallas = False  # compiled Pallas is TPU-only; fall back, don't die
    if use_pallas:
        from lav_tpu.core.warp_pallas import (
            grid_sample_shared_pallas, grid_sample_shared_pallas_q8,
            s2d_eligible, supports,
        )
        # source px per output px of this crop's rigid transform
        step = (crop_size / H) * (H - 1) / max(crop_size - 1, 1)
        if supports(features.shape, (crop_size, crop_size), step,
                    jnp.dtype(features.dtype).itemsize):
            if q8_x_scale is not None:
                s2d = q8_s2d and s2d_eligible(
                    features.shape, (crop_size, crop_size),
                    jnp.dtype(features.dtype).itemsize)
                crops = grid_sample_shared_pallas_q8(
                    features, grid, q8_x_scale, pallas_interpret, s2d=s2d)
                if q8_s2d and not s2d:
                    # kernel couldn't emit the layout (blocked channels /
                    # odd group): keep the OUTPUT SHAPE contract with an
                    # int8 XLA reshuffle (half the bf16 transpose cost)
                    K, Ho, Wo, C = crops.shape
                    crops = crops.reshape(K, Ho // 2, 2, Wo // 2, 2, C)
                    crops = crops.transpose(0, 1, 3, 2, 4, 5).reshape(
                        K, Ho // 2, Wo // 2, 4 * C)
                return crops
            return grid_sample_shared_pallas(features, grid, pallas_interpret)
    crops = grid_sample_shared(features, grid)
    if q8_x_scale is not None:
        crops = jnp.clip(
            jnp.round(crops.astype(jnp.float32) / q8_x_scale), -127, 127
        ).astype(jnp.int8)
        if q8_s2d:
            K, Ho, Wo, C = crops.shape
            crops = crops.reshape(K, Ho // 2, 2, Wo // 2, 2, C)
            crops = crops.transpose(0, 1, 3, 2, 4, 5).reshape(
                K, Ho // 2, Wo // 2, 4 * C)
    return crops


def crop_feature(
    features,
    rel_locs,
    rel_oris,
    *,
    pixels_per_meter: float,
    crop_size: int,
    offset_x: float = 0.0,
    offset_y: float = 0.75,
    use_pallas: bool = False,
):
    """Rotated ego/actor-centric crop from a BEV feature map.

    features: (B, H, W, C);  rel_locs: (B, 2) meters; rel_oris: (B,) radians.
    Builds the same affine map as the reference `crop_feature`
    (bev_planner.py:224-266): scale k = crop_size/H, rotation by rel_ori,
    and an offset that keeps the ego anchor (offset_x, offset_y in
    normalized coords) fixed under the crop.

    use_pallas: route through the fused tile+MXU kernel as a per-item
    K=1 shared crop when shapes qualify.  Besides speed, this avoids the
    XLA gather's lane-padded neighborhood temp — on narrow-channel BEV
    maps (C=5/9, padded to 128 lanes) that temp is ~0.4 GiB PER SAMPLE
    and is what kept reference-scale batch sizes from compiling.
    """
    B, H, W, _ = features.shape
    if use_pallas:
        from lav_tpu.core.warp_pallas import supports

        step = (crop_size / H) * (H - 1) / max(crop_size - 1, 1)
        if supports(features.shape[1:], (crop_size, crop_size), step,
                    jnp.dtype(features.dtype).itemsize):
            out = jax.vmap(
                lambda f, l, o: crop_feature_shared(
                    f, l[None], o[None],
                    pixels_per_meter=pixels_per_meter, crop_size=crop_size,
                    offset_x=offset_x, offset_y=offset_y, use_pallas=True,
                )
            )(features, rel_locs, rel_oris)
            return out[:, 0]
    theta = _crop_theta(rel_locs, rel_oris, H, W, pixels_per_meter,
                        crop_size, offset_x, offset_y, features.dtype)
    grid = affine_grid(theta, crop_size, crop_size)
    return grid_sample(features, grid)

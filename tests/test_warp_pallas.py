"""Fused Pallas crop-sampling kernel vs the XLA gather path (interpret
mode on CPU; the real-TPU timing lives in scripts/exp_crop_kernel.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lav_tpu.core.warp import (
    affine_grid, _crop_theta, crop_feature_shared, grid_sample_shared,
)
from lav_tpu.core.warp_pallas import grid_sample_shared_pallas, supports


def _random_grids(rng, K, H, W, crop, ppm=2.0, big_offsets=False):
    scale = 8.0 if big_offsets else 2.0
    locs = jnp.asarray(rng.uniform(-scale, scale, (K, 2)), jnp.float32)
    oris = jnp.asarray(rng.uniform(-np.pi, np.pi, (K,)), jnp.float32)
    theta = _crop_theta(locs, oris, H, W, ppm, crop, 0.0, 0.75)
    return affine_grid(theta, crop, crop)


@pytest.mark.parametrize("C", [64, 128])
@pytest.mark.parametrize("big", [False, True])
def test_pallas_crop_matches_xla(rng, C, big):
    H = W = 40
    crop = 24
    K = 3
    nrng = np.random.default_rng(3 if big else 4)
    img = jnp.asarray(nrng.normal(size=(H, W, C)), jnp.float32)
    grid = _random_grids(nrng, K, H, W, crop, big_offsets=big)
    assert supports(img.shape, (crop, crop), crop / H * (H - 1) / (crop - 1))

    ref = grid_sample_shared(img, grid)
    out = grid_sample_shared_pallas(img, grid, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_crop_feature_shared_route(rng):
    """crop_feature_shared(use_pallas=True) == default path exactly (same
    grids, interpret-mode kernel)."""
    nrng = np.random.default_rng(5)
    feats = jnp.asarray(nrng.normal(size=(32, 32, 64)), jnp.float32)
    locs = jnp.asarray(nrng.uniform(-3, 3, (4, 2)), jnp.float32)
    oris = jnp.asarray(nrng.uniform(-2, 2, (4,)), jnp.float32)
    kw = dict(pixels_per_meter=2.0, crop_size=16, offset_y=0.5)
    ref = crop_feature_shared(feats, locs, oris, **kw)
    out = crop_feature_shared(feats, locs, oris, use_pallas=True,
                              pallas_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_crop_grad_matches_xla(rng):
    """The custom VJP reuses the XLA wide-row scatter backward."""
    nrng = np.random.default_rng(6)
    img = jnp.asarray(nrng.normal(size=(24, 24, 8)), jnp.float32)
    grid = _random_grids(nrng, 2, 24, 24, 16)

    g_ref = jax.grad(lambda im: grid_sample_shared(im, grid).sum())(img)
    g_pal = jax.grad(
        lambda im: grid_sample_shared_pallas(im, grid, True).sum()
    )(img)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_vmapped_over_egos(rng):
    """The agent vmaps the whole step over egos; the kernel must batch."""
    nrng = np.random.default_rng(7)
    E, K, H, W, C, crop = 3, 2, 32, 32, 16, 16
    imgs = jnp.asarray(nrng.normal(size=(E, H, W, C)), jnp.float32)
    grids = jnp.stack(
        [_random_grids(nrng, K, H, W, crop) for _ in range(E)]
    )
    ref = jax.vmap(grid_sample_shared)(imgs, grids)
    out = jax.vmap(lambda i, g: grid_sample_shared_pallas(i, g, True))(
        imgs, grids
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_teacher_shape_route(rng):
    """The 192px teacher BEV crops: narrow-C (5) f32 source, gs=8 route,
    rolled group loop, single-buffered source window on TPU — pin the
    interpret-mode semantics + grad + vmap of that configuration
    (reference bev_planner.py:94 crops at crop_size*2 from the 320px map)."""
    nrng = np.random.default_rng(8)
    B, K, H, C, crop = 2, 3, 96, 5, 48  # same H/crop ratio as 320/192
    imgs = jnp.asarray(nrng.normal(size=(B, H, H, C)), jnp.float32)
    grids = jnp.stack(
        [_random_grids(nrng, K, H, H, crop, ppm=4.0, big_offsets=True)
         for _ in range(B)]
    )
    step = (crop / H) * (H - 1) / (crop - 1)
    assert supports((H, H, C), (crop, crop), step)

    ref = jax.vmap(grid_sample_shared)(imgs, grids)
    out = jax.vmap(lambda i, g: grid_sample_shared_pallas(i, g, True))(
        imgs, grids
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)

    def loss_pal(im):
        return jax.vmap(
            lambda i, g: grid_sample_shared_pallas(i, g, True)
        )(im, grids).sum()

    def loss_ref(im):
        return jax.vmap(grid_sample_shared)(im, grids).sum()

    g_pal = jax.grad(loss_pal)(imgs)
    g_ref = jax.grad(loss_ref)(imgs)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=5e-5, rtol=1e-4)


def test_pallas_vmap_shared_source(rng):
    """vmap over grids with ONE shared source folds into the crop axis
    (no per-batch source copies) and matches the XLA path."""
    nrng = np.random.default_rng(9)
    B, K, H, C, crop = 4, 2, 32, 16, 16
    img = jnp.asarray(nrng.normal(size=(H, H, C)), jnp.float32)
    grids = jnp.stack(
        [_random_grids(nrng, K, H, H, crop) for _ in range(B)]
    )
    ref = jax.vmap(lambda g: grid_sample_shared(img, g))(grids)
    out = jax.vmap(lambda g: grid_sample_shared_pallas(img, g, True))(grids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_q8_crop_matches_posthoc_quantize(rng):
    """The q8 epilogue (int8 crops quantized IN the kernel) must match
    quantizing the bf16 crops after the fact, up to the one bf16 rounding
    the fused form skips (so values may differ by at most 1 quant step,
    and only rarely)."""
    from lav_tpu.core.warp import crop_feature_shared
    from lav_tpu.core.warp_pallas import grid_sample_shared_pallas_q8

    nrng = np.random.default_rng(11)
    K, H, C, crop = 3, 96, 128, 32
    img = jnp.asarray(nrng.normal(size=(H, H, C)), jnp.bfloat16)
    locs = jnp.asarray(nrng.uniform(-8, 8, (K, 2)), jnp.float32)
    oris = jnp.asarray(nrng.uniform(-3, 3, (K,)), jnp.float32)
    scale = jnp.float32(
        float(jnp.max(jnp.abs(img.astype(jnp.float32)))) / 127.0)

    ref_bf16 = crop_feature_shared(
        img, locs, oris, pixels_per_meter=4.0, crop_size=crop)
    ref_q = np.clip(np.round(np.asarray(ref_bf16, np.float32) / float(scale)),
                    -127, 127).astype(np.int8)
    out_q = np.asarray(crop_feature_shared(
        img, locs, oris, pixels_per_meter=4.0, crop_size=crop,
        use_pallas=True, pallas_interpret=True, q8_x_scale=scale))
    assert out_q.dtype == np.int8
    diff = np.abs(out_q.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1
    # the fused form quantizes the f32 bilinear result directly (no
    # intermediate bf16 crop), so ~1-2% of values sit on the other side
    # of a rounding boundary — by at most 1 step (policy impact is
    # bounded end-to-end by test_quant.py's parity oracle)
    assert (diff > 0).mean() < 0.05

    # direct entry point agrees with the routed one
    from lav_tpu.core.warp import _crop_theta, affine_grid
    theta = _crop_theta(locs, oris, H, H, 4.0, crop, 0.0, 0.75, img.dtype)
    grid = affine_grid(theta, crop, crop)
    out2 = np.asarray(grid_sample_shared_pallas_q8(img, grid, scale, True))
    np.testing.assert_array_equal(out_q, out2)


def test_conv2d_int8_consumes_prequantized(rng):
    """conv2d_int8 on int8 input (producer-quantized with the calibrated
    x_scale) equals the bf16-input path that quantizes internally."""
    from lav_tpu.nn.quant import quantize_conv
    from lav_tpu.nn import layers as L

    nrng = np.random.default_rng(12)
    p = {"w": jnp.asarray(nrng.normal(size=(7, 7, 64, 32)), jnp.float32),
         "b": jnp.asarray(nrng.normal(size=(32,)), jnp.float32)}
    q = quantize_conv(p)
    x = jnp.asarray(nrng.normal(size=(2, 16, 16, 64)), jnp.bfloat16)
    s = jnp.float32(float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / 127.0)
    q["x_scale"] = s

    y_float_in = L.conv2d(q, x, stride=2, padding=3)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    y_int_in = L.conv2d(q, xq, stride=2, padding=3)
    assert y_int_in.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_int_in, np.float32),
        np.asarray(y_float_in.astype(jnp.float32)), atol=1e-2, rtol=1e-2)


def test_q8_s2d_crop_conv_matches_plain_q8(rng):
    """s2d-layout q8 crops + conv2d_int8_s2d == plain q8 crops +
    conv2d_int8 (identical int32 accumulation, exact)."""
    from lav_tpu.core.warp import crop_feature_shared
    from lav_tpu.nn.quant import quantize_conv, conv2d_int8, conv2d_int8_s2d

    nrng = np.random.default_rng(13)
    K, H, C, crop, O = 3, 96, 128, 32, 32
    img = jnp.asarray(nrng.normal(size=(H, H, C)), jnp.bfloat16)
    locs = jnp.asarray(nrng.uniform(-8, 8, (K, 2)), jnp.float32)
    oris = jnp.asarray(nrng.uniform(-3, 3, (K,)), jnp.float32)
    scale = jnp.float32(
        float(jnp.max(jnp.abs(img.astype(jnp.float32)))) / 127.0)
    q = quantize_conv({"w": jnp.asarray(
        nrng.normal(size=(7, 7, C, O)), jnp.float32),
        "b": jnp.asarray(nrng.normal(size=(O,)), jnp.float32)})
    q["x_scale"] = scale

    kw = dict(pixels_per_meter=4.0, crop_size=crop, use_pallas=True,
              pallas_interpret=True, q8_x_scale=scale)
    plain = crop_feature_shared(img, locs, oris, **kw)
    s2d = crop_feature_shared(img, locs, oris, q8_s2d=True, **kw)
    assert s2d.shape == (K, crop // 2, crop // 2, 4 * C)

    # the s2d layout round-trips to the plain crops; values may sit one
    # quant step apart where the permuted matmul's f32 summation grouping
    # flips a rounding boundary (same phenomenon as the posthoc test)
    un = np.asarray(s2d).reshape(K, crop // 2, crop // 2, 2, 2, C)
    un = un.transpose(0, 1, 3, 2, 4, 5).reshape(K, crop, crop, C)
    diff = np.abs(un.astype(np.int32) - np.asarray(plain, np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01

    # conv on the s2d form == conv on the (un-s2d'd) plain form — same
    # int32 accumulation given the same int8 inputs (exp_conv1.py proved
    # element-exactness); feed the EXACT same values to isolate the conv
    same_plain = jnp.asarray(un)
    y_plain = conv2d_int8(q, same_plain, (2, 2), ((3, 3), (3, 3)), (1, 1))
    y_s2d = conv2d_int8_s2d(q, s2d)
    assert y_s2d.shape == y_plain.shape
    np.testing.assert_array_equal(
        np.asarray(y_s2d, np.float32), np.asarray(y_plain, np.float32))

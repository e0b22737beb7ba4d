"""Parity tests: lav_tpu.core.warp vs torch affine_grid/grid_sample.

The reference policy depends on exact align_corners=True bilinear semantics
(bev_planner.py:261-264), so we pin them against torch CPU.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from lav_tpu.core.warp import affine_grid, grid_sample, crop_feature


def test_affine_grid_matches_torch(rng):
    theta = rng.normal(size=(3, 2, 3)).astype(np.float32)
    ours = np.asarray(affine_grid(jnp.asarray(theta), 7, 5))
    ref = F.affine_grid(
        torch.tensor(theta), torch.Size((3, 1, 7, 5)), align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(8, 8), (12, 6)])
def test_grid_sample_matches_torch(rng, out_hw):
    B, H, W, C = 2, 10, 14, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # grid partially out of range to exercise zero padding
    grid = rng.uniform(-1.3, 1.3, size=(B, *out_hw, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = F.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2),
        torch.tensor(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_crop_feature_matches_torch_pipeline(rng):
    """End-to-end: our crop_feature == torch affine_grid+grid_sample with the
    same theta construction (the reference crop formula)."""
    B, H, W, C = 2, 32, 32, 4
    ppm, crop, off_y = 4.0, 16, 0.75
    feats = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rel_locs = rng.uniform(-2, 2, size=(B, 2)).astype(np.float32)
    rel_oris = rng.uniform(-1, 1, size=(B,)).astype(np.float32)

    ours = np.asarray(
        crop_feature(
            jnp.asarray(feats),
            jnp.asarray(rel_locs),
            jnp.asarray(rel_oris),
            pixels_per_meter=ppm,
            crop_size=crop,
            offset_x=0.0,
            offset_y=off_y,
        )
    )

    # torch oracle with the same affine construction
    t_feats = torch.tensor(feats).permute(0, 3, 1, 2)
    rel = torch.tensor(rel_locs) * ppm / torch.tensor([H / 2, W / 2])
    cos = torch.cos(torch.tensor(rel_oris))
    sin = torch.sin(torch.tensor(rel_oris))
    k = crop / H
    rxo = k * off_y * sin + 0.0 * cos
    ryo = -k * off_y * cos + off_y + (off_y - off_y)
    rxo = -k * 0.0 * cos + k * off_y * sin + 0.0
    ryo = -k * 0.0 * sin - k * off_y * cos + off_y
    theta = torch.stack(
        [
            torch.stack([k * cos, -k * sin, rxo + rel[:, 0]], dim=-1),
            torch.stack([k * sin, k * cos, ryo + rel[:, 1]], dim=-1),
        ],
        dim=-2,
    )
    grids = F.affine_grid(theta, torch.Size((B, C, crop, crop)), align_corners=True)
    ref = (
        F.grid_sample(t_feats, grids, align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_crop_feature_shared_matches_tiled(rng):
    """The memory-safe shared-source multi-crop must equal the naive
    tile-then-crop path bit for bit."""
    from lav_tpu.core.warp import crop_feature_shared

    H, W, C, K = 24, 24, 6, 5
    feats = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    locs = jnp.asarray(rng.uniform(-3, 3, size=(K, 2)).astype(np.float32))
    oris = jnp.asarray(rng.uniform(-2, 2, size=(K,)).astype(np.float32))
    kw = dict(pixels_per_meter=4.0, crop_size=12, offset_y=0.75)

    shared = crop_feature_shared(feats, locs, oris, **kw)
    tiled = crop_feature(
        jnp.broadcast_to(feats[None], (K, H, W, C)), locs, oris, **kw
    )
    np.testing.assert_allclose(np.asarray(shared), np.asarray(tiled), atol=1e-6)


def test_grid_sample_shared_custom_vjp_matches_autodiff(rng):
    """The hand-written backward (wide-row scatter) must equal autodiff of
    the tiled reference path w.r.t. the image."""
    import jax
    from lav_tpu.core.warp import grid_sample_shared, grid_sample

    H, W, C, K = 12, 12, 6, 3
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, size=(K, 5, 5, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(K, 5, 5, C)).astype(np.float32))

    d_custom = jax.grad(
        lambda im: (grid_sample_shared(im, grid) * cot).sum()
    )(img)
    d_ref = jax.grad(
        lambda im: (
            grid_sample(jnp.broadcast_to(im[None], (K, H, W, C)), grid) * cot
        ).sum()
    )(img)
    np.testing.assert_allclose(np.asarray(d_custom), np.asarray(d_ref),
                               atol=1e-4)


def test_grid_sample_gradients_flow(rng):
    import jax

    img = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 4, 4, 2)).astype(np.float32))
    g = jax.grad(lambda im: grid_sample(im, grid).sum())(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

"""Heatmap rasterizers: jax (device) and numpy (host pipeline) twins agree."""

import numpy as np
import jax.numpy as jnp

from lav_tpu.core.heatmap import detections_to_heatmap, build_seg_mask
from lav_tpu.data.transforms import detections_to_heatmap_np


def test_jax_and_numpy_heatmaps_agree(rng):
    N, h, w = 6, 48, 48
    geo = dict(h=h, w=w, pixels_per_meter=2.0, min_x=-4.0, min_y=-12.0,
               max_y=12.0)
    locs = rng.uniform(-4, 8, size=(N, 2)).astype(np.float32)
    oris = rng.uniform(-3, 3, size=(N,)).astype(np.float32)
    bbox = rng.uniform(0.5, 2.0, size=(N, 2)).astype(np.float32)
    typs = rng.integers(0, 2, size=(N,)).astype(np.int32)

    hm_j, sz_j, ori_j = detections_to_heatmap(
        jnp.asarray(locs), jnp.asarray(oris), jnp.asarray(bbox),
        jnp.asarray(typs), jnp.ones(N, bool), **geo,
    )
    hm_n, sz_n, ori_n = detections_to_heatmap_np(
        locs, oris, bbox, typs, **geo,
    )
    np.testing.assert_allclose(np.asarray(hm_j), hm_n, atol=1e-5)
    # size/ori maps only matter where the loss weight (per-pixel heatmap
    # max, reference loss.py:19) is non-negligible; below that, XLA's
    # subnormal flush vs torch/numpy denormals flips the write mask at
    # gaussian values ~1e-45.
    w_mask = hm_n.max(0) > 1e-6
    np.testing.assert_allclose(
        np.asarray(sz_j)[:, w_mask], sz_n[:, w_mask], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ori_j)[:, w_mask], ori_n[:, w_mask], atol=1e-5
    )


def test_heatmap_validity_mask():
    geo = dict(h=32, w=32, pixels_per_meter=2.0, min_x=-4.0, min_y=-8.0,
               max_y=8.0)
    locs = jnp.array([[2.0, 0.0], [2.0, 0.0]])
    hm_all, _, _ = detections_to_heatmap(
        locs, jnp.zeros(2), jnp.ones((2, 2)), jnp.array([1, 1]),
        jnp.array([True, False]), **geo,
    )
    hm_one, _, _ = detections_to_heatmap(
        locs[:1], jnp.zeros(1), jnp.ones((1, 2)), jnp.array([1]),
        jnp.array([True]), **geo,
    )
    np.testing.assert_allclose(np.asarray(hm_all[1]), np.asarray(hm_one[1]),
                               atol=1e-6)


def test_seg_mask_peak_at_center():
    m = np.asarray(build_seg_mask(64, 64, cx=32.0, cy=48.0, radius_x=24,
                                  radius_y=24))
    assert m.shape == (64, 64)
    iy, ix = np.unravel_index(m.argmax(), m.shape)
    assert (ix, iy) == (32, 48)
    assert m.max() <= 1.0 + 1e-6

"""Gaussian center-heatmap rasterization for detection targets.

JAX re-expression of the reference's `detections_to_heatmap`
(/root/reference/lav/utils/datasets/lidar_dataset.py:92-127): fixed
`max_objs` slots with a validity mask instead of ragged per-class loops, so
the whole target build jits and can run batched on device (or host CPU in
the input pipeline).
"""

from __future__ import annotations

import jax.numpy as jnp


def build_seg_mask(h: int, w: int, cx: float, cy: float,
                   radius_x: float = 240.0, radius_y: float = 240.0):
    """Gaussian spatial weighting centered on the ego pixel, used by the v2
    distillation trainer to focus the BEV seg loss near the ego
    (reference lav_final_v2.py:261-271)."""
    gx = jnp.exp(-(((jnp.arange(w, dtype=jnp.float32) - cx) / radius_x) ** 2))
    gy = jnp.exp(-(((jnp.arange(h, dtype=jnp.float32) - cy) / radius_y) ** 2))
    return gy[:, None] * gx[None, :]


def detections_to_heatmap(
    locs,
    oris,
    bbox,
    typs,
    valid,
    *,
    h: int,
    w: int,
    pixels_per_meter: float,
    min_x: float,
    min_y: float,
    max_y: float,
    radius: float = 1.0,
):
    """Rasterize GT boxes into 2-class Gaussian heatmaps + size/ori maps.

    locs (N, 2) ego-frame meters; oris (N,); bbox (N, 2) half-extents in
    meters; typs (N,) int class (0 ped, 1 vehicle); valid (N,) bool.
    Returns heatmap (2, h, w), sizemap (2, h, w), orimap (2, h, w).

    Coordinate mapping matches the reference: ego pixel at
    (cx0, cy0) = ((max_y-min_y)*ppm/2, h + min_x*ppm), x right, y down.
    """
    ppm = pixels_per_meter
    cx = -locs[:, 0] * ppm + (max_y - min_y) * ppm / 2.0
    cy = -locs[:, 1] * ppm + h + min_x * ppm

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx = jnp.exp(-(((xs[None, :] - cx[:, None]) / radius) ** 2))  # (N, w)
    gy = jnp.exp(-(((ys[None, :] - cy[:, None]) / radius) ** 2))  # (N, h)
    g = gy[:, :, None] * gx[:, None, :]  # (N, h, w)
    g = jnp.where(valid[:, None, None], g, 0.0)

    heatmap = jnp.zeros((2, h, w))
    sizemap = jnp.zeros((2, h, w))
    orimap = jnp.zeros((2, h, w))

    for cls in (0, 1):
        cls_mask = (typs == cls) & valid
        g_cls = jnp.where(cls_mask[:, None, None], g, 0.0)
        gaussian = g_cls.max(axis=0)
        obj_id = g_cls.argmax(axis=0)  # (h, w)
        write = gaussian > heatmap.max(axis=0)

        size_px = bbox * ppm  # (N, 2)
        sz = size_px[obj_id].transpose(2, 0, 1)  # (2, h, w)
        sizemap = jnp.where(write[None], sz, sizemap)
        ori_sel = oris[obj_id]  # (h, w)
        orimap = jnp.where(
            write[None],
            jnp.stack([jnp.cos(ori_sel), jnp.sin(ori_sel)]),
            orimap,
        )
        heatmap = heatmap.at[cls].set(gaussian)

    return heatmap, sizemap, orimap

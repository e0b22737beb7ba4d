"""Pure-JAX planar geometry shared by datasets, models, and the agent.

These are the coordinate conventions of the reference LAV stack
(see /root/reference/lav/models/bev_planner.py:270-277 `transform_points`,
/root/reference/team_code_v2/ekf.py:102-118 `move_lidar_points`,
/root/reference/lav/utils/datasets/lidar_dataset.py:158-173 rotation jitters,
/root/reference/team_code_v2/waypointer.py:98-103 `latlon_to_xy`), expressed
as batched, jit/vmap-friendly functions.
"""

from __future__ import annotations

import jax.numpy as jnp

EARTH_RADIUS = 6371e3  # meters


def _apply_rot2(x, y, cos, sin):
    """p' = p @ [[cos, sin], [-sin, cos]] for row vectors, elementwise.

    Elementwise rather than a 2x2 matmul: tiny matmuls gain nothing from the
    MXU and JAX's default matmul precision on TPU (bf16 passes) would cost
    accuracy in these geometry ops.
    """
    return cos * x - sin * y, sin * x + cos * y


def transform_points(locs, oris):
    """Rotate (..., N, 2) point sets into frames given by `oris` (...).

    Equivalent to `locs @ [[cos, sin], [-sin, cos]]` — the reference's
    `transform_points` (bev_planner.py:270-277) — computed elementwise in
    full f32.  `oris` broadcasts against `locs[..., 0]`.
    """
    cos, sin = jnp.cos(oris), jnp.sin(oris)
    if jnp.ndim(cos) > 0 and jnp.ndim(cos) < locs.ndim - 1:
        shape = cos.shape + (1,) * (locs.ndim - 1 - cos.ndim)
        cos, sin = cos.reshape(shape), sin.reshape(shape)
    xr, yr = _apply_rot2(locs[..., 0], locs[..., 1], cos, sin)
    return jnp.stack([xr, yr], axis=-1)


def rotate_points_deg(points, angle_deg, center):
    """Rotate points (…,2) by `angle_deg` degrees about `center` (2,)."""
    rad = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    p = points - center
    xr, yr = _apply_rot2(p[..., 0], p[..., 1], cos, sin)
    return jnp.stack([xr, yr], axis=-1) + center


def rotate_lidar_deg(lidar, angle_deg):
    """Rotate lidar (N,4+) xyzr points about the z axis by `angle_deg` deg.

    Note the reference's convention rotates x/y with R^T relative to
    `transform_points` (lidar_dataset.py:158-165): [cos, sin; -sin, cos]
    applied to column [x, y].
    """
    rad = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    x, y = lidar[..., 0], lidar[..., 1]
    xr = cos * x - sin * y
    yr = sin * x + cos * y
    return jnp.concatenate(
        [jnp.stack([xr, yr], axis=-1), lidar[..., 2:]], axis=-1
    )


def move_lidar_points(lidar_xyz, dloc, ori0, ori1):
    """Re-register a lidar sweep captured at pose (loc, ori1) into the frame
    of pose (loc0, ori0), with dloc = loc - loc0.

    Mirrors reference ekf.py:102-118: rotate dloc into the ori0 frame,
    rotate the sweep by (ori1 - ori0), then translate.
    Accepts (..., N, 3) points; returns same shape.
    """
    # dloc @ [[cos0, -sin0], [sin0, cos0]] (ekf.py:104-107) == dloc @ R(ori0)^T
    c0, s0 = jnp.cos(ori0), jnp.sin(ori0)
    dx = dloc[..., 0] * c0 + dloc[..., 1] * s0
    dy = -dloc[..., 0] * s0 + dloc[..., 1] * c0
    dloc = jnp.stack([dx, dy], axis=-1)
    ori = ori1 - ori0
    cos, sin = jnp.cos(ori), jnp.sin(ori)
    x, y = lidar_xyz[..., 0], lidar_xyz[..., 1]
    # row-vector multiply by [[cos, sin], [-sin, cos]] (ekf.py:110-114)
    xr = cos * x - sin * y
    yr = sin * x + cos * y
    out = jnp.stack([xr, yr], axis=-1) + jnp.expand_dims(dloc, -2)
    return jnp.concatenate([out, lidar_xyz[..., 2:3]], axis=-1)


def latlon_to_xy(lat, lon, cos0):
    """Equirectangular GNSS lat/lon (degrees) to local xy meters."""
    x = EARTH_RADIUS * lat * (jnp.pi / 180.0)
    y = EARTH_RADIUS * lon * (jnp.pi / 180.0) * jnp.cos(cos0)
    return x, y

"""On-device point painting: project lidar into camera semantic maps.

Replaces the reference's CPU numpy hot spot
(/root/reference/team_code_v2/point_painting.py:5-66) — the stated reason
its "fast agent" exists — with a fully vectorized gather that lives inside
the jitted agent step.  The CARLA `Transform` matrices are pure geometry
(z-rotation + translation) and are hardcoded here, so no simulator binding
is needed.

Conventions (CARLA/UE4, left-handed, x forward, y right, z up):
  lidar_to_world:  p_w = p_l + lidar_xyz  (lidar mounted unrotated)
  world_to_cam:    p_c = R_z(yaw)^T (p_w - cam_xyz)
  image projection uses axes (y_c, -z_c, x_c) with pinhole K.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence


import jax.numpy as jnp
import numpy as np


class CameraRig(NamedTuple):
    """Static projection constants for one camera (precomputed on host)."""
    rot: np.ndarray       # (3, 3) world->cam rotation (R_z(yaw)^T)
    trans: np.ndarray     # (3,) cam position minus lidar position offset math
    K: np.ndarray         # (3, 3) intrinsics
    width: int
    height: int

    @staticmethod
    def build(cam_yaw_deg: float, lidar_xyz=(0.0, 0.0, 2.5),
              cam_xyz=(1.4, 0.0, 2.5), rgb_h: int = 320, rgb_w: int = 320,
              fov: float = 60.0) -> "CameraRig":
        focal = rgb_w / (2.0 * math.tan(fov * math.pi / 360.0))
        K = np.eye(3)
        K[0, 0] = K[1, 1] = focal
        K[0, 2] = rgb_w / 2.0
        K[1, 2] = rgb_h / 2.0
        yaw = math.radians(cam_yaw_deg)
        c, s = math.cos(yaw), math.sin(yaw)
        R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        return CameraRig(
            rot=R.T,
            trans=np.asarray(lidar_xyz, np.float64) - np.asarray(cam_xyz, np.float64),
            K=K,
            width=rgb_w,
            height=rgb_h,
        )


def project_to_camera(rig: CameraRig, lidar_xyz):
    """lidar_xyz (N, 3) -> (u (N,), v (N,), z (N,)) integer pixel coords +
    camera depth, reference CoordConverter.lidar_to_cam semantics
    (point_painting.py:27-43) including the int truncation."""
    p = lidar_xyz + jnp.asarray(rig.trans, lidar_xyz.dtype)
    cam = p @ jnp.asarray(rig.rot.T, lidar_xyz.dtype)  # rows: R^T p
    # reorder to image axes: (y, -z, x)
    img_axes = jnp.stack([cam[:, 1], -cam[:, 2], cam[:, 0]], axis=-1)
    K = jnp.asarray(rig.K, lidar_xyz.dtype)
    proj = img_axes @ K.T
    z = proj[:, 2]
    u = proj[:, 0] / (1e-5 + z)
    v = proj[:, 1] / (1e-5 + z)
    # reference truncates toward zero via .astype(int)
    return (
        jnp.trunc(u).astype(jnp.int32),
        jnp.trunc(v).astype(jnp.int32),
        jnp.trunc(z).astype(jnp.int32),
    )


def point_painting(lidar_xyz, sems, rigs: Sequence[CameraRig], valid=None):
    """Paint lidar points with per-camera semantic probabilities.

    lidar_xyz (N, 3); sems: (num_cams, H, W, C) probability maps (NHWC);
    rigs: per-camera projection constants in the same order.
    Returns (N, C); cameras later in the list override earlier ones where
    both see a point (reference point_painting.py:55-64).
    """
    N = lidar_xyz.shape[0]
    num_cams, H, W, C = sems.shape
    # ONE flat gather across all cameras: row-gathers are ISSUE-bound on
    # TPU (~2.3 ms per 320k-row gather at 16 egos), so resolve the winning
    # camera per point FIRST (cameras later in the list override earlier,
    # reference point_painting.py:55-64) with cheap vectorized projections,
    # then issue a single gather.  Points seen by no camera use an
    # out-of-bounds index and mode='fill' returns exact zeros.
    sems_flat = sems.reshape(num_cams * H * W, C)
    idx = jnp.full((N,), num_cams * H * W, jnp.int32)  # OOB -> zero fill
    for i, rig in enumerate(rigs):
        u, v, z = project_to_camera(rig, lidar_xyz)
        ok = (z >= 0) & (u >= 0) & (u < rig.width) & (v >= 0) & (v < rig.height)
        if valid is not None:
            ok = ok & valid
        uc = jnp.clip(u, 0, rig.width - 1)
        vc = jnp.clip(v, 0, rig.height - 1)
        idx = jnp.where(ok, i * H * W + vc * W + uc, idx)
    return jnp.take(sems_flat, idx, axis=0, mode="fill", fill_value=0)

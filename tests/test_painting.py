"""Point-painting oracles.

The agent's painting (ops/painting.py) replaces the reference's CPU numpy
hot spot (/root/reference/team_code_v2/point_painting.py:46-66).  Round 3
merged its per-camera gathers into ONE index-resolved gather, so this file
pins (a) the camera-override/boundary semantics against a direct
transliteration of the reference loop and (b) the hardcoded CameraRig
geometry against the carla Transform matrix formulation it replaces
(point_painting.py:14-25: lidar_to_world @ / world_to_cam @ chains).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lav_tpu.ops.painting import CameraRig, point_painting, project_to_camera


@pytest.fixture
def rigs():
    # the v2 agent's three cameras (agent yaw set)
    return [CameraRig.build(yaw) for yaw in (-60.0, 0.0, 60.0)]


def _reference_loop(lidar_xyz, sems, rigs, valid):
    """Transliteration of reference point_painting (point_painting.py:46-66):
    per camera, project, bounds-mask, overwrite rows — later cameras WIN
    where multiple see a point."""
    N = lidar_xyz.shape[0]
    num_cams, H, W, C = sems.shape
    painted = np.zeros((N, C), np.float32)
    for i, rig in enumerate(rigs):
        u, v, z = map(np.asarray, project_to_camera(rig, jnp.asarray(lidar_xyz)))
        ok = (z >= 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H) & valid
        painted[ok] = np.asarray(sems)[i, v[ok], u[ok]]
    return painted


def test_painting_matches_reference_loop(rigs):
    rng = np.random.default_rng(0)
    N = 4096
    # points all around the ego: some seen by 0, 1, or 2 cameras
    pts = rng.uniform([-30, -30, -2.5], [30, 30, 1.0], (N, 3)).astype(np.float32)
    sems = rng.uniform(0, 1, (3, 320, 320, 4)).astype(np.float32)
    valid = rng.random(N) < 0.9

    ours = np.asarray(point_painting(
        jnp.asarray(pts), jnp.asarray(sems), rigs, valid=jnp.asarray(valid)
    ))
    ref = _reference_loop(pts, sems, rigs, valid)
    np.testing.assert_array_equal(ours, ref)

    # sanity: the scene must actually exercise multi-camera overlap and
    # no-camera points, else the override order is untested
    seen = np.zeros(N, np.int32)
    for rig in rigs:
        u, v, z = map(np.asarray, project_to_camera(rig, jnp.asarray(pts)))
        seen += ((z >= 0) & (u >= 0) & (u < 320) & (v >= 0) & (v < 320) & valid)
    assert (seen >= 2).any(), "no overlap region sampled"
    assert (seen == 0).any(), "no unseen points sampled"
    assert np.all(ours[seen == 0] == 0.0)


def test_camera_rig_matches_carla_transform_matrices():
    """CameraRig's hardcoded projection == the reference's carla matrix
    chain (point_painting.py:14-43): cam = R_z(yaw)^-1 (p + lidar - cam),
    image axes (y, -z, x), pinhole K, trunc-toward-zero."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-20, 20, (512, 3)).astype(np.float64)
    for yaw_deg in (-60.0, 0.0, 60.0, 123.0):
        rig = CameraRig.build(yaw_deg)
        # carla.Transform(Location(l)).get_matrix() = [I | l]
        lidar_to_world = np.eye(4)
        lidar_to_world[:3, 3] = [0.0, 0.0, 2.5]
        # carla.Transform(Location(c), Rotation(yaw)).get_inverse_matrix()
        yaw = np.radians(yaw_deg)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
        world_to_cam = np.eye(4)
        world_to_cam[:3, :3] = R.T
        world_to_cam[:3, 3] = -R.T @ np.array([1.4, 0.0, 2.5])

        xyz1 = np.c_[pts, np.ones(len(pts))].T
        cam = (world_to_cam @ (lidar_to_world @ xyz1))[:3]
        cam = np.array([cam[1], -cam[2], cam[0]])
        K = np.identity(3)
        focal = 320 / (2.0 * np.tan(60 * np.pi / 360.0))
        K[0, 0] = K[1, 1] = focal
        K[0, 2] = K[1, 2] = 160.0
        cam_2d = K @ cam
        uf = cam_2d[0] / (1e-5 + cam_2d[2])
        vf = cam_2d[1] / (1e-5 + cam_2d[2])
        u_ref = uf.astype(int)
        v_ref = vf.astype(int)
        z_ref = cam_2d[2].astype(int)

        u, v, z = map(np.asarray, project_to_camera(
            rig, jnp.asarray(pts, jnp.float32)
        ))
        # the module runs f32, this reference f64: trunc-toward-zero can
        # legitimately flip where u/v sit within an f32 ulp of an integer
        # — exclude that measure-zero boundary band from the exact check
        safe = ((np.abs(uf - np.round(uf)) > 1e-3)
                & (np.abs(vf - np.round(vf)) > 1e-3)
                & (np.abs(cam_2d[2] - np.round(cam_2d[2])) > 1e-3)
                # near the camera plane u/v explode and a last-ulp f32
                # depth difference moves them by whole pixels; those
                # points are out-of-bounds/behind in the painting anyway
                & (np.abs(cam_2d[2]) > 0.5))
        assert safe.mean() > 0.5
        np.testing.assert_array_equal(u[safe], u_ref[safe])
        np.testing.assert_array_equal(v[safe], v_ref[safe])
        np.testing.assert_array_equal(z[safe], z_ref[safe])

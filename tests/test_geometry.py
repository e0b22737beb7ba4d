import numpy as np
import jax.numpy as jnp

from lav_tpu.core.geometry import (
    transform_points,
    rotate_points_deg,
    rotate_lidar_deg,
    move_lidar_points,
    latlon_to_xy,
)


def test_transform_points_roundtrip(rng):
    locs = rng.normal(size=(4, 10, 2)).astype(np.float32)
    oris = rng.uniform(-np.pi, np.pi, size=(4,)).astype(np.float32)
    fwd = transform_points(jnp.asarray(locs), jnp.asarray(oris))
    back = transform_points(fwd, jnp.asarray(-oris))
    np.testing.assert_allclose(np.asarray(back), locs, atol=1e-5)


def test_transform_points_oracle():
    # rotating +90deg frame: p=(1,0) -> expressed in rotated frame
    p = jnp.array([[1.0, 0.0]])
    out = np.asarray(transform_points(p, jnp.array(np.pi / 2)))
    # locs @ [[cos, sin], [-sin, cos]] = (cos, sin) for p=(1,0)
    np.testing.assert_allclose(out, [[0.0, 1.0]], atol=1e-6)


def test_rotate_points_deg_about_center():
    pts = jnp.array([[2.0, 1.0]])
    center = jnp.array([1.0, 1.0])
    out = np.asarray(rotate_points_deg(pts, 90.0, center))
    # (1,0) @ [[0,1],[-1,0]] = (0,1) -> +center = (1,2)
    np.testing.assert_allclose(out, [[1.0, 2.0]], atol=1e-6)


def test_rotate_lidar_preserves_extra_channels(rng):
    lidar = rng.normal(size=(20, 6)).astype(np.float32)
    out = np.asarray(rotate_lidar_deg(jnp.asarray(lidar), 37.0))
    np.testing.assert_allclose(out[:, 2:], lidar[:, 2:], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(lidar[:, :2], axis=1),
        atol=1e-4,
    )


def test_move_lidar_points_identity(rng):
    pts = rng.normal(size=(15, 3)).astype(np.float32)
    out = np.asarray(
        move_lidar_points(jnp.asarray(pts), jnp.zeros(2), jnp.array(0.3), jnp.array(0.3))
    )
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_move_lidar_points_translation_only():
    pts = jnp.zeros((1, 3))
    out = np.asarray(
        move_lidar_points(pts, jnp.array([1.0, 0.0]), jnp.array(0.0), jnp.array(0.0))
    )
    np.testing.assert_allclose(out, [[1.0, 0.0, 0.0]], atol=1e-6)


def test_move_lidar_points_numpy_oracle(rng):
    """Against a direct numpy transcription of the EKF re-registration math."""
    pts = rng.normal(size=(30, 3)).astype(np.float64)
    dloc = rng.normal(size=(2,))
    ori0, ori1 = 0.7, -0.4

    d = dloc @ np.array([[np.cos(ori0), -np.sin(ori0)], [np.sin(ori0), np.cos(ori0)]])
    o = ori1 - ori0
    ref = pts @ np.array(
        [[np.cos(o), np.sin(o), 0], [-np.sin(o), np.cos(o), 0], [0, 0, 1]]
    )
    ref[:, :2] += d

    out = np.asarray(
        move_lidar_points(
            jnp.asarray(pts), jnp.asarray(dloc), jnp.array(ori0), jnp.array(ori1)
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_latlon_to_xy():
    x, y = latlon_to_xy(jnp.array(1e-4), jnp.array(2e-4), jnp.array(0.0))
    R = 6371e3
    np.testing.assert_allclose(float(x), R * 1e-4 * np.pi / 180, rtol=1e-6)
    np.testing.assert_allclose(float(y), R * 2e-4 * np.pi / 180, rtol=1e-6)

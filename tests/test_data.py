"""Data layer: synthetic-episode fixtures exercise every dataset family."""

import numpy as np
import pytest

from lav_tpu.config import tiny_config, v2_config
from lav_tpu.data.store import make_synthetic_episode
from lav_tpu.data.datasets import get_dataset
from lav_tpu.data.loader import DataLoader
from lav_tpu.data.transforms import rotate_image, filter_sem

CFG = tiny_config()


@pytest.fixture(scope="module")
def episode():
    return make_synthetic_episode(
        n_frames=12, n_actors=4, n_lidar=128, img_hw=(32, 48),
        bev_hw=(CFG.ny, CFG.nx), with_painted=True, n_seg=4,
    )


def test_episode_accessors(episode):
    assert len(episode) == 12
    assert episode.town == "Town03"
    lidar = episode.access("lidar", 0, 1).reshape(-1, 4)
    assert lidar.shape == (128, 4)
    rgb = episode.load_img("rgb_0", 3)
    assert rgb.shape == (32, 48, 3)
    bev = episode.load_bev(0, channels=[0, 1])
    assert bev.shape == (CFG.ny, CFG.nx, 2)

    ego_locs, ego_oris, ego_bbox, locs, oris, bbox, typs = \
        episode.gather_actors(0, 4, max_pedestrian_radius=100,
                              max_vehicle_radius=100)
    assert ego_locs.shape == (5, 2)
    assert locs.shape[0] >= 1  # ego at least
    np.testing.assert_allclose(locs[0], ego_locs)  # ego in slot 0


def test_bev_dataset(episode):
    ds = get_dataset("bev", CFG, [episode])
    assert len(ds) == 12 - CFG.num_plan
    s = ds[0]
    assert s["bev"].shape == (CFG.ny, CFG.nx, 5)
    assert s["ego_locs"].shape == (CFG.num_plan + 1, 2)
    assert s["locs"].shape == (CFG.max_objs, CFG.num_plan + 1, 2)
    assert s["typs"].shape == (CFG.max_objs,)
    assert set(np.unique(s["bev"])) <= {0.0, 1.0}
    # ego-frame normalization: slot 0 of ego_locs is the (negated) origin
    np.testing.assert_allclose(np.abs(s["ego_locs"][0]),
                               np.abs(s["ego_locs"][0]) * 0 +
                               np.abs(s["ego_locs"][0]), atol=20)


def test_lidar_painted_dataset(episode):
    ds = get_dataset("lidar_painted", CFG, [episode])
    s = ds[1]
    n_sem = len(CFG.seg_channels)
    assert s["lidar"].shape == (CFG.max_lidar_points, 4 + n_sem)
    assert s["lidar_valid"].sum() > 0
    assert s["heatmaps"].shape == (2, CFG.ny, CFG.nx)
    assert np.isfinite(s["heatmaps"]).all()
    assert s["heatmaps"].max() <= 1.0 + 1e-6


def test_temporal_lidar_painted_dataset(episode):
    cfg = CFG.replace(num_frame_stack=2, stack_loc_jitter=0.1,
                      stack_ori_jitter=0.05, max_mot_vehicle_radius=8.0)
    ds = get_dataset("temporal_lidar_painted", cfg, [episode])
    s = ds[3]
    n_sem = len(cfg.seg_channels)
    D = 4 + n_sem + cfg.num_frame_stack + 1
    assert s["lidar"].shape == (cfg.max_lidar_points, D)
    # age one-hots: each valid point has exactly one age flag
    v = s["lidar"][s["lidar_valid"]]
    ages = v[:, 4 + n_sem:]
    np.testing.assert_allclose(ages.sum(-1), 1.0)
    assert s["bev"].shape == (cfg.ny, cfg.nx, 3 + 2 * (cfg.num_frame_stack + 1))


def test_seg_and_bra_datasets(episode):
    ds = get_dataset("seg", CFG, [episode])
    assert len(ds) == (12 - CFG.num_plan) * 5
    s = ds[2]
    assert s["rgb"].shape == (32, 48, 3)
    assert s["sem"].max() <= len(CFG.seg_channels)

    cfg = CFG.replace(crop_tel_bottom=8)
    dsb = get_dataset("bra", cfg, [episode])
    b = dsb[0]
    assert b["rgb"].shape == (32, 48 * 3, 3)
    assert b["tel_rgb"].shape[0] == 32 - 8
    assert b["bra"] in (0, 1)


def test_point_paint_roundtrip(episode):
    ds = get_dataset("point_paint", CFG, [episode])
    s = ds[0]
    painted = np.random.default_rng(0).uniform(
        size=(s["lidar"].shape[0], 4)
    ).astype(np.float32)
    ds.commit(0, painted)
    back = episode.access("lidar_sem", ds.frames[0][1], 1).reshape(-1, 4)
    np.testing.assert_allclose(back, painted)


def test_loader_batches(episode):
    ds = get_dataset("bev", CFG, [episode])
    dl = DataLoader(ds, batch_size=4, shuffle=True)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["bev"].shape == (4, CFG.ny, CFG.nx, 5)
    assert b["cmds"].shape == (4,)


def test_temporal_bev_dataset(episode):
    cfg = CFG.replace(num_frame_stack=2)
    ds = get_dataset("temporal_bev", cfg, [episode])
    s = ds[4]
    C = 3 + 2 * (cfg.num_frame_stack + 1)
    assert s["bev"].shape == (cfg.ny, cfg.nx, C)
    assert set(np.unique(s["bev"])) <= {0.0, 1.0}
    assert s["ego_locs"].shape == (cfg.num_plan + 1, 2)


def test_config_agent_overrides():
    from lav_tpu.config import v1_config, v2_config

    v1, v2 = v1_config(), v2_config()
    assert v1.brake_net_thresh == 0.3 and v2.brake_net_thresh == 0.1
    assert v1.collide_dist_moving == 2.0 and v2.collide_dist_moving == 2.5
    assert v2.num_input == 4 + 4 + 3 + 5  # xyzr + painted + age + decoration
    assert v1.num_input == 4 + 4 + 5
    assert v2.bev_input_channels == 9 and v1.bev_input_channels == 5


def test_rotate_image_identity_and_90(rng):
    img = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    out = rotate_image(img, 0.0, center=(8, 8))
    np.testing.assert_allclose(out, img, atol=1e-4)
    # 4 x 90deg = identity (interior pixels)
    out = img
    for _ in range(4):
        out = rotate_image(out, 90.0, center=(7.5, 7.5))
    np.testing.assert_allclose(out[4:-4, 4:-4], img[4:-4, 4:-4], atol=1e-3)


def test_filter_sem():
    sem = np.array([[0, 4, 6], [7, 10, 3]], np.uint8)
    out = filter_sem(sem, [4, 6, 7, 10])
    np.testing.assert_array_equal(out, [[0, 1, 2], [3, 4, 0]])

"""Observability: logger sinks, figure panels, visualization, profiling."""

import json
import os

import numpy as np

from lav_tpu.utils.logging import Logger
from lav_tpu.utils.figures import (
    bev_panel, det_panel, seg_panel, bra_panel, point_histogram_panel,
)
from lav_tpu.utils.visualization import (
    lidar_to_bev, visualize_semantic, visualize_agent_tick,
)
from lav_tpu.utils.profiling import StepTimer


def test_logger_jsonl_and_arrays(tmp_path):
    lg = Logger("test_proj", save_dir=str(tmp_path))
    rec = lg.log(0, dict(loss=1.5, acc=np.float32(0.25),
                         img=np.zeros((4, 4))))
    lg.log(100, dict(loss=1.0))
    lg.close()
    lines = open(os.path.join(lg.save_dir, "metrics.jsonl")).readlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["loss"] == 1.5
    assert os.path.exists(os.path.join(lg.save_dir, "diag_00000000.npz"))


def test_figure_panels(rng):
    img = bev_panel(
        rng.uniform(size=(64, 64)),
        ego_plan_locs=rng.normal(size=(10, 2)),
        ego_cast_locs=rng.normal(size=(6, 10, 2)),
        nxp=np.array([1.0, 2.0]),
        center=(32, 56),
    )
    assert img.ndim == 3 and img.shape[-1] == 3

    dets = dict(
        x=np.array([20, 40]), y=np.array([20, 30]), w=np.array([4.0, 3.0]),
        h=np.array([8.0, 6.0]), cos=np.array([1.0, 0.7]),
        sin=np.array([0.0, 0.7]), valid=np.array([True, False]),
    )
    img = det_panel(rng.uniform(size=(64, 64)), dets, dets)
    assert img.shape[-1] == 3

    img = seg_panel(
        rng.uniform(0, 255, size=(32, 32, 3)),
        rng.integers(0, 5, size=(32, 32)),
        rng.integers(0, 5, size=(32, 32)),
        labels=[4, 6, 7, 10],
    )
    assert img.shape[-1] == 3

    img = bra_panel(rng.uniform(0, 255, (32, 96, 3)),
                    rng.uniform(0, 255, (32, 48, 3)), 1.0, 0.73)
    assert img.shape[-1] == 3

    assert point_histogram_panel(rng.integers(0, 1000, 64)).shape[-1] == 3


def test_visualization_helpers(rng):
    pts = rng.uniform(-30, 60, size=(500, 2))
    bev = lidar_to_bev(pts)
    assert bev.shape == (320, 320)
    assert bev.dtype == np.uint8

    sem = visualize_semantic(rng.integers(0, 5, (16, 16)), labels=[4, 6, 7, 10])
    assert sem.shape == (16, 16, 3)

    canvas = visualize_agent_tick(
        pts, rng.normal(size=(10, 2)), rng.normal(size=(3, 6, 10, 2)),
        rng.uniform(size=(3, 6)), np.array([True, True, False]),
        np.array([5.0, 2.0]),
    )
    assert canvas.shape == (320, 320, 3)


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        t.stop()
    stats = t.stats()
    assert stats["steps_per_sec"] > 0
    assert set(stats) == {"mean_s", "p50_s", "p90_s", "steps_per_sec"}

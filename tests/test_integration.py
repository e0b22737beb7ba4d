"""End-to-end wiring tests: train loop, paint job, replay env, routes."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config
from lav_tpu.data.store import make_synthetic_episode


@pytest.fixture(scope="module")
def episode():
    return make_synthetic_episode(
        n_frames=12, n_actors=3, n_lidar=128, img_hw=(32, 48),
        bev_hw=(tiny_config().ny, tiny_config().nx), with_painted=True,
    )


def test_train_loop_bev_one_epoch(tmp_path, episode):
    """Drive the actual CLI train loop (loader, sharding, logging, step,
    checkpointing) for one tiny epoch."""
    import argparse
    import optax
    from lav_tpu.train.cli import _train_loop
    from lav_tpu.train.privileged import make_bev_train_step
    from lav_tpu.data.datasets import get_dataset
    from lav_tpu.models.planner import bev_planner_init

    cfg = tiny_config()
    ds = get_dataset("bev", cfg, [episode])
    params = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    step = make_bev_train_step(cfg, opt, v2=False)
    # bs must divide the 8-device test mesh (a bs=4/8-device run once
    # trained zero steps silently; it now fails loudly — see below)
    args = argparse.Namespace(
        batch_size=8, num_epoch=1, seed=0, num_per_log=1, num_per_save=1,
        save_dir=str(tmp_path), log_wandb=False, resume=None,
    )
    out = _train_loop("bev", cfg, args, params, step, ds, opt,
                      dict(bs=8, epochs=1), v2_extra_arg=True)
    assert out is not None
    # checkpoint written
    runs = [p for p in (tmp_path / "bev").rglob("*") if "bev_1" in str(p)]
    assert runs, list((tmp_path / "bev").rglob("*"))
    # at least one step actually trained and was logged
    metrics = (tmp_path / "bev" / "metrics.jsonl").read_text().strip()
    assert metrics, "no steps were logged — loop silently trained nothing"
    assert "loss" in json.loads(metrics.splitlines()[0])


def test_train_loop_rejects_indivisible_batch(tmp_path, episode):
    """bs not divisible by the mesh must fail loudly, not train 0 steps."""
    import argparse
    import optax
    from lav_tpu.train.cli import _train_loop
    from lav_tpu.train.privileged import make_bev_train_step
    from lav_tpu.data.datasets import get_dataset
    from lav_tpu.models.planner import bev_planner_init

    cfg = tiny_config()
    ds = get_dataset("bev", cfg, [episode])
    params = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    step = make_bev_train_step(cfg, opt, v2=False)
    args = argparse.Namespace(
        batch_size=3, num_epoch=1, seed=0, num_per_log=1, num_per_save=1,
        save_dir=str(tmp_path), log_wandb=False, resume=None,
    )
    with pytest.raises(ValueError, match="not divisible"):
        _train_loop("bev", cfg, args, params, step, ds, opt,
                    dict(bs=3, epochs=1), v2_extra_arg=True)


def test_loader_propagates_producer_exceptions(episode):
    """A crash in the prefetch thread must surface, not end the epoch."""
    from lav_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise KeyError(f"boom {i}")

    with pytest.raises(RuntimeError, match="producer thread failed"):
        list(DataLoader(Broken(), batch_size=2, shuffle=False))


def test_paint_job_commits_semantics(episode):
    from lav_tpu.train.paint import run_paint
    from lav_tpu.models.rgb import seg_model_init

    cfg = tiny_config()
    seg_params = seg_model_init(jax.random.key(1), len(cfg.seg_channels))
    n = run_paint(cfg, seg_params, [episode], max_points=128,
                  rgb_hw=(32, 48))
    assert n > 0
    sem = episode.access("lidar_sem", 0, 1).reshape(-1, len(cfg.seg_channels))
    assert sem.shape[0] == 128
    assert np.isfinite(sem).all()


def test_replay_env_and_global_plan(episode):
    from lav_tpu.agent.env import ReplayEnv
    from lav_tpu.agent.route import Waypointer, RoutePlanner

    cfg = tiny_config()
    env = ReplayEnv(episode, cfg, max_points=128, n_cams=3)
    frames = list(f for _, f in zip(range(3), env.frames()))
    f = frames[0]
    assert f["lidar"].shape == (128, 4)
    assert f["rgbs"].shape[0] == 3
    assert np.isfinite(f["gps"]).all()

    plan = env.global_plan()
    wp = Waypointer(plan, np.array([*plan[0][0].values(), 0.0]))
    dx, dy, cmd = wp.tick(np.array([*plan[0][0].values(), 0.0]))
    assert np.isfinite([dx, dy]).all()

    rp = RoutePlanner(plan)
    vec = rp.run_step(np.array([*plan[0][0].values()]))
    assert vec.shape == (2,)


def test_route_xml_parsing_assets():
    path = "/root/reference/assets/routes_lav_valid.xml"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    from lav_tpu.agent.routes import parse_routes, route_to_global_plan

    routes = parse_routes(path)
    assert len(routes) == 16
    plan = route_to_global_plan(routes[0])
    assert len(plan) == len(routes[0]["waypoints"])
    assert all("lat" in g for g, _ in plan)


def test_load_config_from_yaml(tmp_path):
    from lav_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(
        "num_plan: 20\nnum_frame_stack: 2\nmin_x: -10\nmax_x: 70\n"
        "pixels_per_meter: 4\nunknown_key_ignored: 42\n"
    )
    cfg = load_config(str(p))
    assert cfg.num_plan == 20
    assert cfg.nx == 320
    assert cfg.bev_input_channels == 9


def test_agent_export_roundtrip(rng):
    """jax.export serialization of the fused step (TorchScript analog)."""
    from lav_tpu.agent.export import export_agent_step, load_agent_step
    from tests.test_agent import _params, _obs, IMG_HW

    cfg = tiny_config()
    params = _params(cfg)
    blob = export_agent_step(cfg, params, max_points=128, rgb_hw=IMG_HW,
                             tel_hw=IMG_HW)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    from lav_tpu.agent.agent import build_agent
    init_state, _ = build_agent(cfg, max_points=128, rgb_hw=IMG_HW)
    state = init_state()
    obs = _obs(rng, state.prev_lidar.shape[0], 0)
    obs["rgbs"] = obs["rgbs"]
    obs["tel_rgb"] = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (*IMG_HW, 3)).astype(np.float32)
    )
    fn = load_agent_step(blob)
    ctrl, new_state, aux = fn(state, obs)
    assert np.isfinite(float(ctrl.steer))


def test_agent_export_serving_config(rng):
    """Export the SERVING configuration (int8 MXU stacks baked in) and run
    a tick through the deserialized artifact."""
    from lav_tpu.agent.export import export_agent_step, load_agent_step
    from tests.test_agent import _params, _obs, IMG_HW

    cfg = tiny_config()
    params = _params(cfg)
    blob = export_agent_step(cfg, params, max_points=128, rgb_hw=IMG_HW,
                             tel_hw=IMG_HW, quant_int8=True)
    from lav_tpu.agent.agent import build_agent
    init_state, _ = build_agent(cfg, max_points=128, rgb_hw=IMG_HW)
    state = init_state()
    obs = _obs(rng, state.prev_lidar.shape[0], 0)
    obs["tel_rgb"] = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (*IMG_HW, 3)).astype(np.float32)
    )
    ctrl, new_state, aux = load_agent_step(blob)(state, obs)
    assert np.isfinite(float(ctrl.steer))
    assert 0.0 <= float(ctrl.throttle) <= 1.0

"""Golden regression tests: fixed-seed outputs of the flagship forward
paths, pinned to committed .npz files (CPU, f32).

Regenerate intentionally with:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = bool(os.environ.get("REGEN_GOLDEN"))

CFG = tiny_config()


def _check(name, arrays: dict):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **arrays)
        pytest.skip(f"golden {name} (re)generated")
    if not os.path.exists(path):
        # a missing golden is a FAILURE, not a silent re-pin: deleting or
        # renaming a golden must never quietly adopt current behavior
        pytest.fail(
            f"golden file {path} missing — regenerate deliberately with "
            f"REGEN_GOLDEN=1 if the change is intended"
        )
    ref = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            v, ref[k], atol=1e-4, rtol=1e-3,
            err_msg=f"{name}/{k} drifted from golden",
        )


def test_golden_lidar_model(rng):
    from lav_tpu.models.lidar import lidar_model_init, lidar_model_apply

    cfg = CFG
    params = lidar_model_init(jax.random.key(11), cfg.num_input,
                              cfg.num_features)
    pts = jnp.asarray(
        np.random.default_rng(7).uniform(
            -5, 10, (1, 96, cfg.num_input - 5)
        ).astype(np.float32)
    )
    feats, hm, size, ori, bev, _ = lidar_model_apply(
        params, pts, jnp.ones((1, 96), bool), train=False,
        min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y, max_y=cfg.max_y,
        pixels_per_meter=cfg.pixels_per_meter, num_features=cfg.num_features,
    )
    _check("lidar_model", dict(
        feats_slice=feats[0, :4, :4], hm_slice=hm[0, :, :6, :6],
        bev_mean=bev.mean(axis=(2, 3)),
    ))


def test_golden_bev_planner(rng):
    from lav_tpu.models.planner import bev_planner_init, bev_planner_infer

    cfg = CFG
    params = bev_planner_init(jax.random.key(12), cfg)
    bev = jnp.asarray(
        np.random.default_rng(8).uniform(0, 1, (1, cfg.ny, cfg.nx, 5))
        .astype(np.float32)
    )
    plan, cast_locs, cmds = bev_planner_infer(
        params, cfg, bev, jnp.asarray([[4.0, 1.0]])
    )
    _check("bev_planner_infer", dict(
        plan=plan[0, -1], cast=cast_locs[0], cmds=cmds[0],
    ))


def test_golden_agent_controls(rng):
    from lav_tpu.agent.agent import build_agent
    from tests.test_agent import _params, _obs, IMG_HW

    cfg = CFG
    init_state, step = build_agent(cfg, rgb_hw=IMG_HW)
    params = _params(cfg)
    state = init_state()
    P = state.prev_lidar.shape[0]
    jstep = jax.jit(step)
    outs = []
    for t in range(3):
        ctrl, state, aux = jstep(
            params, state, _obs(np.random.default_rng(t), P, t)
        )
        outs.append([ctrl.steer, ctrl.throttle, ctrl.brake])
    _check("agent_controls", dict(
        controls=np.asarray(outs, np.float32),
        plan=np.asarray(aux["plan_locs"]),
        ekf=np.asarray(state.ekf.x),
    ))

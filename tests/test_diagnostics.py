"""Train-time inference probes produce finite, fixed-shape diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config
from lav_tpu.train.diagnostics import make_bev_probe, make_lidar_probe
from lav_tpu.models.lidar import lidar_model_init
from lav_tpu.models.planner import bev_planner_init, uniplanner_init


def test_lidar_probe(rng):
    cfg = tiny_config()
    ks = jax.random.split(jax.random.key(0), 2)
    params = {
        "lidar_model": lidar_model_init(ks[0], cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(ks[1], cfg),
    }
    probe = make_lidar_probe(cfg)
    out = probe(
        params,
        jnp.asarray(rng.uniform(-4, 10, (96, cfg.num_input - 5)).astype(np.float32)),
        jnp.ones(96, bool), jnp.int32(3), jnp.zeros(2),
    )
    assert out["ego_plan_locs"].shape == (cfg.num_plan, 2)
    assert out["pred_bev"].shape == (3, cfg.ny, cfg.nx)
    assert out["dets"]["x"].shape == (2, cfg.max_det)
    assert np.isfinite(np.asarray(out["ego_plan_locs"])).all()


def test_bev_probe(rng):
    cfg = tiny_config()
    probe = make_bev_probe(cfg)
    out = probe(
        bev_planner_init(jax.random.key(1), cfg),
        jnp.asarray(rng.uniform(0, 1, (cfg.ny, cfg.nx, 5)).astype(np.float32)),
        jnp.asarray([3.0, 1.0]),
    )
    assert out["ego_plan_locs"].shape == (cfg.num_cmds, cfg.num_plan, 2)
    assert out["ego_cast_cmds"].shape == (cfg.num_cmds,)
    assert 0.0 <= float(out["ego_cast_cmds"].min())

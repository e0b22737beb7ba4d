"""Replay evaluation scoring: expert agreement + results.json schema.

The reference protocol writes leaderboard results.json
(/root/reference/docs/INSTALL.md:36-41); this pins our simulator-free
replay scorer to that shape.
"""

import math

import numpy as np
import pytest
import jax

from lav_tpu.config import tiny_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.agent.demo import build_params
from lav_tpu.agent.env import ReplayEnv
from lav_tpu.agent.evaluate import (
    _expert_future_plan_frame, evaluate_episode, make_results_json,
)
from lav_tpu.data.store import make_synthetic_episode

CFG = tiny_config()
IMG_HW = (32, 32)
MAX_PTS = 256


@pytest.fixture(scope="module")
def episode_record():
    ticks = 8
    ep = make_synthetic_episode(
        n_frames=ticks + CFG.num_plan + 1, n_lidar=MAX_PTS, img_hw=IMG_HW,
        bev_hw=(CFG.ny, CFG.nx), seed=0,
    )
    env = ReplayEnv(ep, CFG, max_points=MAX_PTS)
    init_state, step_fn = build_agent(CFG, max_points=MAX_PTS, rgb_hw=IMG_HW)
    params = build_params(CFG)
    rec = evaluate_episode(
        CFG, params, env, jax.jit(step_fn), init_state, ticks
    )
    return ep, rec


def test_expert_future_plan_frame_geometry():
    """Straight drive at heading `ori` -> expert future is straight-ahead in
    the plan frame: x ~ -dist (the dataset's `-ego_locs` negation), y ~ 0
    up to the frame convention of transform_points."""
    ep = make_synthetic_episode(n_frames=CFG.num_plan + 3, seed=1)
    fut = _expert_future_plan_frame(ep, 0, CFG.num_plan)
    assert fut.shape == (CFG.num_plan, 2)
    dists = np.linalg.norm(fut, axis=-1)
    # synthetic ego drives 0.4 m/frame in a straight line
    np.testing.assert_allclose(
        dists, 0.4 * np.arange(1, CFG.num_plan + 1), atol=1e-4
    )
    # straight drive: the ego-frame future is colinear
    crosses = np.abs(np.cross(fut[:-1], fut[1:]))
    assert (crosses < 1e-4).all()


def test_evaluate_episode_scores(episode_record):
    _, rec = episode_record
    assert rec["ticks"] == 8
    assert rec["expert_plan_l2"] is not None and np.isfinite(
        rec["expert_plan_l2"]
    )
    assert rec["brake_agreement"] is not None
    assert 0.0 <= rec["brake_agreement"] <= 1.0


def test_results_json_schema(episode_record):
    _, rec = episode_record
    results = make_results_json([rec])

    assert set(results) == {"_checkpoint", "values", "labels"}
    assert results["labels"] == [
        "Avg. driving score", "Avg. route completion",
        "Avg. infraction penalty",
    ]
    ckpt = results["_checkpoint"]
    assert {"records", "global_record"} <= set(ckpt)
    r = ckpt["records"][0]
    assert {"route_id", "index", "status", "infractions", "scores",
            "meta"} <= set(r)
    assert {"score_route", "score_penalty", "score_composite"} == set(
        r["scores"]
    )
    for k in ("collisions_pedestrian", "collisions_vehicle", "red_light",
              "stop_infraction", "route_dev", "vehicle_blocked"):
        assert k in r["infractions"]
    # composite = route * penalty
    sc = r["scores"]
    assert math.isclose(
        sc["score_composite"], sc["score_route"] * sc["score_penalty"],
        rel_tol=1e-2,
    )
    assert ckpt["global_record"]["scores"]["score_composite"] == \
        results["values"][0]


def test_evaluate_batched_early_exhaustion_keeps_stats():
    """Episodes shorter than max_ticks must still yield the latency /
    ego_steps_per_sec keys (round-2 weak 3: the early return used to drop
    the headline metric)."""
    from lav_tpu.agent.evaluate import evaluate_batched

    ticks = 6
    envs = []
    for s in range(2):
        ep = make_synthetic_episode(
            n_frames=ticks + CFG.num_plan + 1, n_lidar=MAX_PTS,
            img_hw=IMG_HW, bev_hw=(CFG.ny, CFG.nx), seed=10 + s,
        )
        envs.append(ReplayEnv(ep, CFG, max_points=MAX_PTS))
    init_state, step_fn = build_agent(CFG, max_points=MAX_PTS, rgb_hw=IMG_HW)
    params = build_params(CFG)
    # max_ticks far beyond the episodes' length -> exhaustion path
    stats = evaluate_batched(CFG, params, envs, step_fn, init_state,
                             max_ticks=500)
    assert 0 < stats["ticks"] <= 2 * (ticks + CFG.num_plan + 1)
    assert "latency" in stats and stats["latency"], stats
    assert "ego_steps_per_sec" in stats, stats

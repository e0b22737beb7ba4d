"""Hermetic closed-loop evaluation over replayed episodes.

The reference's integration test is a live CARLA leaderboard run writing
results.json (docs/INSTALL.md:36-41).  This evaluator replays recorded
episodes through the fused agent and scores agreement with the recorded
expert drive — a simulator-free regression protocol (plus per-tick latency),
writing a results.json-compatible summary.

    python -m lav_tpu.agent.evaluate --episodes 2 --ticks 40 --tiny
"""

from __future__ import annotations

import argparse
import json
import math

import numpy as np

import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config, v1_config, v2_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.agent.demo import build_params
from lav_tpu.agent.env import ReplayEnv
from lav_tpu.data.store import make_synthetic_episode
from lav_tpu.utils.profiling import StepTimer


def evaluate_episode(cfg, params, env: ReplayEnv, step, init_state,
                     max_ticks: int):
    state = init_state()
    timer = StepTimer(warmup=2)
    stats = dict(ticks=0, brakes=0, collides=0, nan_controls=0,
                 steer_abs_sum=0.0, throttle_sum=0.0)
    for t, obs in enumerate(env.frames()):
        if t >= max_ticks:
            break
        obs = jax.tree.map(jnp.asarray, obs)
        timer.start()
        ctrl, state, aux = step(params, state, obs)
        timer.stop(ctrl)
        s, th, b = map(float, (ctrl.steer, ctrl.throttle, ctrl.brake))
        stats["ticks"] += 1
        stats["brakes"] += int(b > 0.5)
        stats["collides"] += int(bool(aux["collide"]))
        stats["nan_controls"] += int(not np.isfinite([s, th, b]).all())
        stats["steer_abs_sum"] += abs(s)
        stats["throttle_sum"] += th
    stats["latency"] = timer.stats()
    return stats


def evaluate_batched(cfg, params, envs, step_fn, init_state, max_ticks: int):
    """Batched multi-ego evaluation: all episodes advance in lockstep
    through ONE vmapped device step (the BASELINE.md headline pattern)."""
    n = len(envs)
    iters = [env.frames() for env in envs]
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[init_state() for _ in range(n)]
    )
    vstep = jax.jit(jax.vmap(step_fn, in_axes=(None, 0, 0)))
    timer = StepTimer(warmup=2)
    stats = dict(ticks=0, nan_controls=0, brakes=0)
    for t in range(max_ticks):
        obs_list = []
        for it in iters:
            try:
                obs_list.append(next(it))
            except StopIteration:
                return stats
        obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
        timer.start()
        ctrl, states, aux = vstep(params, states, obs)
        timer.stop(ctrl)
        c = np.stack([np.asarray(ctrl.steer), np.asarray(ctrl.throttle),
                      np.asarray(ctrl.brake)])
        stats["ticks"] += n
        stats["nan_controls"] += int((~np.isfinite(c)).sum())
        stats["brakes"] += int((np.asarray(ctrl.brake) > 0.5).sum())
    stats["latency"] = timer.stats()
    if stats["latency"]:
        stats["ego_steps_per_sec"] = round(
            stats["latency"]["steps_per_sec"] * n, 2
        )
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--ticks", type=int, default=40)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--v2", action="store_true")
    p.add_argument("--num-ego", type=int, default=0,
                   help="batched multi-ego evaluation with N lockstep egos")
    p.add_argument("--max-points", type=int, default=2048)
    p.add_argument("--out", default="results.json")
    args = p.parse_args()

    cfg = (tiny_config() if args.tiny
           else v2_config() if args.v2 else v1_config())
    img_hw = (32, 32) if args.tiny else (288, 256)

    init_state, step_fn = build_agent(cfg, max_points=args.max_points,
                                      rgb_hw=img_hw)
    params = build_params(cfg)
    step = jax.jit(step_fn)

    if args.num_ego:
        envs = [
            ReplayEnv(
                make_synthetic_episode(
                    n_frames=args.ticks + cfg.num_plan + 1,
                    n_lidar=args.max_points, img_hw=img_hw,
                    bev_hw=(cfg.ny, cfg.nx), seed=e,
                ),
                cfg, max_points=args.max_points,
            )
            for e in range(args.num_ego)
        ]
        rec = evaluate_batched(cfg, params, envs, step_fn, init_state,
                               args.ticks)
        print(json.dumps(rec))
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
        return

    records = []
    for e in range(args.episodes):
        ep = make_synthetic_episode(
            n_frames=args.ticks + cfg.num_plan + 1,
            n_lidar=args.max_points, img_hw=img_hw,
            bev_hw=(cfg.ny, cfg.nx), seed=e,
        )
        env = ReplayEnv(ep, cfg, max_points=args.max_points)
        rec = evaluate_episode(cfg, params, env, step, init_state, args.ticks)
        rec["episode"] = e
        records.append(rec)
        print(f"episode {e}: {rec}")

    summary = {
        "records": records,
        "total_ticks": sum(r["ticks"] for r in records),
        "nan_controls": sum(r["nan_controls"] for r in records),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

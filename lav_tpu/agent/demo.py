"""Closed-loop demo: run the fused agent on a replayed (or synthetic)
episode and report control statistics + per-tick latency.

    python -m lav_tpu.agent.demo --ticks 20 --v2
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config, v1_config, v2_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.agent.env import ReplayEnv
from lav_tpu.data.store import make_synthetic_episode
from lav_tpu.models.lidar import lidar_model_init
from lav_tpu.models.planner import uniplanner_init
from lav_tpu.models.rgb import brake_model_init, seg_model_init
from lav_tpu.utils.profiling import StepTimer


def build_params(cfg, seed: int = 0, eval_priors: bool = False):
    """Random demo/eval weights.

    eval_priors: two documented synthetic-weight priors that make the
    UNTRAINED agent behaviorally scoreable in the replay eval (a trained
    checkpoint needs neither):
      * calm brake head (w*0.1, b-3 -> p~0.05): an untrained classifier
        outputs ~sigmoid(noise) and hard-brakes on ~half the ticks,
        drowning the collision-forecast behavior;
      * forward plan prior (cast delta-head bias y=-0.5, plan frame ahead
        is -y): an untrained cast/plan GRU emits a near-stationary plan
        (mean step < 0.2 m), so pid_control reads desired_speed ~ 0 and
        brakes on EVERY tick (control.py:37, brake_speed=0.2).
    """
    ks = jax.random.split(jax.random.key(seed), 4)
    p = {
        "lidar_model": lidar_model_init(ks[0], cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(ks[1], cfg),
        "seg_model": seg_model_init(ks[2], len(cfg.seg_channels)),
        "bra_model": brake_model_init(
            ks[3], 3, version=2 if cfg.num_frame_stack > 0 else 1
        ),
    }
    if eval_priors:
        cls = dict(p["bra_model"]["classifier"])
        cls["w"] = cls["w"] * 0.1
        cls["b"] = cls["b"] - 3.0
        p["bra_model"] = dict(p["bra_model"], classifier=cls)

        def forward_prior(node):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if k in ("cast_mlps", "plan_mlp") and isinstance(v, dict):
                        b = v["b"]
                        out[k] = dict(v, b=b.at[..., 1].set(-0.5))
                    else:
                        out[k] = forward_prior(v)
                return out
            return node

        p["uniplanner"] = forward_prior(p["uniplanner"])
    return p


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=20)
    p.add_argument("--v2", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max-points", type=int, default=2048)
    p.add_argument("--viz", default=None,
                   help="directory to write per-tick BEV canvases (PNG)")
    args = p.parse_args()

    cfg = (tiny_config() if args.tiny
           else v2_config() if args.v2 else v1_config())
    img_hw = (32, 32) if args.tiny else (288, 256)

    ep = make_synthetic_episode(
        n_frames=max(args.ticks + cfg.num_plan + 1, 16),
        n_lidar=args.max_points, img_hw=img_hw,
        bev_hw=(cfg.ny, cfg.nx),
    )
    env = ReplayEnv(ep, cfg, max_points=args.max_points)

    init_state, step = build_agent(cfg, max_points=args.max_points,
                                   rgb_hw=img_hw)
    params = build_params(cfg)
    state = init_state()
    jstep = jax.jit(step)

    timer = StepTimer(warmup=2)
    controls = []
    for t, obs in enumerate(env.frames()):
        if t >= args.ticks:
            break
        obs = jax.tree.map(jnp.asarray, obs)
        timer.start()
        ctrl, state, aux = jstep(params, state, obs)
        dt = timer.stop(ctrl)
        controls.append([float(ctrl.steer), float(ctrl.throttle),
                         float(ctrl.brake)])
        print(f"tick {t:3d}: steer={controls[-1][0]:+.3f} "
              f"throttle={controls[-1][1]:.3f} brake={controls[-1][2]:.0f} "
              f"({dt * 1000:.1f} ms)")
        if args.viz:
            import os
            from PIL import Image
            from lav_tpu.utils.visualization import visualize_agent_tick

            os.makedirs(args.viz, exist_ok=True)
            canvas = visualize_agent_tick(
                np.asarray(obs["lidar"][:, :2]),
                np.asarray(aux["plan_locs"]),
                np.asarray(aux["other_cast_locs"]),
                np.asarray(aux["other_cast_cmds"]),
                np.asarray(aux["other_valid"]),
                np.asarray(aux["nxp"]),
                pixels_per_meter=cfg.pixels_per_meter,
                cmd_thresh=cfg.cmd_thresh,
                min_x=int(cfg.min_x), max_x=int(cfg.max_x),
                min_y=int(cfg.min_y), max_y=int(cfg.max_y),
            )
            Image.fromarray(canvas).save(
                os.path.join(args.viz, f"tick_{t:04d}.png")
            )

    c = np.asarray(controls)
    assert np.isfinite(c).all(), "non-finite control emitted"
    print("latency:", {k: round(v, 4) for k, v in timer.stats().items()})


if __name__ == "__main__":
    main()

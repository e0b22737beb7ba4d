"""Skip-ablation of the COMPILED full agent tick: time the whole graph with
one stage dummied out at a time — attributes cost including scheduling
effects the standalone ablation misses.

    python -m lav_tpu.utils.bench_skip
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run_variant(skip, num_ego, max_points, iters=8):
    from lav_tpu.config import v2_config
    from lav_tpu.agent.agent import build_agent

    from lav_tpu.models.lidar import lidar_model_init
    from lav_tpu.models.planner import uniplanner_init
    from lav_tpu.models.rgb import seg_model_init, brake_model_init

    cfg = v2_config()
    init_state, step = build_agent(
        cfg, max_points=max_points, compute_dtype=jnp.bfloat16, skip=skip
    )
    ks = jax.random.split(jax.random.key(0), 4)
    params = {
        "lidar_model": lidar_model_init(ks[0], cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(ks[1], cfg),
        "seg_model": seg_model_init(ks[2], len(cfg.seg_channels)),
        "bra_model": brake_model_init(ks[3], 3, version=2),
    }
    rng = np.random.default_rng(0)
    state = init_state()
    P = state.prev_lidar.shape[0]
    obs = dict(
        lidar=jnp.asarray(rng.uniform(-20, 40, (P, 4)).astype(np.float32)),
        lidar_valid=jnp.ones((P,), bool),
        rgbs=jnp.asarray(rng.uniform(0, 255, (3, 288, 256, 3)).astype(np.float32)),
        tel_rgb=jnp.asarray(rng.uniform(0, 255, (192, 480, 3)).astype(np.float32)),
        gps=jnp.array([1e-4, 2e-4]), compass=jnp.array(0.1),
        speed=jnp.array(4.0), cmd=jnp.array(3, jnp.int32),
        target=jnp.array([10.0, 1.0]),
    )
    states = jax.tree.map(lambda x: jnp.stack([x] * num_ego), state)
    obsb = jax.tree.map(lambda x: jnp.stack([x] * num_ego), obs)

    @jax.jit
    def tick(params, states, obs):
        ctrl, new_states, _ = jax.vmap(step, in_axes=(None, 0, 0))(
            params, states, obs
        )
        return ctrl, new_states

    for _ in range(2):
        ctrl, states = tick(params, states, obsb)
    jax.block_until_ready(ctrl)
    t0 = time.perf_counter()
    for _ in range(iters):
        ctrl, states = tick(params, states, obsb)
    jax.block_until_ready(ctrl)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ego", type=int, default=16)
    p.add_argument("--max-points", type=int, default=8192)
    p.add_argument("--variants", default="none,seg,paint,brake,lidar,planner,stack")
    args = p.parse_args()

    results = {}
    for v in args.variants.split(","):
        skip = () if v == "none" else tuple(v.split("+"))
        ms = run_variant(skip, args.num_ego, args.max_points)
        results[f"skip_{v}_ms"] = round(ms, 1)
        print(json.dumps({f"skip_{v}_ms": round(ms, 1)}), flush=True)
    base = results.get("skip_none_ms")
    if base:
        attrib = {
            k.replace("skip_", "").replace("_ms", ""): round(base - v, 1)
            for k, v in results.items() if k != "skip_none_ms"
        }
        print(json.dumps({"full_ms": base, "attributed_ms": attrib}))


if __name__ == "__main__":
    main()

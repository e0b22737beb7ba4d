"""Agent-step profiling: compiled cost analysis + optional device trace.

    python -m lav_tpu.utils.bench_profile            # cost analysis (TPU)
    python -m lav_tpu.utils.bench_profile --trace    # + xprof trace
"""

from __future__ import annotations

import argparse
import json

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", action="store_true")
    p.add_argument("--max-points", type=int, default=8192)
    p.add_argument("--num-ego", type=int, default=16)
    args = p.parse_args()

    from __graft_entry__ import _v2_agent_setup
    import jax.numpy as jnp

    step, params, state, obs = _v2_agent_setup(max_points=args.max_points)
    states = jax.tree.map(lambda x: jnp.stack([x] * args.num_ego), state)
    obsb = jax.tree.map(lambda x: jnp.stack([x] * args.num_ego), obs)
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))

    lowered = vstep.lower(params, states, obsb)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_acc = cost.get("bytes accessed", float("nan"))
    print(json.dumps({
        "num_ego": args.num_ego,
        "gflops_per_tick": round(flops / 1e9, 2),
        "gbytes_per_tick": round(bytes_acc / 1e9, 3),
        "gflops_per_ego_step": round(flops / 1e9 / args.num_ego, 2),
    }))
    try:
        mem = compiled.memory_analysis()
        print(json.dumps({
            "temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
            "argument_mb": round(mem.argument_size_in_bytes / 1e6, 1),
            "output_mb": round(mem.output_size_in_bytes / 1e6, 1),
        }))
    except Exception:
        pass

    if args.trace:
        import time

        from lav_tpu.utils.profiling import trace

        ctrl, states2, _ = vstep(params, states, obsb)
        jax.block_until_ready(ctrl)
        with trace("/tmp/lav_tpu_trace") as d:
            for _ in range(3):
                ctrl, states2, _ = vstep(params, states2, obsb)
            jax.block_until_ready(ctrl)
        print(f"trace written to {d}")


if __name__ == "__main__":
    main()

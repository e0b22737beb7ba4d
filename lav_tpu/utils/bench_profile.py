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
    p.add_argument("--quant", default=None,
                   help="int8 scope as bench.py BENCH_INT8 (e.g. 'mxu')")
    p.add_argument("--dump", default=None,
                   help="write the FULL per-op table (name/ms/kind/src/"
                        "shape) as JSON to this path")
    args = p.parse_args()

    from __graft_entry__ import _v2_agent_setup
    import jax.numpy as jnp


    step, params, state, obs, info = _v2_agent_setup(
        max_points=args.max_points,
        compute_dtype=jnp.bfloat16,
        quant_int8=args.quant or False,
    )
    if args.quant:
        print(f"quant: {info['quant']}")
    # setup builds on host; ship once and stack the ego axis ON DEVICE
    # (host-stacking pushes ~170 MB through the tunnel — see bench.py)
    dev = jax.devices()[0]
    state, obs = jax.device_put((state, obs), dev)
    E = args.num_ego
    state, obs = jax.jit(
        lambda t: jax.tree.map(lambda x: jnp.stack([x] * E), t))((state, obs))
    states, obsb = state, obs
    # match bench.py conditions exactly: bf16 compute + donated state
    # buffers (the ring buffers alias in place)
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)),
                    donate_argnums=(1,))

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
        import re

        from lav_tpu.utils.profiling import trace
        from lav_tpu.utils.roofline import (
            parse_trace, per_class_ms, fusion_kinds_from_hlo,
        )

        # op name -> (inner kind, source file:line) from the compiled HLO,
        # so fusion.94-style trace names become attributable
        hlo = compiled.as_text()
        fk = fusion_kinds_from_hlo(hlo)
        src = {}
        for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?source_file=\"([^\"]+)\""
            r"[^\n]*?source_line=(\d+)", hlo
        ):
            src[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
        # jit scope path (op_name metadata): names the MODULE a fusion
        # belongs to when file:line is ambiguous (layers.py:92 is every
        # conv in the program)
        # output shape from the HLO def line: functional JAX puts no module
        # names in op_name, but shapes identify the net (e.g. the 48-image
        # camera stack vs the 16-canvas backbone)
        scope = {}
        for m in re.finditer(r"%?([\w.\-]+) = (\([^)]*\)|\S+) fusion", hlo):
            scope[m.group(1)] = m.group(2)[:70]

        ctrl, states2, _ = vstep(params, states, obsb)
        jax.block_until_ready(ctrl)
        iters = 4
        with trace("/tmp/lav_tpu_trace") as d:
            for _ in range(iters):
                ctrl, states2, _ = vstep(params, states2, obsb)
            jax.block_until_ready(ctrl)
        durs = parse_trace(d)
        print("per-class ms/tick:",
              json.dumps(per_class_ms(durs, iters, fusion_kinds=fk)))
        print("top ops (ms/tick):")
        for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
            kind = fk.get(name, "")
            where = src.get(name, "")
            print(f"  {us / iters / 1000:8.3f}  {name[:44]:46s}"
                  f" {kind:8s} {where:24s} {scope.get(name, '')}")
        print(f"trace written to {d}")
        if args.dump:
            rows = [
                {"ms": round(us / iters / 1000, 4), "name": name,
                 "kind": fk.get(name, ""), "src": src.get(name, ""),
                 "shape": scope.get(name, "")}
                for name, us in sorted(durs.items(), key=lambda kv: -kv[1])
            ]
            with open(args.dump, "w") as f:
                json.dump(rows, f, indent=0)
            print(f"full table ({len(rows)} ops) -> {args.dump}")


if __name__ == "__main__":
    main()

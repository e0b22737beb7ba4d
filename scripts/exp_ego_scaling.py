"""Ego-scaling refresh: steps/s/chip vs NUM_EGO at the round-5 graph.

Round 2 measured ego scaling beyond 16 and DECLINED it (143.7 steps/s at
32 egos vs 174.9 at 16 — superlinear cost growth, most likely HBM
pressure at the round-2 layouts).  The graph has since been rebuilt
(sorted pillars, blocked-matmul means, int8-mxu, merged heads, OOB-drop
canvas), so the verdict deserves a re-measurement: the launch-bound
classes (1279 inter-fusion copies, 186 elementwise fusions, 49 small
ERFNet convs) amortize with more egos per launch, while the MXU- and
issue-bound classes scale linearly.

Serving-point context (why 16 stays the bench default regardless): the
reference's control loop runs at 20 Hz (`/root/reference/config.yaml:4`,
IMU sensor_tick 0.05), so a chip serving E vmapped egos at T ms/tick
gives each ego a control period of T ms; at 16 egos the measured 52.2 ms
tick sits AT the budget, and any ego count whose tick exceeds ~50 ms
trades real-time control for throughput.  A 32-ego win is therefore an
offline-throughput statement (replay eval, data generation), not a
deployment operating point.

One process, ONE setup + device ship, one compile per ego count
(XLA recompiles per batch shape), pipelined wall-clock timing through
donated state buffers exactly like bench.py (trustworthy through the
tunnel: iterations chain on device).

Run (TPU): python scripts/exp_ego_scaling.py [ego counts...]

MEASURED (v5e, 2026-08-19, 60k-point load): see README "ego scaling"
note / the table printed by this script.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ITERS = 20
WARMUP = 2
MAX_POINTS = 10000


def main():
    egos = [int(a) for a in sys.argv[1:]] or [8, 16, 32]

    from __graft_entry__ import _v2_agent_setup

    step, params, state0, obs0, info = _v2_agent_setup(
        max_points=MAX_POINTS, compute_dtype=jnp.bfloat16,
        quant_int8="mxu", allow_recalibrate=False,
    )
    dev = jax.devices()[0]
    params, state0, obs0 = jax.device_put((params, state0, obs0), dev)
    jax.block_until_ready(state0)
    print(f"setup shipped (quant={info['quant']}, dev={dev.platform})",
          flush=True)

    vstep = jax.vmap(step, in_axes=(None, 0, 0))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def tick(params, states, obs):
        ctrl, new_states, _ = vstep(params, states, obs)
        return ctrl, new_states

    rows = []
    for e in egos:
        stack = jax.jit(
            lambda t, e=e: jax.tree.map(lambda x: jnp.stack([x] * e), t))
        states, obs = stack(state0), stack(obs0)
        for _ in range(WARMUP):
            ctrl, states = tick(params, states, obs)
        jax.block_until_ready(ctrl)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            ctrl, states = tick(params, states, obs)
        jax.block_until_ready(ctrl)
        dt = time.perf_counter() - t0
        sps = e * ITERS / dt
        ms = 1e3 * dt / ITERS
        rows.append((e, sps, ms))
        print(f"egos={e:3d}  {sps:7.2f} steps/s  {ms:6.1f} ms/tick  "
              f"{1e3 / ms:5.2f} Hz/ego"
              + ("  (< 20 Hz control budget)" if ms > 50.0 else ""),
              flush=True)

    base = next((r for r in rows if r[0] == 16), rows[0])
    for e, sps, ms in rows:
        print(f"egos={e:3d}: {sps / base[1]:5.2f}x of the {base[0]}-ego "
              f"serving point", flush=True)


if __name__ == "__main__":
    main()

"""TPU microbench: the pillar scatter wall (VERDICT r3 item 1).

Measures the two hot scatters of the 16-ego agent tick in isolation, at
exactly the agent's shapes, XLA emitter vs the round-3 Pallas kernel
(ops/pillar_pallas2.py).

MEASUREMENT NOTE (hard-won): wall-clock timing of pipelined identical
dispatches through this environment's remote-TPU tunnel is WRONG by up to
500x (identical/chained dispatches coalesce somewhere in the dispatch
layer; per-iteration sync adds ~26 ms RTT).  Only DEVICE TRACE durations
are trustworthy — this script times every variant by tracing N calls with
varying inputs and summing per-op device time (lav_tpu.utils.roofline).

Round-2 reference point: XLA scatter ~15.7 ns per 128-lane update row.
"""
import argparse
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lav_tpu.utils.roofline import parse_trace, per_class_ms  # noqa: E402

S = 320 * 320 + 1
NVAR = 4  # distinct input sets cycled through the trace


def device_ms(fn, argsets, iters=8, label=""):
    """Total device ms/iter from a trace of `iters` calls cycling argsets."""
    import shutil
    import tempfile

    out = jax.block_until_ready(fn(*argsets[0]))
    d = tempfile.mkdtemp(prefix="scat_")
    try:
        jax.profiler.start_trace(d)
        for i in range(iters):
            out = fn(*argsets[i % len(argsets)])
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        classes = per_class_ms(parse_trace(d), iters)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    total = sum(classes.values())
    top = ", ".join(f"{k}={v:.2f}" for k, v in list(classes.items())[:4])
    print(f"{label:34s}: {total:7.2f} ms/iter  [{top}]", flush=True)
    return total


def make_pids(P, B, rng, realistic=True):
    """Azimuth-ordered ground-sweep-like pillar ids (the agent's actual
    distribution: consecutive points land in the same/adjacent cells)."""
    out = []
    for _ in range(B):
        if not realistic:
            out.append(rng.integers(0, S - 1, P))
            continue
        pts = []
        for s in range(3):
            n = P // 3 if s else P - 2 * (P // 3)
            az = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(2, 60, n)  # mixed ground/structure ranges
            x = np.clip(r * np.cos(az), -9.9, 69.9)
            y = np.clip(r * np.sin(az), -39.9, 39.9)
            ix = np.floor((x + 10) * 4).astype(np.int32)
            iy = np.floor((y + 40) * 4).astype(np.int32)
            pts.append((319 - ix) * 320 + iy)
        out.append(np.concatenate(pts))
    return jnp.asarray(np.stack(out), jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--egos", type=int, default=16)
    ap.add_argument("--points", type=int, default=49152)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--slab", type=int, default=4096)
    args = ap.parse_args()
    B, P = args.egos, args.points
    rows = B * P
    print(f"devices: {jax.devices()}  B={B} P={P} rows={rows}", flush=True)

    rng = np.random.default_rng(7)
    pids = [make_pids(P, B, rng) for _ in range(NVAR)]
    feats = [jnp.asarray(np.abs(np.random.default_rng(i).normal(
        size=(B, P, 128))), jnp.bfloat16) for i in range(NVAR)]
    feats4 = [jnp.asarray(np.random.default_rng(i).normal(
        size=(B, P, 4)), jnp.float32) for i in range(NVAR)]
    offs = (jnp.arange(B, dtype=jnp.int32) * S)[:, None]

    # ---- XLA batch-folded scatters (the agent's current form) ----------
    @jax.jit
    def xla_max(feat, pid):
        acc = jnp.zeros((B * S, 128), jnp.bfloat16)
        return acc.at[(pid + offs).reshape(-1)].max(feat.reshape(-1, 128))

    @jax.jit
    def xla_add(feat, pid):
        v = jnp.pad(feat, ((0, 0), (0, 0), (0, 124)))
        acc = jnp.zeros((B * S, 128), jnp.float32)
        return acc.at[(pid + offs).reshape(-1)].add(v.reshape(-1, 128))

    t = device_ms(xla_max, list(zip(feats, pids)), args.iters, "XLA max w128 bf16")
    print(f"    -> {t / rows * 1e6:.2f} ns/row", flush=True)
    t = device_ms(xla_add, list(zip(feats4, pids)), args.iters, "XLA add w4->128 f32")
    print(f"    -> {t / rows * 1e6:.2f} ns/row", flush=True)

    # ---- Pallas kernel -------------------------------------------------
    from lav_tpu.ops import pillar_pallas2 as pp2

    pids_u = [make_pids(P, B, rng, realistic=False) for _ in range(NVAR)]
    variants = [
        ("max", feats, pids, "stream", "coherent"),
        ("add", feats4, pids, "stream", "coherent"),
        ("max", feats, pids_u, "stream", "UNIFORM"),
        ("add", feats4, pids_u, "stream", "UNIFORM"),
        ("max", feats, pids, "rmw", "coherent"),
        ("add", feats4, pids, "rmw", "coherent"),
    ]
    for op, fset, pset, mode, tag in variants:
        f = jax.jit(jax.vmap(functools.partial(
            pp2.scatter_pallas, op=op, num_segments=S, slab=args.slab,
            mode=mode)))
        try:
            # correctness vs XLA oracle on ego 0 first
            got = np.asarray(f(fset[0], pset[0])[0], np.float32)
            if op == "max":
                ref = jnp.zeros((S, 128), jnp.float32).at[pset[0][0]].max(
                    fset[0][0].astype(jnp.float32))
            else:
                ref = jnp.zeros((S, 128), jnp.float32).at[pset[0][0]].add(
                    jnp.pad(fset[0][0], ((0, 0), (0, 124))))
            err = float(np.max(np.abs(got - np.asarray(ref, np.float32))))
            t = device_ms(f, list(zip(fset, pset)), args.iters,
                          f"PAL {op} {mode} {tag}")
            print(f"    -> {t / rows * 1e6:.2f} ns/row  maxerr={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"PAL {op} {mode} {tag} FAILED: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()

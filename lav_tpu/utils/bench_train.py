"""Training-throughput benchmark: jitted train steps at (scaled) reference
batch sizes on real hardware (the reference publishes no such numbers —
SURVEY.md §6; this records ours).

    python -m lav_tpu.utils.bench_train --stage bev --batch-size 64
    python -m lav_tpu.utils.bench_train --stage full --batch-size 8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def timeit_steps(step, params, opt_state, batch, rng, iters=8, warmup=2):
    for i in range(warmup):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.fold_in(rng, 100 + i))
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def bench_bev(bs: int, v2: bool):
    from lav_tpu.config import v1_config, v2_config
    from lav_tpu.models.planner import bev_planner_init
    from lav_tpu.train.privileged import make_bev_train_step

    cfg = v2_config() if v2 else v1_config()
    params = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    T, N, C = cfg.num_plan, cfg.max_objs, cfg.bev_input_channels
    batch = dict(
        bev=jnp.asarray(rng.uniform(0, 1, (bs, cfg.ny, cfg.nx, C)).astype(np.float32)),
        ego_locs=jnp.asarray(np.cumsum(rng.normal(size=(bs, T + 1, 2)), 1).astype(np.float32)),
        cmds=jnp.zeros((bs,), jnp.int32),
        nxps=jnp.asarray(rng.normal(size=(bs, 2)).astype(np.float32)),
        bras=jnp.zeros((bs,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(bs, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((bs, N)),
        typs=jnp.ones((bs, N), jnp.int32),
    )
    inner = make_bev_train_step(cfg, opt, v2=v2)
    step = jax.jit(lambda p, o, b, r: inner(p, o, b, r, 1.0),
                   donate_argnums=(0, 1))
    return timeit_steps(step, params, opt_state, batch, jax.random.key(1))


def bench_full(bs: int, v2: bool, max_points: int, dtype="float32",
               remat=False):
    from lav_tpu.config import v1_config, v2_config
    from lav_tpu.models.lidar import lidar_model_init
    from lav_tpu.models.planner import uniplanner_init
    from lav_tpu.train.distill import make_full_train_step

    cfg = v2_config() if v2 else v1_config()
    k1, k2 = jax.random.split(jax.random.key(0))
    params = {
        "lidar_model": lidar_model_init(k1, cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(k2, cfg),
    }
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    T, N, C = cfg.num_plan, cfg.max_objs, cfg.bev_input_channels
    batch = dict(
        lidar=jnp.asarray(rng.uniform(-10, 40, (bs, max_points, cfg.num_input - 5)).astype(np.float32)),
        lidar_valid=jnp.ones((bs, max_points), bool),
        heatmaps=jnp.asarray(rng.uniform(0, 1, (bs, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        sizemaps=jnp.asarray(rng.uniform(0, 8, (bs, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        orimaps=jnp.asarray(rng.uniform(-1, 1, (bs, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        bev=jnp.asarray((rng.uniform(size=(bs, cfg.ny, cfg.nx, C)) > 0.5).astype(np.float32)),
        ego_locs=jnp.asarray(rng.normal(size=(bs, T + 1, 2)).astype(np.float32)),
        cmds=jnp.zeros((bs,), jnp.int32),
        nxps=jnp.zeros((bs, 2)),
        bras=jnp.zeros((bs,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(bs, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((bs, N)),
        typs=jnp.ones((bs, N), jnp.int32),
    )
    step = jax.jit(make_full_train_step(
        cfg, opt, v2=v2, mode="full", compute_dtype=jnp.dtype(dtype),
        remat=remat), donate_argnums=(0, 1))
    return timeit_steps(step, params, opt_state, batch, jax.random.key(1))


def bench_seg(bs: int):
    """ERFNet seg stage at the reference batch regime (train_seg.py:46)."""
    from lav_tpu.config import v1_config
    from lav_tpu.models.rgb import seg_model_init
    from lav_tpu.train.privileged import make_seg_train_step

    cfg = v1_config()
    n_sem = len(cfg.seg_channels)
    params = seg_model_init(jax.random.key(0), n_sem)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    batch = dict(
        rgb=jnp.asarray(rng.uniform(0, 255, (bs, 288, 256, 3)).astype(np.float32)),
        sem=jnp.asarray(rng.integers(0, n_sem + 1, (bs, 288, 256)).astype(np.int32)),
    )
    step = jax.jit(make_seg_train_step(cfg, opt), donate_argnums=(0, 1))
    return timeit_steps(step, params, opt_state, batch, jax.random.key(1))


def bench_bra(bs: int, version: int = 2):
    """Brake-prediction stage (train_bra.py:46; wide 3-cam concat + tele)."""
    from lav_tpu.config import v1_config
    from lav_tpu.models.rgb import brake_model_init
    from lav_tpu.train.privileged import make_bra_train_step

    cfg = v1_config()
    n_sem = 3
    params = brake_model_init(jax.random.key(0), n_sem, version=version)
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    batch = dict(
        rgb=jnp.asarray(rng.uniform(0, 255, (bs, 288, 768, 3)).astype(np.float32)),
        tel_rgb=jnp.asarray(rng.uniform(0, 255, (bs, 192, 480, 3)).astype(np.float32)),
        sem=jnp.asarray(rng.integers(0, n_sem + 1, (bs, 288, 768)).astype(np.int32)),
        tel_sem=jnp.asarray(rng.integers(0, n_sem + 1, (bs, 192, 480)).astype(np.int32)),
        bra=jnp.asarray(rng.integers(0, 2, (bs,)).astype(np.int32)),
    )
    step = jax.jit(make_bra_train_step(cfg, opt, version=version),
                   donate_argnums=(0, 1))
    return timeit_steps(step, params, opt_state, batch, jax.random.key(1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["bev", "seg", "bra", "full"], default="bev")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--v2", action="store_true")
    p.add_argument("--max-points", type=int, default=16384)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    if args.stage == "bev":
        sec = bench_bev(args.batch_size, args.v2)
    elif args.stage == "seg":
        sec = bench_seg(args.batch_size)
    elif args.stage == "bra":
        sec = bench_bra(args.batch_size, version=2 if args.v2 else 1)
    else:
        sec = bench_full(args.batch_size, args.v2, args.max_points,
                         args.dtype, args.remat)
    print(json.dumps({
        "stage": args.stage, "v2": args.v2, "batch_size": args.batch_size,
        "dtype": args.dtype,
        "step_ms": round(sec * 1000, 1),
        "samples_per_sec": round(args.batch_size / sec, 1),
    }))


if __name__ == "__main__":
    main()

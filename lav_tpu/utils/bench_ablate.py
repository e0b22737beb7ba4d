"""Per-stage timing ablation of the fused agent on real hardware.

Times each subsystem in isolation (jitted, batched over NUM_EGO) to locate
the bottleneck: camera seg, brake, painting, pillar featurizer, conv
backbone+heads, detection decode, planner crops+GRUs.

    python -m lav_tpu.utils.bench_ablate [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ego", type=int, default=16)
    p.add_argument("--max-points", type=int, default=8192)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = p.parse_args()
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    from lav_tpu.config import v2_config
    from lav_tpu.models.lidar import lidar_model_init, lidar_model_apply
    from lav_tpu.models.planner import uniplanner_init, uniplanner_infer
    from lav_tpu.models.rgb import (
        seg_model_init, seg_model_apply, brake_model_init, brake_model_apply,
    )
    from lav_tpu.ops.painting import CameraRig, point_painting
    from lav_tpu.ops.peak import det_inference
    from lav_tpu.ops.pillar import point_pillar_apply

    cfg = v2_config()
    B = args.num_ego
    rng = np.random.default_rng(0)
    ks = jax.random.split(jax.random.key(0), 4)
    lidar_params = lidar_model_init(ks[0], cfg.num_input, cfg.num_features)
    uni_params = uniplanner_init(ks[1], cfg)
    seg_params = seg_model_init(ks[2], len(cfg.seg_channels))
    bra_params = brake_model_init(ks[3], 3, version=2)

    results = {}
    lk = dict(min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y,
              max_y=cfg.max_y, pixels_per_meter=cfg.pixels_per_meter,
              num_features=cfg.num_features)

    # camera segmentation: B*3 images
    rgbs = jnp.asarray(
        rng.uniform(0, 255, (B * 3, 288, 256, 3)).astype(np.float32)
    ).astype(cdt)
    seg_fn = jax.jit(lambda x: seg_model_apply(seg_params, x, False)[0])
    results["seg_ms"] = timeit(seg_fn, rgbs)

    # brake net
    wide = jnp.asarray(
        rng.uniform(0, 255, (B, 288, 768, 3)).astype(np.float32)
    ).astype(cdt)
    tel = jnp.asarray(
        rng.uniform(0, 255, (B, 192, 480, 3)).astype(np.float32)
    ).astype(cdt)
    bra_fn = jax.jit(
        lambda a, b: brake_model_apply(bra_params, a, b, False, version=2)[0]
    )
    results["brake_ms"] = timeit(bra_fn, wide, tel)

    # painting
    P = args.max_points * 2 * 3
    pts3 = jnp.asarray(rng.uniform(-30, 30, (B, P, 3)).astype(np.float32))
    rigs = tuple(CameraRig.build(y, rgb_h=288, rgb_w=256, fov=64)
                 for y in (-60, 0, 60))
    sems = jnp.asarray(
        rng.uniform(0, 1, (B, 3, 288, 256, 4)).astype(np.float32)
    )
    paint_fn = jax.jit(jax.vmap(
        lambda pt, se: point_painting(pt, se, rigs)
    ))
    results["paint_ms"] = timeit(paint_fn, pts3, sems)

    # pillars only
    D = cfg.num_input - 5
    pts = jnp.asarray(rng.uniform(-20, 50, (B, P, D)).astype(np.float32)
                      ).astype(cdt)
    valid = jnp.ones((B, P), bool)
    pillar_fn = jax.jit(lambda x, v: point_pillar_apply(
        lidar_params["point_pillar"], x, v, train=False, **lk)[0])
    results["pillar_ms"] = timeit(pillar_fn, pts, valid)

    # full lidar model (pillar + backbone + heads)
    lidar_fn = jax.jit(lambda x, v: lidar_model_apply(
        lidar_params, x, v, train=False, **lk)[1])
    results["lidar_model_ms"] = timeit(lidar_fn, pts, valid)

    # detection decode
    hm = jnp.asarray(rng.uniform(0, 1, (B, 2, cfg.ny, cfg.nx)).astype(np.float32))
    sz = jnp.asarray(rng.uniform(0, 8, (B, 2, cfg.ny, cfg.nx)).astype(np.float32))
    om = jnp.asarray(rng.uniform(-1, 1, (B, 2, cfg.ny, cfg.nx)).astype(np.float32))
    det_fn = jax.jit(jax.vmap(lambda h, s, o: det_inference(
        h, s, o, pixels_per_meter=cfg.pixels_per_meter,
        max_det=cfg.max_det, min_score=cfg.det_min_score)))
    results["det_decode_ms"] = timeit(det_fn, hm, sz, om)

    # planner inference (crops + resnet + GRUs)
    feats = jnp.asarray(rng.normal(
        0, 1, (B, cfg.ny // 2, cfg.nx // 2, cfg.num_features[-1] * 6)
    ).astype(np.float32)).astype(cdt)
    det = {
        "x": jnp.tile(jnp.arange(cfg.max_det, dtype=jnp.int32)[None] * 10, (B, 1)),
        "y": jnp.tile(jnp.arange(cfg.max_det, dtype=jnp.int32)[None] * 8, (B, 1)),
        "w": jnp.ones((B, cfg.max_det)), "h": jnp.ones((B, cfg.max_det)),
        "cos": jnp.ones((B, cfg.max_det)), "sin": jnp.zeros((B, cfg.max_det)),
        "valid": jnp.ones((B, cfg.max_det), bool),
    }
    plan_fn = jax.jit(jax.vmap(
        lambda f, d: uniplanner_infer(
            uni_params, cfg, f, d, jnp.int32(3), jnp.zeros(2)
        )[0]
    ))
    results["planner_ms"] = timeit(plan_fn, feats, det)

    results = {k: round(v, 2) for k, v in results.items()}
    results["num_ego"] = B
    results["dtype"] = args.dtype
    print(json.dumps(results))


if __name__ == "__main__":
    main()

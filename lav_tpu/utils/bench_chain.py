"""Cumulative-chain timing of the perception->planning pipeline with real
data flow (DCE-proof): stack -> pillar -> backbone+heads -> decode ->
planner, jitted at increasing prefixes; deltas attribute cost in context.

    python -m lav_tpu.utils.bench_chain
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from lav_tpu.config import v2_config
    from lav_tpu.core.geometry import move_lidar_points
    from lav_tpu.models.lidar import lidar_model_init, lidar_model_apply
    from lav_tpu.models.planner import uniplanner_init, uniplanner_infer
    from lav_tpu.ops.peak import det_inference
    from lav_tpu.ops.pillar import (  # noqa
        compute_pillar_ids, decorate_points, point_pillar_apply,
    )

    cfg = v2_config()
    B = 16
    num_stack = cfg.num_frame_stack + 1
    Pb = 2 * 8192
    n_sem = len(cfg.seg_channels)
    Df = 4 + n_sem
    num_keep = num_stack * 5
    cdt = jnp.bfloat16

    rng = np.random.default_rng(0)
    ks = jax.random.split(jax.random.key(0), 2)
    lidar_params = lidar_model_init(ks[0], cfg.num_input, cfg.num_features)
    uni_params = uniplanner_init(ks[1], cfg)

    lidar_buf = jnp.asarray(
        rng.uniform(-20, 40, (B, num_keep, Pb, Df)).astype(np.float32))
    lidar_valid = jnp.ones((B, num_keep, Pb), bool)
    locs_buf = jnp.asarray(rng.normal(0, 5, (B, num_keep, 2)).astype(np.float32))
    oris_buf = jnp.asarray(rng.normal(0, 1, (B, num_keep)).astype(np.float32))
    nxp = jnp.zeros((B, 2))
    cmd = jnp.full((B,), 3, jnp.int32)

    lk = dict(min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y,
              max_y=cfg.max_y, pixels_per_meter=cfg.pixels_per_meter,
              num_features=cfg.num_features)

    def stack_one(buf, val, locs, oris):
        loc0, ori0 = locs[-1], oris[-1]
        sweeps, valids = [], []
        for i in range(num_stack):
            idx = num_keep - 1 - i * 5
            sweep = buf[idx]
            xyz = move_lidar_points(sweep[:, :3], locs[idx] - loc0, ori0,
                                    oris[idx])
            age = jnp.zeros((Pb, num_stack)).at[:, i].set(1.0)
            sweeps.append(jnp.concatenate([xyz, sweep[:, 3:], age], -1))
            valids.append(val[idx])
        return jnp.concatenate(sweeps, 0), jnp.concatenate(valids, 0)

    def stage_stack(buf, val, locs, oris):
        return jax.vmap(stack_one)(buf, val, locs, oris)

    def stage_pillar(buf, val, locs, oris):
        stacked, svalid = stage_stack(buf, val, locs, oris)
        canvas, _ = point_pillar_apply(
            lidar_params["point_pillar"], stacked.astype(cdt), svalid,
            train=False, **lk)
        return canvas

    def stage_lidar(buf, val, locs, oris):
        stacked, svalid = stage_stack(buf, val, locs, oris)
        return lidar_model_apply(
            lidar_params, stacked.astype(cdt), svalid, train=False, **lk
        )[:5]

    def stage_decode(buf, val, locs, oris):
        feats, hm, size, ori, bev = stage_lidar(buf, val, locs, oris)
        H, W = cfg.ny, cfg.nx
        ego_px = jnp.array([W / 2, H / 2 + cfg.y_offset * H / 2])
        dets = jax.vmap(lambda h, s, o: det_inference(
            jax.nn.sigmoid(h.astype(jnp.float32)), s.astype(jnp.float32),
            o.astype(jnp.float32),
            pixels_per_meter=cfg.pixels_per_meter, max_det=cfg.max_det,
            min_score=cfg.det_min_score, ego_xy=ego_px))(hm, size, ori)
        return feats, dets

    def stage_plan(buf, val, locs, oris):
        feats, dets = stage_decode(buf, val, locs, oris)
        veh = {k: v[:, 1] for k, v in dets._asdict().items()}
        out = jax.vmap(
            lambda f, d, c, n: uniplanner_infer(uni_params, cfg, f, d, c, n)[0]
        )(feats, veh, cmd, nxp)
        return out

    args = (lidar_buf, lidar_valid, locs_buf, oris_buf)
    results = {}
    for name, fn in [("stack", stage_stack), ("pillar", stage_pillar),
                     ("lidar", stage_lidar), ("decode", stage_decode),
                     ("plan", stage_plan)]:
        results[f"thru_{name}_ms"] = round(timeit(jax.jit(fn), *args), 1)
        print(json.dumps({f"thru_{name}_ms": results[f"thru_{name}_ms"]}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

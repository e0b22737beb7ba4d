"""BEVPlanner (privileged teacher) and UniPlanner (LiDAR student).

Re-architecture of the reference planners
(/root/reference/lav/models/bev_planner.py:8-298,
/root/reference/lav/models/uniplanner.py:8-348) for TPU:

  * the 6 per-command GRU "cast" branches are ONE vmapped GRU bank
    (stacked weights) instead of a ModuleList Python loop
  * the shared plan GRU evaluates all commands as one (B*num_cmds) batch
  * "other vehicle" handling is fixed-capacity: `max_num_cars` slots with a
    validity mask replace the reference's data-dependent boolean indexing
    (`random_sample`, bev_planner.py:287-298)
  * GRU rollouts and refinement iterations are `lax.scan`-friendly loops of
    static length

Faithfully reproduced quirks (documented, load-bearing for weight parity):
  * UniPlanner's `cast(mode='other')` actually uses the EGO gru bank
    (uniplanner.py:266-271); the `other` bank exists in checkpoints but is
    never evaluated.
  * Ego crops in BEVPlanner.forward use zero jitter (bev_planner.py:148-154);
    UniPlanner jitters its ego crop (uniplanner.py:117-125).
"""

from __future__ import annotations

import math
import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lav_tpu.config import LAVConfig
from lav_tpu.core.geometry import transform_points
from lav_tpu.core.warp import (
    crop_feature, crop_feature_shared, pallas_crop_available,
)
from lav_tpu.nn import layers as L
from lav_tpu.nn.resnet import resnet18_init, resnet_apply

EMBD = 512  # resnet18 layer4 channels / GRU hidden size

# distill trainer's frozen-teacher BEV crop route: None = auto (Pallas for
# bf16 sources — 28% faster step; XLA's fused gather for f32 — the Pallas
# form materializes crops and misses HBM by ~300 MB at f32 bs=32).  Set
# True/False (env LAV_PALLAS_BEV_CROPS=1/0, unset = auto) to force either
# route.  See uniplanner_forward.
PALLAS_BEV_CROPS = (
    None if "LAV_PALLAS_BEV_CROPS" not in os.environ
    else os.environ["LAV_PALLAS_BEV_CROPS"] == "1"
)


# ---------------------------------------------------------------------------
# shared cast/plan core
# ---------------------------------------------------------------------------

def _stacked(init_fn, key, n: int):
    return jax.vmap(init_fn)(jax.random.split(key, n))


def planner_core_init(key, num_cmds: int, with_other_bank: bool = False):
    ks = jax.random.split(key, 6)
    p = {
        "plan_gru": L.gru_init(ks[0], 4, EMBD),
        "plan_mlp": L.linear_init(ks[1], EMBD, 2),
        "cast_grus": _stacked(lambda k: L.gru_init(k, EMBD, 64), ks[2], num_cmds),
        "cast_mlps": _stacked(lambda k: L.linear_init(k, 64, 2), ks[3], num_cmds),
        "cast_cmd_pred": L.linear_init(ks[4], EMBD, num_cmds),
    }
    if with_other_bank:
        # kept for checkpoint-structure parity; never evaluated (see module
        # docstring on the reference's mode='other' quirk)
        p["cast_grus_other"] = _stacked(
            lambda k: L.gru_init(k, EMBD, 64), ks[5], num_cmds
        )
        p["cast_mlps_other"] = _stacked(
            lambda k: L.linear_init(k, 64, 2), jax.random.split(ks[5])[0], num_cmds
        )
    return p


def _cumsum_time(x):
    """cumsum over the (short) plan-time axis 1 as one lower-triangular
    matmul: XLA lowers jnp.cumsum to reduce_window, which is pure
    per-launch overhead at these shapes (~1.7 ms/16-ego tick for a
    (96, 20, 2) tensor); a tril dot is a single fused op.  precision
    'highest' keeps f32 sums exact-ish (T <= 20 terms)."""
    T = x.shape[1]
    tri = jnp.tril(jnp.ones((T, T), x.dtype))
    return jnp.einsum("ts,bsd->btd", tri, x, precision="highest")


def cast(core, embd, num_plan: int):
    """embd (B, EMBD) -> multi-command trajectories (B, num_cmds, T, 2).

    Each command branch: GRU fed the embedding at every step, cumulative-sum
    decoded deltas (reference cast, bev_planner.py:211-222)."""
    B = embd.shape[0]
    u = jnp.broadcast_to(embd[:, None], (B, num_plan, EMBD))

    def one_branch(gru_p, mlp_p):
        out, _ = L.gru(gru_p, u)
        return _cumsum_time(L.linear(mlp_p, out))

    locs = jax.vmap(one_branch)(core["cast_grus"], core["cast_mlps"])
    return jnp.moveaxis(locs, 0, 1)  # (B, C, T, 2)


def cast_cmd_pred(core, embd):
    return jax.nn.sigmoid(L.linear(core["cast_cmd_pred"], embd))


def _plan_once(core, embd, nxp, cast_locs, *, num_plan: int,
               pixels_per_meter: float, crop_size: int):
    """One refinement pass (reference _plan, bev_planner.py:178-195).

    All num_cmds branches share the plan GRU -> evaluate as one fused batch.
    """
    B, C = cast_locs.shape[0], cast_locs.shape[1]
    u0 = nxp * pixels_per_meter / crop_size * 2.0 - 1.0  # (B, 2)
    u0 = jnp.broadcast_to(u0[:, None, None], (B, C, num_plan, 2))
    u = jnp.concatenate([u0, cast_locs], axis=-1).reshape(B * C, num_plan, 4)
    h0 = jnp.broadcast_to(embd[:, None], (B, C, EMBD)).reshape(B * C, EMBD)
    out, _ = L.gru(core["plan_gru"], u, h0)
    locs = _cumsum_time(L.linear(core["plan_mlp"], out))
    return locs.reshape(B, C, num_plan, 2) + cast_locs


def plan(core, embd, nxp, cast_locs, *, num_plan: int, num_plan_iter: int,
         pixels_per_meter: float, crop_size: int):
    """Iterative refinement; returns (B, num_plan_iter, C, T, 2)."""
    loc = jax.lax.stop_gradient(cast_locs)
    outs = []
    for _ in range(num_plan_iter):
        loc = _plan_once(core, embd, nxp, loc, num_plan=num_plan,
                         pixels_per_meter=pixels_per_meter, crop_size=crop_size)
        outs.append(loc)
    return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# car selection (static-capacity replacement for filter_cars+random_sample)
# ---------------------------------------------------------------------------

def select_cars(rng, ego_locs, locs, oris, typs, max_num_cars: int):
    """Pick up to `max_num_cars` other-vehicle slots per batch item.

    locs (B, N, T+1, 2), oris (B, N), typs (B, N) int — slot 0 (ego) already
    removed by the caller.  A car qualifies if typ==1 and it is ahead of the
    ego (rel y < 0, reference filter_cars bev_planner.py:280-284).  Random
    subsampling replaces torch.multinomial (reference random_sample) — both
    are uniform without replacement.

    Returns (idx (B, K) int, car_valid (B, K) bool).
    """
    rel = locs[:, :, 0] - ego_locs[:, None, 0]
    mask = (typs == 1) & (rel[..., 1] < 0)
    scores = jnp.where(mask, jax.random.uniform(rng, mask.shape), -jnp.inf)
    top_scores, idx = jax.lax.top_k(scores, max_num_cars)
    return idx, jnp.isfinite(top_scores)


def _gather_cars(arr, idx):
    """arr (B, N, ...) gathered at idx (B, K) -> (B, K, ...)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


# ---------------------------------------------------------------------------
# BEVPlanner
# ---------------------------------------------------------------------------

class PlannerOutputs(NamedTuple):
    """Fixed-shape planner forward results (teacher or student)."""
    other_locs: jnp.ndarray        # (B, K, T, 2) GT future of selected cars
    other_cast_locs: jnp.ndarray   # (B, K, C, T, 2)
    other_cast_cmds: jnp.ndarray   # (B, K, C)
    ego_plan_locs: jnp.ndarray     # (B, I, C, T, 2)
    ego_cast_locs: jnp.ndarray     # (B, C, T, 2)
    ego_cast_cmds: jnp.ndarray     # (B, C)
    car_valid: jnp.ndarray         # (B, K) bool


def bev_planner_init(key, cfg: LAVConfig):
    k1, k2 = jax.random.split(key)
    return {
        "bev_conv_emb": resnet18_init(k1, cfg.bev_input_channels),
        **planner_core_init(k2, cfg.num_cmds),
    }


def _conv_emb(resnet_params, x, train: bool):
    feats, state = resnet_apply(resnet_params, x, train)
    # embeddings feed the GRU rollouts, which stay f32 even when the conv
    # path runs bf16 (cumulative-sum waypoint decoding is precision-bound)
    return feats.mean(axis=(1, 2)).astype(jnp.float32), state


def _jitter(rng, shape_k, feature_x_jitter, feature_angle_jitter_rad):
    kl, ko = jax.random.split(rng)
    loc = (jax.random.uniform(kl, shape_k + (2,)) * 2 - 1) * feature_x_jitter
    loc = loc.at[..., 1].set(0.0)
    ori = (jax.random.uniform(ko, shape_k) * 2 - 1) * feature_angle_jitter_rad
    return loc, ori


def bev_planner_forward(params, cfg: LAVConfig, bev, ego_locs, locs, oris,
                        nxps, typs, rng, train: bool = True,
                        use_pallas_crop: Optional[bool] = None):
    """Teacher forward (reference bev_planner.py:74-176).

    bev (B, H, W, Cin) NHWC; ego_locs (B, T+1, 2); locs (B, max_objs, T+1, 2);
    oris (B, max_objs); nxps (B, 2); typs (B, max_objs) int.
    Returns (PlannerOutputs, bn_state).
    """
    B = bev.shape[0]
    K = cfg.max_num_cars
    ang_jit = math.radians(cfg.feature_angle_jitter)
    r_sel, r_jit = jax.random.split(rng)
    if use_pallas_crop is None:
        use_pallas_crop = pallas_crop_available()

    ego_oris = oris[:, 0]
    o_locs, o_oris, o_typs = locs[:, 1:], oris[:, 1:], typs[:, 1:]

    idx, car_valid = select_cars(r_sel, ego_locs, o_locs, o_oris, o_typs, K)
    sel_locs = _gather_cars(o_locs, idx)            # (B, K, T+1, 2)
    sel_oris = _gather_cars(o_oris, idx)            # (B, K)

    rel_loc0 = sel_locs[:, :, 0] - ego_locs[:, None, 0]       # (B, K, 2)
    rel_ori0 = sel_oris - ego_oris[:, None]                   # (B, K)
    fut = sel_locs[:, :, 1:] - sel_locs[:, :, :1]             # (B, K, T, 2)

    if train:
        loc_jit, ori_jit = _jitter(r_jit, (B, K), cfg.feature_x_jitter, ang_jit)
    else:
        loc_jit = jnp.zeros((B, K, 2))
        ori_jit = jnp.zeros((B, K))

    # crop every selected car's rotated BEV neighborhood — shared-source
    # sampling (K crops per item from ONE map; never tile the map K times).
    # On TPU the Pallas kernel also dodges the XLA gather's lane-padded
    # neighborhood temp (~0.4 GiB/sample on 5-channel maps), which is what
    # blocked reference-scale batch sizes.
    crop_other = jax.vmap(
        lambda f, l, o: crop_feature_shared(
            f, l, o,
            pixels_per_meter=cfg.pixels_per_meter,
            crop_size=cfg.crop_size * 2,
            offset_y=cfg.y_offset,
            use_pallas=use_pallas_crop,
        )
    )(bev, rel_loc0 + loc_jit, rel_ori0 + ori_jit)
    crop_other = crop_other.reshape((B * K,) + crop_other.shape[2:])
    other_locs = transform_points(fut - loc_jit[:, :, None], -rel_ori0 - ori_jit)

    other_embd, st_other = _conv_emb(params["bev_conv_emb"], crop_other, train)
    other_cast_locs = cast(params, other_embd, cfg.num_plan)
    other_cast_cmds = cast_cmd_pred(params, other_embd)

    # ego: zero jitter (reference bev_planner.py:148-154)
    crop_ego = crop_feature(
        bev, jnp.zeros((B, 2)), jnp.zeros((B,)),
        pixels_per_meter=cfg.pixels_per_meter,
        crop_size=cfg.crop_size * 2,
        offset_y=cfg.y_offset,
        use_pallas=use_pallas_crop,
    )
    ego_embd, st_ego = _conv_emb(params["bev_conv_emb"], crop_ego, train)
    ego_cast_locs = cast(params, ego_embd, cfg.num_plan)
    ego_plan_locs = plan(
        params, ego_embd, nxps, ego_cast_locs,
        num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
        pixels_per_meter=cfg.pixels_per_meter, crop_size=cfg.crop_size * 2,
    )
    ego_cast_cmds = cast_cmd_pred(params, ego_embd)

    out = PlannerOutputs(
        other_locs=other_locs,
        other_cast_locs=other_cast_locs.reshape(B, K, cfg.num_cmds, cfg.num_plan, 2),
        other_cast_cmds=other_cast_cmds.reshape(B, K, cfg.num_cmds),
        ego_plan_locs=ego_plan_locs,
        ego_cast_locs=ego_cast_locs,
        ego_cast_cmds=ego_cast_cmds,
        car_valid=car_valid,
    )
    # ego BN state wins (same weights used twice; last write matches torch
    # call order where ego crop is embedded after the others)
    return out, {"bev_conv_emb": st_ego}


def bev_planner_infer(params, cfg: LAVConfig, bev, nxps):
    """Inference: plan from the ego crop only (reference infer, :50-72).
    bev (B, H, W, C); nxps (B, 2)."""
    B = bev.shape[0]
    crop_ego = crop_feature(
        bev, jnp.zeros((B, 2)), jnp.zeros((B,)),
        pixels_per_meter=cfg.pixels_per_meter,
        crop_size=cfg.crop_size * 2,
        offset_y=cfg.y_offset,
        use_pallas=pallas_crop_available(),
    )
    embd, _ = _conv_emb(params["bev_conv_emb"], crop_ego, False)
    cast_locs = cast(params, embd, cfg.num_plan)
    plan_locs = plan(
        params, embd, nxps, cast_locs,
        num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
        pixels_per_meter=cfg.pixels_per_meter, crop_size=cfg.crop_size * 2,
    )
    return plan_locs, cast_locs, cast_cmd_pred(params, embd)


# ---------------------------------------------------------------------------
# UniPlanner
# ---------------------------------------------------------------------------

class UniPlannerOutputs(NamedTuple):
    other_locs: jnp.ndarray              # (B, K, T, 2)
    other_cast_locs: jnp.ndarray         # (B, K, C, T, 2) student
    other_cast_cmds: jnp.ndarray         # (B, K, C) student
    other_cast_locs_expert: jnp.ndarray  # (B, K, C, T, 2) teacher (stopgrad)
    other_cast_cmds_expert: jnp.ndarray  # (B, K, C)
    ego_locs: jnp.ndarray                # (B, T, 2) jittered GT ego future
    ego_plan_locs: jnp.ndarray           # (B, I, C, T, 2)
    ego_cast_locs: jnp.ndarray           # (B, C, T, 2)
    ego_cast_cmds: jnp.ndarray           # (B, C)
    ego_cast_locs_expert: jnp.ndarray    # (B, C, T, 2)
    ego_plan_locs_expert: jnp.ndarray    # (B, I, C, T, 2)
    car_valid: jnp.ndarray               # (B, K)


def uniplanner_init(key, cfg: LAVConfig, bev_planner_params=None):
    k1, k2, k3 = jax.random.split(key, 3)
    if bev_planner_params is None:
        bev_planner_params = bev_planner_init(k3, cfg)
    return {
        "lidar_conv_emb": resnet18_init(k1, cfg.uniplanner_input_channels),
        **planner_core_init(k2, cfg.num_cmds, with_other_bank=True),
        "bev_planner": bev_planner_params,
    }


def uniplanner_forward(params, cfg: LAVConfig, features, bev, ego_locs, locs,
                       oris, nxps, typs, rng, train: bool = True,
                       use_pallas_crop: Optional[bool] = None):
    """Student forward with in-graph frozen teacher
    (reference uniplanner.py:56-150).

    features (B, Hf, Wf, Cf) LiDAR backbone output (half resolution);
    bev (B, H, W, Cin) ground-truth BEV for the teacher.
    """
    B = features.shape[0]
    K = cfg.max_num_cars_student
    ang_jit = math.radians(cfg.feature_angle_jitter)
    teacher = params["bev_planner"]
    r_sel, r_jit_o, r_jit_e = jax.random.split(rng, 3)
    if use_pallas_crop is None:
        use_pallas_crop = pallas_crop_available()

    ego_oris = oris[:, 0]
    o_locs, o_oris, o_typs = locs[:, 1:], oris[:, 1:], typs[:, 1:]

    idx, car_valid = select_cars(r_sel, ego_locs, o_locs, o_oris, o_typs, K)
    sel_locs = _gather_cars(o_locs, idx)
    sel_oris = _gather_cars(o_oris, idx)

    rel_loc0 = sel_locs[:, :, 0] - ego_locs[:, None, 0]
    rel_ori0 = sel_oris - ego_oris[:, None]
    fut = sel_locs[:, :, 1:] - sel_locs[:, :, :1]

    if train:
        loc_jit, ori_jit = _jitter(r_jit_o, (B, K), cfg.feature_x_jitter, ang_jit)
    else:
        loc_jit = jnp.zeros((B, K, 2))
        ori_jit = jnp.zeros((B, K))

    def multi_crop(src, ppm, crop, pallas):
        out = jax.vmap(
            lambda f, l, o: crop_feature_shared(
                f, l, o, pixels_per_meter=ppm, crop_size=crop,
                offset_y=cfg.y_offset, use_pallas=pallas,
            )
        )(src, rel_loc0 + loc_jit, rel_ori0 + ori_jit)
        return out.reshape((B * K,) + out.shape[2:])

    # Memory-vs-speed auto-picks (all measured, v5e single chip):
    #  * f32 bs>=32 misses HBM natively (the (B*K, crop, crop, 384)
    #    student crop stack + its grid-sample backward temp are 2x1.69 GB)
    #    -> scope a jax.checkpoint over the student crop+embed ONLY there;
    #    at f32 bs=16 / bf16 the recompute costs ~20-30% step time for
    #    headroom those configs don't need (40.7 vs 50.5, 304 vs 233 ms).
    #  * teacher BEV crops: Pallas at bf16 (28% faster, 232.6 vs 298.5 ms
    #    at bs=16) and whenever the checkpoint is active (with it, XLA no
    #    longer fuses the f32 tap gather into the teacher conv and the
    #    (taps, 2, 2, 9->128-lane) temp balloons to 9 GB); XLA gather
    #    otherwise (it fuses, and Pallas's materialized crops cost the
    #    f32 bs=16 regime ~10%).  PALLAS_BEV_CROPS forces a route.
    ckpt_crops = train and features.dtype == jnp.float32 and B >= 32
    bev_auto = (bev.dtype != jnp.float32) or ckpt_crops
    bev_pallas = use_pallas_crop and (
        bev_auto if PALLAS_BEV_CROPS is None else PALLAS_BEV_CROPS
    )
    crop_other_bev = multi_crop(bev, cfg.pixels_per_meter,
                                cfg.crop_size * 2, bev_pallas)

    other_locs = transform_points(fut - loc_jit[:, :, None], -rel_ori0 - ori_jit)

    # student crop + embed under a SCOPED jax.checkpoint where the crop
    # stack is what breaks HBM (see the auto-pick note above) — this is
    # what makes the reference's default f32 bs=32 regime run natively
    # (round-2 weak 5) instead of needing whole-forward --remat
    def _student_embed(cp, feats):
        crop = multi_crop(feats, cfg.pixels_per_meter / 2,
                          cfg.crop_size, use_pallas_crop)
        return _conv_emb(cp, crop, train)

    if ckpt_crops:
        _student_embed = jax.checkpoint(_student_embed)
    other_embd, st_other = _student_embed(params["lidar_conv_emb"], features)
    other_cast_locs = cast(params, other_embd, cfg.num_plan)
    other_cast_cmds = cast_cmd_pred(params, other_embd)

    # frozen teacher: eval-mode BN, no gradient (reference :99-102)
    other_bev_embd, _ = _conv_emb(teacher["bev_conv_emb"], crop_other_bev, False)
    other_cast_locs_expert = jax.lax.stop_gradient(
        cast(teacher, other_bev_embd, cfg.num_plan)
    )
    other_cast_cmds_expert = jax.lax.stop_gradient(
        cast_cmd_pred(teacher, other_bev_embd)
    )

    # ego (jittered here, unlike the teacher-only trainer)
    if train:
        eloc_jit, eori_jit = _jitter(r_jit_e, (B,), cfg.feature_x_jitter, ang_jit)
    else:
        eloc_jit = jnp.zeros((B, 2))
        eori_jit = jnp.zeros((B,))

    ego_fut = transform_points(ego_locs[:, 1:] - eloc_jit[:, None], -eori_jit)
    nxps_j = transform_points(nxps[:, None] - eloc_jit[:, None], -eori_jit)[:, 0]

    crop_ego_feat = crop_feature(
        features, eloc_jit, eori_jit,
        pixels_per_meter=cfg.pixels_per_meter / 2,
        crop_size=cfg.crop_size,
        offset_y=cfg.y_offset,
        use_pallas=use_pallas_crop,
    )
    crop_ego_bev = crop_feature(
        bev, eloc_jit, eori_jit,
        pixels_per_meter=cfg.pixels_per_meter,
        crop_size=cfg.crop_size * 2,
        offset_y=cfg.y_offset,
        use_pallas=bev_pallas,
    )

    ego_embd, st_ego = _conv_emb(params["lidar_conv_emb"], crop_ego_feat, train)
    ego_bev_embd, _ = _conv_emb(teacher["bev_conv_emb"], crop_ego_bev, False)
    ego_cast_locs_expert = jax.lax.stop_gradient(
        cast(teacher, ego_bev_embd, cfg.num_plan)
    )
    ego_plan_locs_expert = jax.lax.stop_gradient(
        plan(teacher, ego_bev_embd, nxps_j, ego_cast_locs_expert,
             num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
             pixels_per_meter=cfg.pixels_per_meter, crop_size=cfg.crop_size * 2)
    )

    ego_cast_locs = cast(params, ego_embd, cfg.num_plan)
    ego_plan_locs = plan(
        params, ego_embd, nxps_j, ego_cast_locs,
        num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
        pixels_per_meter=cfg.pixels_per_meter, crop_size=cfg.crop_size * 2,
    )
    ego_cast_cmds = cast_cmd_pred(params, ego_embd)

    out = UniPlannerOutputs(
        other_locs=other_locs,
        other_cast_locs=other_cast_locs.reshape(B, K, cfg.num_cmds, cfg.num_plan, 2),
        other_cast_cmds=other_cast_cmds.reshape(B, K, cfg.num_cmds),
        other_cast_locs_expert=other_cast_locs_expert.reshape(
            B, K, cfg.num_cmds, cfg.num_plan, 2
        ),
        other_cast_cmds_expert=other_cast_cmds_expert.reshape(B, K, cfg.num_cmds),
        ego_locs=ego_fut,
        ego_plan_locs=ego_plan_locs,
        ego_cast_locs=ego_cast_locs,
        ego_cast_cmds=ego_cast_cmds,
        ego_cast_locs_expert=ego_cast_locs_expert,
        ego_plan_locs_expert=ego_plan_locs_expert,
        car_valid=car_valid,
    )
    return out, {"lidar_conv_emb": st_ego}


def _det_chunk(K: int) -> int:
    """Largest divisor of K that is <= 5 (bounds live crop memory)."""
    for c in (5, 4, 3, 2, 1):
        if K % c == 0:
            return c
    return 1


def uniplanner_infer(params, cfg: LAVConfig, features, det, cmd, nxp,
                     use_pallas_crop: Optional[bool] = None):
    """Fused inference for the agent (reference uniplanner.infer, :160-224,
    and the torchscript uniplanner_infer, model_inference.py:123-187) with
    fixed detection capacity.

    features (Hf, Wf, Cf) single frame; det: Detections-like arrays for the
    vehicle class — x, y, w, h, cos, sin, valid each (K,); cmd scalar int;
    nxp (2,).
    Returns (ego_plan_locs (T,2), ego_cast_cmd (T,2), other_cast_locs
    (K, C, T, 2) in ego frame, other_cast_cmds (K, C), other_valid (K,)).
    """
    Hf, Wf = features.shape[0], features.shape[1]
    H, W = Hf * 2, Wf * 2
    center_x = W / 2.0  # + offset_x * W/2 with offset_x = 0
    center_y = H / 2.0 + cfg.y_offset * H / 2.0
    ppm = cfg.pixels_per_meter

    x, y = det["x"].astype(jnp.float32), det["y"].astype(jnp.float32)
    d2 = (x - center_x) ** 2 + (y - center_y) ** 2
    ovalid = det["valid"] & (d2 > 4.0 ** 2)

    olocs = jnp.stack([(x - center_x) / ppm, (y - center_y) / ppm], axis=-1)
    ooris = jnp.arctan2(det["sin"], det["cos"])
    K = olocs.shape[0]
    if use_pallas_crop is None:
        use_pallas_crop = pallas_crop_available()

    # Crop+embed all K detections.  On TPU the fused Pallas tile+MXU kernel
    # does this from a VMEM-resident source (2.9x the XLA gather and no
    # multi-GB tap temps in f32).  The XLA f32 fallback chunks through
    # lax.map: the K 384-channel crops cost ~3.2 GB per gather tap at 16
    # vmapped egos (v5e OOM); in bf16 everything fits and the single big
    # gather is ~15x faster than the serialized chunks (measured: the
    # chunked while-loop was 130 ms/tick vs 8 ms unchunked).
    ego_embd = None
    if use_pallas_crop:
        # fold the ego crop into the detection crops: same source, same
        # crop geometry -> ONE kernel launch and one (K+1)-batch conv_emb /
        # cast-bank pass instead of a K-batch plus a tiny 1-batch rerun
        # (conv, eval-BN and cast are per-sample: numerically identical)
        all_locs = jnp.concatenate([olocs, jnp.zeros((1, 2), olocs.dtype)])
        all_oris = jnp.concatenate([ooris, jnp.zeros((1,), ooris.dtype)])
        # int8 crop resnet (nn/quant.py): emit the crops ALREADY quantized
        # with conv1's calibrated activation scale — the quantize fuses
        # into the crop kernel's epilogue (the standalone clamp/convert
        # pass over the (K+1)-crop stack cost 4.0 ms/tick at 16 egos) and
        # conv2d_int8 consumes the int8 crops as-is
        c1 = params["lidar_conv_emb"].get("conv1", {})
        q8s = c1["x_scale"] if ("w_int8" in c1 and "x_scale" in c1) else None
        # LAV_S2D_CROPS=1: crops arrive as (K+1, crop/2, crop/2, 4C) int8
        # and conv1 runs as the 94%-of-peak 4x4 stride-1 form
        # (quant.conv2d_int8_s2d; 5.01 vs 7.36 ms standalone,
        # exp_conv1.py).  OFF by default: in the full agent the kernel's
        # s2d emit costs MORE than the conv saves — the phase regrouping
        # is sub-vreg row shuffles (quad mode, the cheapest of two
        # measured forms: pallas class 4.41 -> 7.19 ms vs conv
        # 24.8 -> 22.9; 298.9 -> 294.3 steps/s end to end).
        q8_s2d = (q8s is not None and cfg.crop_size % 2 == 0
                  and os.environ.get("LAV_S2D_CROPS", "0") == "1")
        crop_all = crop_feature_shared(
            features, all_locs, all_oris,
            pixels_per_meter=ppm / 2, crop_size=cfg.crop_size,
            offset_y=cfg.y_offset, use_pallas=True, q8_x_scale=q8s,
            q8_s2d=q8_s2d,
        )
        all_embd, _ = _conv_emb(params["lidar_conv_emb"], crop_all, False)
        other_embd, ego_embd = all_embd[:K], all_embd[K:]
    elif features.dtype == jnp.float32 and K > _det_chunk(K):
        chunk = _det_chunk(K)

        def embed_chunk(args):
            l, o = args
            crop = crop_feature_shared(
                features, l, o,
                pixels_per_meter=ppm / 2, crop_size=cfg.crop_size,
                offset_y=cfg.y_offset,
            )
            emb, _ = _conv_emb(params["lidar_conv_emb"], crop, False)
            return emb

        other_embd = jax.lax.map(
            embed_chunk,
            (olocs.reshape(-1, chunk, 2), ooris.reshape(-1, chunk)),
        ).reshape(K, EMBD)
    else:
        crop_other = crop_feature_shared(
            features, olocs, ooris,
            pixels_per_meter=ppm / 2, crop_size=cfg.crop_size,
            offset_y=cfg.y_offset,
        )
        other_embd, _ = _conv_emb(params["lidar_conv_emb"], crop_other, False)
    if ego_embd is not None:
        # one cast-bank pass over the merged (K+1) embeddings (the others
        # use the ego bank anyway — reference quirk, uniplanner.py:17-19)
        all_cast_locs = cast(params, all_embd, cfg.num_plan)
        other_cast_locs, ego_cast_locs = all_cast_locs[:K], all_cast_locs[K:]
    else:
        other_cast_locs = cast(params, other_embd, cfg.num_plan)  # ego bank
    other_cast_cmds = cast_cmd_pred(params, other_embd)
    # rotate each car's forecast back into the ego frame
    other_cast_locs = transform_points(
        other_cast_locs, ooris[:, None, None]
    ) + olocs[:, None, None]

    if ego_embd is None:
        crop_ego = crop_feature(
            features[None], jnp.zeros((1, 2)), jnp.zeros((1,)),
            pixels_per_meter=ppm / 2, crop_size=cfg.crop_size,
            offset_y=cfg.y_offset,
        )
        ego_embd, _ = _conv_emb(params["lidar_conv_emb"], crop_ego, False)
        ego_cast_locs = cast(params, ego_embd, cfg.num_plan)
    ego_plan_all = plan(
        params, ego_embd, nxp[None], ego_cast_locs,
        num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
        pixels_per_meter=ppm, crop_size=cfg.crop_size * 2,
    )
    ego_plan_locs = ego_plan_all[0, -1, cmd]
    return (
        ego_plan_locs,
        ego_cast_locs[0, cmd],
        other_cast_locs,
        other_cast_cmds,
        ovalid,
    )

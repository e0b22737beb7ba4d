"""Stage-2 trainer: end-to-end LiDAR perception + privileged distillation.

Jitted train step mirroring /root/reference/lav/lav_final.py:122-187 (v1)
and lav_final_v2.py:141-230 (v2): CenterNet-style detection loss, BEV
segmentation BCE (v2: Gaussian ego-centered spatial weighting), and motion
losses distilled from the frozen in-graph BEV teacher.

Modes (reference --perceive-only / --motion-only flags):
  'full'          mot + det + seg (v1) or mot + (det+seg)*perception_weight (v2)
  'perceive_only' det + seg
  'motion_only'   mot only

The teacher inside params['uniplanner']['bev_planner'] receives zero
gradient by construction (stop_gradient in uniplanner_forward), so a single
optimizer over the whole tree reproduces the reference's student-only
parameter list (lav_final.py:69-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from lav_tpu.config import LAVConfig
from lav_tpu.core.heatmap import build_seg_mask
from lav_tpu.models import losses
from lav_tpu.models.lidar import lidar_model_apply
from lav_tpu.models.planner import uniplanner_forward
from lav_tpu.utils.tree import merge_bn_state


def make_distill_loss_fn(cfg: LAVConfig, v2: bool = False,
                         mode: str = "full"):
    """The trainer's loss composition as a standalone testable function
    (VERDICT r4 #3: the composition — branch weights, seg_mask gaussian,
    perception_weight — must be value-oracled against the reference's
    inline formulas, lav_final.py:160-183 / lav_final_v2.py:141-230).

    Returns loss_terms(preds, out, batch) -> (loss, metrics) where preds =
    (hm, size, ori, pred_bev) f32 lidar-model outputs and out is the
    uniplanner_forward output struct."""
    assert mode in ("full", "perceive_only", "motion_only")
    # v1 trains seg channels [0,3,4] of the 5-channel BEV; v2 uses [0,1,2]
    # (lav_final.py:142 vs lav_final_v2.py:163)
    seg_ch = (0, 1, 2) if v2 else (0, 3, 4)
    bw = jnp.asarray(cfg.branch_weights) if cfg.branch_weights else None
    if v2:
        W = cfg.ny
        H = cfg.nx
        cx = W / 2.0 + (cfg.min_y + cfg.max_y) / 2.0 * cfg.pixels_per_meter
        cy = H / 2.0 + (cfg.min_x + cfg.max_x) / 2.0 * cfg.pixels_per_meter
        seg_mask = build_seg_mask(H, W, cx, cy)[None, None]
    else:
        seg_mask = None

    def loss_terms(preds, out, batch):
        hm, size, ori, pred_bev = preds
        cmds = batch["cmds"].astype(jnp.int32)

        hm_l, box_l, ori_l = losses.det_loss(
            hm, batch["heatmaps"], size, batch["sizemaps"],
            ori, batch["orimaps"],
        )
        det_l = hm_l + cfg.box_weight * box_l + cfg.ori_weight * ori_l

        seg_tgt = jnp.stack([batch["bev"][..., c] for c in seg_ch], axis=1)
        seg_bce = losses.bce(pred_bev, seg_tgt)
        if seg_mask is not None:
            seg_l = (seg_bce * seg_mask).mean() * cfg.seg_weight
        else:
            seg_l = seg_bce.mean() * cfg.seg_weight

        if v2:
            # distill the plan from the expert's final-iteration plan at
            # the GT command (lav_final_v2.py:196-201)
            expert_plan = losses.gather_cmd(
                out.ego_plan_locs_expert[:, -1], cmds
            )
            plan_l = losses.plan_loss_all_cmds(
                out.ego_plan_locs, jax.lax.stop_gradient(expert_plan),
                item_weights=None if bw is None else bw[cmds],
            )
        else:
            # reference quirk kept (lav_final.py:172): the plan target is
            # the RAW batch ego future even though the planner computed the
            # plan in the jittered ego frame (uniplanner.py:121) — the
            # jitter acts as +-1 m / +-10 deg label noise
            plan_l = losses.plan_loss_all_cmds(
                out.ego_plan_locs, batch["ego_locs"][:, 1:]
            )

        if cfg.distill:
            cast_l = losses.distill_l1(
                out.ego_cast_locs, out.ego_cast_locs_expert
            )
            other_l = losses.distill_l1(
                out.other_cast_locs, out.other_cast_locs_expert,
                out.car_valid,
            )
            cmd_l = losses.cmd_distill_bce(
                out.other_cast_cmds, out.other_cast_cmds_expert,
                out.car_valid,
            )
        else:
            idxs = batch["bras"] == 0
            sel = losses.gather_cmd(out.ego_cast_locs, cmds)
            # raw-batch target as in lav_final_v2.py:209 (same jitter quirk
            # as the v1 plan loss above)
            cast_l = losses.masked_mean(
                jnp.abs(sel - batch["ego_locs"][:, 1:]).mean(axis=(1, 2)),
                idxs,
            )
            other_l = losses.other_cast_loss_min_mode(
                out.other_cast_locs, out.other_locs, out.car_valid
            )
            cmd_l = losses.cmd_bce(
                out.ego_cast_cmds, cmds, cfg.num_cmds, smooth=cfg.cmd_smooth
            )

        ow = cfg.other_weight if cfg.use_others_to_train else 0.0
        mot_l = plan_l + cast_l + other_l * ow + cmd_l * cfg.cmd_weight

        if mode == "perceive_only":
            loss = det_l + seg_l
        elif mode == "motion_only":
            loss = mot_l
        elif v2:
            loss = mot_l + (det_l + seg_l) * cfg.perception_weight
        else:
            loss = mot_l + det_l + seg_l

        metrics = dict(
            loss=loss, hm_loss=hm_l, box_loss=box_l, ori_loss=ori_l,
            seg_loss=seg_l, plan_loss=plan_l, ego_cast_loss=cast_l,
            other_cast_loss=other_l, cmd_loss=cmd_l,
        )
        return loss, metrics

    return loss_terms


def make_distill_forward(cfg: LAVConfig, v2: bool = False,
                         mode: str = "full", compute_dtype=None,
                         remat: bool = False):
    """The full forward + loss of the distillation step as a standalone
    function (params, batch, rng) -> (loss, (bn_state, metrics)).

    `make_full_train_step` wraps this in value_and_grad + optimizer; the
    driver dryrun calls it EAGERLY on one device as a compile-free
    numerical reference for the sharded step's first-step loss."""
    loss_terms = make_distill_loss_fn(cfg, v2=v2, mode=mode)

    lidar_kw = dict(
        min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y, max_y=cfg.max_y,
        pixels_per_meter=cfg.pixels_per_meter, num_features=cfg.num_features,
    )

    cdt = compute_dtype or jnp.float32

    # rematerialization: recompute the perception/planner forwards in the
    # backward pass instead of saving every conv activation — trades ~1/3
    # more FLOPs for the memory to reach the reference bs=256/512 regime
    # (matmul/conv outputs without batch dims stay saved: dots policy).
    def lidar_fwd(p, pts, valid):
        return lidar_model_apply(p, pts, valid, train=True, **lidar_kw)

    def planner_fwd(p, feats, bev, ego_locs, locs, oris, nxps, typs, rng):
        return uniplanner_forward(p, cfg, feats, bev, ego_locs, locs,
                                  oris, nxps, typs, rng, train=True)

    if remat:
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        lidar_fwd = jax.checkpoint(lidar_fwd, policy=policy)
        planner_fwd = jax.checkpoint(planner_fwd, policy=policy)

    def forward(params, batch, rng):
        feats, hm, size, ori, pred_bev, st_lidar = lidar_fwd(
            params["lidar_model"], batch["lidar"].astype(cdt),
            batch["lidar_valid"],
        )
        # losses in f32 (log/abs on bf16 probs is too coarse)
        hm = hm.astype(jnp.float32)
        size = size.astype(jnp.float32)
        ori = ori.astype(jnp.float32)
        pred_bev = pred_bev.astype(jnp.float32)
        out, st_uni = planner_fwd(
            params["uniplanner"], feats, batch["bev"].astype(cdt),
            batch["ego_locs"],
            batch["locs"], batch["oris"], batch["nxps"], batch["typs"],
            rng,
        )
        loss, metrics = loss_terms((hm, size, ori, pred_bev), out, batch)
        state = {"lidar_model": st_lidar, "uniplanner": st_uni}
        return loss, (state, metrics)

    return forward


def make_full_train_step(cfg: LAVConfig, optimizer, v2: bool = False,
                         mode: str = "full", compute_dtype=None,
                         remat: bool = False):
    """params: {'lidar_model': ..., 'uniplanner': ...}.

    batch keys: lidar (B,P,D), lidar_valid (B,P), heatmaps/sizemaps/orimaps
    (B,2,H,W), bev (B,H,W,Cbev) NHWC, ego_locs (B,T+1,2), cmds (B,),
    nxps (B,2), bras (B,), locs (B,N,T+1,2), oris (B,N), typs (B,N).
    """
    forward = make_distill_forward(cfg, v2=v2, mode=mode,
                                   compute_dtype=compute_dtype, remat=remat)

    def step(params, opt_state, batch, rng):
        (_, (bn_state, metrics)), grads = jax.value_and_grad(
            lambda p: forward(p, batch, rng), has_aux=True
        )(params)
        # gradient observability (the reference's wandb.watch surface,
        # logger.py:32-33) — one fused reduction, negligible cost
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_state(params, bn_state)
        return params, opt_state, metrics

    return step

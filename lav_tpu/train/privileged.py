"""Stage-1 trainers: privileged BEV planner, camera segmentation, brake.

Jitted train-step builders mirroring the reference trainer math
(/root/reference/lav/lav_privileged.py:95-197, lav_privileged_v2.py:111-150)
as pure functions: (params, opt_state, batch, rng) -> (params, opt_state,
metrics).  Data parallelism comes from calling the jitted step on
batch-sharded inputs + replicated params (lav_tpu.parallel) — XLA inserts
the gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from lav_tpu.config import LAVConfig
from lav_tpu.models import losses
from lav_tpu.models.planner import bev_planner_forward
from lav_tpu.models.rgb import brake_model_apply, seg_model_apply
from lav_tpu.utils.tree import merge_bn_state


def make_bev_loss_fn(cfg: LAVConfig, v2: bool = False):
    """The BEV teacher's loss composition as a standalone testable function
    (VERDICT r4 #3) — value-oracled against the reference's inline formulas
    (lav_privileged.py:113-123, lav_privileged_v2.py:131-140) in
    tests/test_oracle_losses.py.

    Returns loss_terms(out, batch, other_weight) -> (loss, metrics)."""
    bw = jnp.asarray(cfg.branch_weights) if cfg.branch_weights else None

    def loss_terms(out, batch, other_weight=1.0):
        ego_gt = batch["ego_locs"][:, 1:]
        cmds = batch["cmds"].astype(jnp.int32)

        if v2:
            idxs = batch["bras"] == 0
            plan_l = losses.plan_loss_all_cmds(
                out.ego_plan_locs, ego_gt, idxs=idxs,
                item_weights=None if bw is None else bw[cmds],
            )
            cmd_l = losses.cmd_bce(
                out.ego_cast_cmds, cmds, cfg.num_cmds, smooth=cfg.cmd_smooth
            )
            ow = other_weight if cfg.use_others_to_train else 0.0
        else:
            plan_l = losses.plan_loss_all_cmds(out.ego_plan_locs, ego_gt)
            cmd_l = losses.cmd_bce(out.ego_cast_cmds, cmds, cfg.num_cmds)
            ow = 1.0

        cast_l = losses.cast_loss_at_cmd(out.ego_cast_locs, ego_gt, cmds)
        other_l = losses.other_cast_loss_min_mode(
            out.other_cast_locs, out.other_locs, out.car_valid
        )
        loss = plan_l + cast_l + other_l * ow + cmd_l * cfg.cmd_weight
        metrics = dict(
            loss=loss, plan_loss=plan_l, ego_cast_loss=cast_l,
            other_cast_loss=other_l, cmd_loss=cmd_l,
        )
        return loss, metrics

    return loss_terms


def make_bev_train_step(cfg: LAVConfig, optimizer, v2: bool = False):
    """batch keys: bev (B,H,W,C) NHWC, ego_locs (B,T+1,2), cmds (B,), nxps
    (B,2), bras (B,), locs (B,N,T+1,2), oris (B,N), typs (B,N).

    v2 adds: brake-masked + branch-weighted plan loss, command label
    smoothing, and a ramped `other_weight` argument
    (lav_privileged_v2.py:111-140, train_bev_v2.py:36-37)."""

    loss_terms = make_bev_loss_fn(cfg, v2=v2)

    def step(params, opt_state, batch, rng, other_weight=1.0):
        def loss_fn(p):
            out, bn_state = bev_planner_forward(
                p, cfg, batch["bev"], batch["ego_locs"], batch["locs"],
                batch["oris"], batch["nxps"], batch["typs"], rng, train=True,
            )
            loss, metrics = loss_terms(out, batch, other_weight)
            return loss, (bn_state, metrics)

        (_, (bn_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # gradient observability (the reference's wandb.watch surface,
        # logger.py:32-33) — one fused reduction, negligible cost
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_state(params, bn_state)
        return params, opt_state, metrics

    return step


def make_seg_train_step(cfg: LAVConfig, optimizer):
    """batch: rgb (B,H,W,3) 0-255 float, sem (B,H,W) int labels
    (lav_privileged.py:142-164)."""

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, bn_state = seg_model_apply(p, batch["rgb"], True, rng)
            loss = losses.cross_entropy(logits, batch["sem"]).mean()
            return loss, (bn_state, dict(loss=loss))

        (_, (bn_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # gradient observability (the reference's wandb.watch surface,
        # logger.py:32-33) — one fused reduction, negligible cost
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_state(params, bn_state)
        return params, opt_state, metrics

    return step


def make_bra_train_step(cfg: LAVConfig, optimizer, version: int = 1):
    """batch: rgb (wide concat), tel_rgb, sem, tel_sem, bra
    (lav_privileged.py:167-197): brake BCE + 1/2 aux seg CE per stream."""

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            pred, sem1, sem2, bn_state = brake_model_apply(
                p, batch["rgb"], batch["tel_rgb"], True, with_mask=True,
                version=version,
            )
            bra = batch["bra"].astype(pred.dtype)
            loss = (
                losses.bce(pred, bra).mean()
                + 0.5 * losses.cross_entropy(sem1, batch["sem"]).mean()
                + 0.5 * losses.cross_entropy(sem2, batch["tel_sem"]).mean()
            )
            return loss, (bn_state, dict(loss=loss))

        (_, (bn_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # gradient observability (the reference's wandb.watch surface,
        # logger.py:32-33) — one fused reduction, negligible cost
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_state(params, bn_state)
        return params, opt_state, metrics

    return step


def step_lr(base_lr: float, steps_per_epoch: int, step_size_epochs: int,
            gamma: float = 0.5):
    """torch StepLR equivalent (lav_privileged.py:49)."""
    return optax.exponential_decay(
        base_lr,
        transition_steps=steps_per_epoch * step_size_epochs,
        decay_rate=gamma,
        staircase=True,
    )

"""Loss functions for detection, BEV segmentation, and motion planning.

Formula-level re-expression of /root/reference/lav/models/loss.py:5-100 and
the inline losses of lav_privileged.py:95-139 / lav_final.py:160-183, with
one structural change: every "ragged" reduction (selected cars, brake-free
frames) becomes a masked mean over fixed-capacity slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (stable form)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def bce(probs, targets, eps: float = 1e-12):
    """Elementwise BCE on probabilities (torch BCELoss clamps log at -100)."""
    log_p = jnp.maximum(jnp.log(probs + eps), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - probs + eps), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1p)


def smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    num = (x * m).sum(axis=axis)
    den = jnp.maximum(m.sum(axis=axis), 1.0)
    return num / den


def cross_entropy(logits, labels, axis: int = -1):
    """Integer-label cross entropy over `axis` (torch F.cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    onehot = jax.nn.one_hot(labels, logits.shape[axis], axis=axis,
                            dtype=logits.dtype)
    return -(onehot * logp).sum(axis=axis)


# ---------------------------------------------------------------------------
# detection (CenterNet-style, reference DetLoss loss.py:5-27)
# ---------------------------------------------------------------------------

def det_loss(pred_heatmaps, heatmaps, pred_sizemaps, sizemaps,
             pred_orimaps, orimaps):
    """All maps (B, 2, H, W); pred heatmaps are logits.

    Self-weighted heatmap BCE: p_det = sigmoid(pred * (1 - 2*target))
    emphasizes hard pixels; box/ori SmoothL1 weighted by the per-pixel class
    max of the GT heatmap.
    Returns (hm_loss, box_loss, ori_loss) scalars.
    """
    size_w = heatmaps.max(axis=1, keepdims=True)
    p_det = jax.nn.sigmoid(pred_heatmaps * (1.0 - 2.0 * heatmaps))
    hm = bce_with_logits(pred_heatmaps, heatmaps)
    hm_loss = (hm * p_det).mean() / p_det.mean()
    box_loss = (size_w * smooth_l1(pred_sizemaps, sizemaps)).mean() / size_w.mean()
    ori_loss = (size_w * smooth_l1(pred_orimaps, orimaps)).mean() / size_w.mean()
    return hm_loss, box_loss, ori_loss


# ---------------------------------------------------------------------------
# motion (reference MotLoss loss.py:40-100 + inline trainer losses)
# ---------------------------------------------------------------------------

def gather_cmd(locs, cmds):
    """locs (B, C, T, 2) gathered at per-item command -> (B, T, 2)."""
    return jnp.take_along_axis(
        locs, cmds[:, None, None, None].astype(jnp.int32), axis=1
    )[:, 0]


def plan_loss_all_cmds(ego_plan_locs, target, idxs=None, item_weights=None):
    """L1 between every iter x cmd plan and a single target trajectory,
    broadcast (reference lav_privileged.py:114; v2 variants weight each
    ITEM by branch_weights[its GT command], lav_privileged_v2.py:134 and
    lav_final_v2.py:196-201).

    ego_plan_locs (B, I, C, T, 2); target (B, T, 2); idxs optional (B,) bool
    mask (non-brake frames); item_weights optional (B,)."""
    err = jnp.abs(ego_plan_locs - target[:, None, None])  # (B, I, C, T, 2)
    per_item = err.mean(axis=(1, 2, 3, 4))
    if item_weights is not None:
        per_item = per_item * item_weights
    if idxs is None:
        return per_item.mean()
    return masked_mean(per_item, idxs)


def plan_loss_at_cmd(ego_plan_locs, target, cmds, idxs=None):
    """L1 of the command-indexed plan vs target (v2 distill,
    lav_final_v2.py:196-201). ego_plan_locs (B, I, C, T, 2);
    target (B, T, 2) or (B, I, T, 2)."""
    sel = jnp.take_along_axis(
        ego_plan_locs, cmds[:, None, None, None, None].astype(jnp.int32), axis=2
    )[:, :, 0]  # (B, I, T, 2)
    if target.ndim == 3:
        target = target[:, None]
    per_item = jnp.abs(sel - target).mean(axis=(1, 2, 3))
    if idxs is None:
        return per_item.mean()
    return masked_mean(per_item, idxs)


def cast_loss_at_cmd(ego_cast_locs, ego_gt, cmds):
    """L1 of the GT-command cast vs GT future (lav_privileged.py:116)."""
    sel = gather_cmd(ego_cast_locs, cmds)
    return jnp.abs(sel - ego_gt).mean()


def other_cast_loss_min_mode(other_cast_locs, other_gt, car_valid):
    """Min-over-commands L1, masked mean over valid car slots
    (lav_privileged.py:117-118 / MotLoss.others_forward).
    other_cast_locs (B, K, C, T, 2); other_gt (B, K, T, 2)."""
    err = jnp.abs(other_cast_locs - other_gt[:, :, None]).mean(axis=(3, 4))
    return masked_mean(err.min(axis=2), car_valid)


def distill_l1(student, expert, car_valid=None):
    """Plain L1 to (stop-gradient) expert outputs (lav_final.py:174-175)."""
    err = jnp.abs(student - jax.lax.stop_gradient(expert))
    if car_valid is None:
        return err.mean()
    axes = tuple(range(2, err.ndim))
    return masked_mean(err.mean(axis=axes), car_valid)


def cmd_bce(pred_cmds, cmds, num_cmds: int, smooth: float = 0.0):
    """BCE of per-command plausibility scores vs (smoothed) one-hot GT
    (lav_privileged.py:120 / MotLoss :64-65)."""
    onehot = jax.nn.one_hot(cmds, num_cmds, dtype=pred_cmds.dtype)
    target = (1.0 - smooth) * onehot + smooth / num_cmds
    return bce(pred_cmds, target).mean()


def cmd_distill_bce(pred_cmds, expert_cmds, car_valid=None):
    e = bce(pred_cmds, jax.lax.stop_gradient(expert_cmds))
    if car_valid is None:
        return e.mean()
    return masked_mean(e.mean(axis=-1), car_valid)

"""Value-level torch oracle for the loss formulas AND trainer compositions.

VERDICT r4 #3: model forwards were oracle-pinned but the loss math was only
tested qualitatively ("loss decreases") — a transposed weight or a wrong
mask denominator would have passed.  This file runs the reference's own
`DetLoss` class (/root/reference/lav/models/loss.py:5-27) and literal torch
transcriptions of the INLINE trainer loss compositions —
  lav_privileged.py:113-123    (v1 BEV teacher)
  lav_privileged_v2.py:131-140 (v2: branch weights, brake mask, smoothing)
  lav_final.py:160-183         (v1 distill)
  lav_final_v2.py:186-223      (v2: seg_mask gaussian, expert-plan target,
                                perception_weight; distill + non-distill)
— on identical random inputs against `lav_tpu.models.losses` and the
trainers' own composition functions (`make_bev_loss_fn`,
`make_distill_loss_fn`), asserting value parity at <=1e-5.

Ragged-vs-fixed-capacity note: the reference concatenates the selected
cars of a batch into one ragged rows axis; lav_tpu keeps (B, K) slots with
a car_valid mask.  Each oracle feeds torch exactly the valid rows, so the
masked means are checked against the reference's ragged means including
with some slots INVALID.

The reference's `MotLoss`/`SegLoss` classes are dead code (never
instantiated — only DetLoss is, lav_final.py:99); their formulas live on
in the inline compositions tested here.
"""

import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.dont_write_bytecode = True
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

from lav.models.loss import DetLoss  # noqa: E402

from lav_tpu.config import tiny_config  # noqa: E402
from lav_tpu.core.heatmap import build_seg_mask  # noqa: E402
from lav_tpu.models import losses  # noqa: E402
from lav_tpu.train.distill import make_distill_loss_fn  # noqa: E402
from lav_tpu.train.privileged import make_bev_loss_fn  # noqa: E402

TOL = dict(atol=1e-5, rtol=1e-5)


def _close(mine, ref):
    np.testing.assert_allclose(float(mine), float(ref), **TOL)


# ---------------------------------------------------------------------------
# shared synthetic planner outputs + batch
# ---------------------------------------------------------------------------

CFG = tiny_config(branch_weights=[5, 5, 5, 1, 1, 1])
B, K = 6, CFG.max_num_cars
I, C, T = CFG.num_plan_iter, CFG.num_cmds, CFG.num_plan
H, W = CFG.nx, CFG.ny  # seg/bev grid


def _rand(rng, *shape, lo=None, hi=None):
    if lo is not None:
        return rng.uniform(lo, hi, size=shape).astype(np.float32)
    return rng.normal(size=shape).astype(np.float32)


def _make_out_and_batch(seed=0):
    rng = np.random.default_rng(seed)
    # probabilities strictly inside (0,1): torch BCELoss has no eps
    probs = lambda *s: _rand(rng, *s, lo=0.02, hi=0.98)  # noqa: E731
    car_valid = np.ones((B, K), bool)
    car_valid[0, -1] = False  # exercise the masked means
    out = types.SimpleNamespace(
        ego_plan_locs=_rand(rng, B, I, C, T, 2),
        ego_cast_locs=_rand(rng, B, C, T, 2),
        ego_cast_cmds=probs(B, C),
        ego_cast_locs_expert=_rand(rng, B, C, T, 2),
        ego_plan_locs_expert=_rand(rng, B, I, C, T, 2),
        ego_locs=_rand(rng, B, T, 2),
        other_cast_locs=_rand(rng, B, K, C, T, 2),
        other_cast_locs_expert=_rand(rng, B, K, C, T, 2),
        other_cast_cmds=probs(B, K, C),
        other_cast_cmds_expert=probs(B, K, C),
        other_locs=_rand(rng, B, K, T, 2),
        car_valid=car_valid,
    )
    cmds = rng.integers(0, C, size=B).astype(np.int64)
    bras = np.array([0, 1, 0, 0, 1, 0], np.int64)  # brake mask with both values
    batch = dict(
        ego_locs=_rand(rng, B, T + 1, 2),
        cmds=cmds,
        bras=bras,
        heatmaps=probs(B, 2, 8, 8),
        sizemaps=_rand(rng, B, 2, 8, 8),
        orimaps=_rand(rng, B, 2, 8, 8),
        bev=probs(B, H, W, 5),
    )
    preds = (
        _rand(rng, B, 2, 8, 8),          # heatmap logits
        _rand(rng, B, 2, 8, 8),          # sizemap
        _rand(rng, B, 2, 8, 8),          # orimap
        probs(B, 3, H, W),               # pred_bev probabilities
    )
    return out, batch, preds


def _t(x):
    return torch.tensor(np.asarray(x))


def _gather_cmd_t(locs, cmds):
    """The reference's gather idiom: locs (B,C,T,2) at cmds (B,) -> (B,T,2)
    (lav_privileged.py:116 etc.)."""
    T_ = locs.shape[2]
    return locs.gather(
        1, cmds.expand(T_, 2, 1, -1).permute(3, 2, 0, 1)
    ).squeeze(1)


def _valid_rows(x, valid):
    """Flatten (B,K,...) slot tensors to the reference's ragged rows."""
    return _t(x).reshape((-1,) + x.shape[2:])[_t(valid).reshape(-1)]


# ---------------------------------------------------------------------------
# DetLoss (the one loss class the reference instantiates)
# ---------------------------------------------------------------------------

def test_det_loss_oracle():
    _, batch, preds = _make_out_and_batch()
    hm_p, size_p, ori_p, _ = preds
    ref = DetLoss()(
        _t(hm_p), _t(batch["heatmaps"]),
        _t(size_p), _t(batch["sizemaps"]),
        _t(ori_p), _t(batch["orimaps"]),
    )
    mine = losses.det_loss(
        jnp.asarray(hm_p), jnp.asarray(batch["heatmaps"]),
        jnp.asarray(size_p), jnp.asarray(batch["sizemaps"]),
        jnp.asarray(ori_p), jnp.asarray(batch["orimaps"]),
    )
    for m, r in zip(mine, ref):
        _close(m, r)


def test_seg_mask_oracle():
    """core/heatmap.py::build_seg_mask vs lav_final_v2.py:261-271 (with the
    bev_center formula of lav_final.py:93-96)."""
    cx = W / 2.0 + (CFG.min_y + CFG.max_y) / 2.0 * CFG.pixels_per_meter
    cy = H / 2.0 + (CFG.min_x + CFG.max_x) / 2.0 * CFG.pixels_per_meter
    x = torch.arange(W)
    y = torch.arange(H)
    gx = (-((x[:, None] - cx) / 240.0) ** 2).exp()
    gy = (-((y[:, None] - cy) / 240.0) ** 2).exp()
    ref, _ = (gx[None] * gy[:, None]).max(dim=-1)
    mine = build_seg_mask(H, W, cx, cy)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), **TOL)


# ---------------------------------------------------------------------------
# v1 BEV teacher composition (lav_privileged.py:113-123)
# ---------------------------------------------------------------------------

def test_bev_v1_composition_oracle():
    cfg = CFG.replace(branch_weights=None)
    out, batch, _ = _make_out_and_batch(1)
    loss, m = make_bev_loss_fn(cfg, v2=False)(out, batch)

    ego_gt = _t(batch["ego_locs"])[:, 1:]
    cmds = _t(batch["cmds"])
    plan_ref = F.l1_loss(
        _t(out.ego_plan_locs),
        ego_gt[:, None, None].repeat(1, I, C, 1, 1),
    )
    cast_ref = F.l1_loss(_gather_cmd_t(_t(out.ego_cast_locs), cmds), ego_gt)
    o_cast = _valid_rows(out.other_cast_locs, out.car_valid)
    o_next = _valid_rows(out.other_locs, out.car_valid)
    other_ref = F.l1_loss(
        o_cast, o_next[:, None].repeat(1, C, 1, 1), reduction="none"
    ).mean(dim=[2, 3]).min(1)[0].mean()
    cmd_ref = F.binary_cross_entropy(
        _t(out.ego_cast_cmds), F.one_hot(cmds, C).float()
    )
    _close(m["plan_loss"], plan_ref)
    _close(m["ego_cast_loss"], cast_ref)
    _close(m["other_cast_loss"], other_ref)
    _close(m["cmd_loss"], cmd_ref)
    _close(loss, plan_ref + cast_ref + other_ref * 1.0
           + cmd_ref * cfg.cmd_weight)


# ---------------------------------------------------------------------------
# v2 BEV teacher composition (lav_privileged_v2.py:131-140)
# ---------------------------------------------------------------------------

def test_bev_v2_composition_oracle():
    out, batch, _ = _make_out_and_batch(2)
    other_weight = 0.37
    loss, m = make_bev_loss_fn(CFG, v2=True)(out, batch, other_weight)

    ego_gt = _t(batch["ego_locs"])[:, 1:]
    cmds = _t(batch["cmds"])
    idxs = (1 - _t(batch["bras"])).bool()
    bw = torch.tensor(CFG.branch_weights).float()
    plan_ref = torch.mean(
        F.l1_loss(
            _t(out.ego_plan_locs),
            ego_gt[:, None, None].repeat(1, I, C, 1, 1),
            reduction="none",
        ).mean(dim=[1, 2, 3, 4])[idxs] * bw[cmds[idxs]]
    )
    cast_ref = F.l1_loss(
        _gather_cmd_t(_t(out.ego_cast_locs), cmds), ego_gt,
        reduction="none",
    ).mean(dim=[1, 2]).mean()
    o_cast = _valid_rows(out.other_cast_locs, out.car_valid)
    o_next = _valid_rows(out.other_locs, out.car_valid)
    other_ref = F.l1_loss(
        o_cast, o_next[:, None].repeat(1, C, 1, 1), reduction="none"
    ).mean(dim=[2, 3]).min(1)[0].mean()
    cmd_ref = F.binary_cross_entropy(
        _t(out.ego_cast_cmds),
        (1.0 - CFG.cmd_smooth) * F.one_hot(cmds, C) + CFG.cmd_smooth / C,
    )
    _close(m["plan_loss"], plan_ref)
    _close(m["ego_cast_loss"], cast_ref)
    _close(m["other_cast_loss"], other_ref)
    _close(m["cmd_loss"], cmd_ref)
    _close(loss, plan_ref + cast_ref + other_ref * other_weight
           + cmd_ref * CFG.cmd_weight)


# ---------------------------------------------------------------------------
# v1 distillation composition (lav_final.py:160-183)
# ---------------------------------------------------------------------------

def _det_seg_ref(cfg, preds, batch, seg_ch, seg_mask=None):
    hm_p, size_p, ori_p, bev_p = preds
    hm_l, box_l, ori_l = DetLoss()(
        _t(hm_p), _t(batch["heatmaps"]),
        _t(size_p), _t(batch["sizemaps"]),
        _t(ori_p), _t(batch["orimaps"]),
    )
    det_ref = hm_l + cfg.box_weight * box_l + cfg.ori_weight * ori_l
    # reference bev is NCHW; lav_tpu's is NHWC of the same values
    seg_bev = _t(batch["bev"]).permute(0, 3, 1, 2)[:, list(seg_ch)]
    seg_bce = F.binary_cross_entropy(_t(bev_p), seg_bev, reduction="none")
    if seg_mask is not None:
        seg_ref = torch.mean(seg_bce * seg_mask) * cfg.seg_weight
    else:
        seg_ref = seg_bce.mean() * cfg.seg_weight
    return det_ref, seg_ref


def test_distill_v1_composition_oracle():
    cfg = CFG.replace(branch_weights=None)  # v1 has no branch weights
    out, batch, preds = _make_out_and_batch(3)
    loss, m = make_distill_loss_fn(cfg, v2=False, mode="full")(
        preds, out, batch)

    det_ref, seg_ref = _det_seg_ref(cfg, preds, batch, (0, 3, 4))
    # v1 plan target: the RAW batch ego future (lav_final.py:172 — NOT the
    # planner's jittered frame; quirk kept for parity)
    plan_ref = F.l1_loss(
        _t(out.ego_plan_locs),
        _t(batch["ego_locs"])[:, 1:][:, None, None].repeat(1, I, C, 1, 1),
    )
    cast_ref = F.l1_loss(_t(out.ego_cast_locs), _t(out.ego_cast_locs_expert))
    other_ref = F.l1_loss(
        _valid_rows(out.other_cast_locs, out.car_valid),
        _valid_rows(out.other_cast_locs_expert, out.car_valid),
    )
    cmd_ref = F.binary_cross_entropy(
        _valid_rows(out.other_cast_cmds, out.car_valid),
        _valid_rows(out.other_cast_cmds_expert, out.car_valid),
    )
    mot_ref = (plan_ref + cast_ref + other_ref * cfg.other_weight
               + cmd_ref * cfg.cmd_weight)
    _close(m["seg_loss"], seg_ref)
    _close(m["plan_loss"], plan_ref)
    _close(m["ego_cast_loss"], cast_ref)
    _close(m["other_cast_loss"], other_ref)
    _close(m["cmd_loss"], cmd_ref)
    _close(loss, mot_ref + det_ref + seg_ref)

    # --perceive-only (lav_final.py:181)
    loss_p, _ = make_distill_loss_fn(cfg, v2=False, mode="perceive_only")(
        preds, out, batch)
    _close(loss_p, det_ref + seg_ref)


# ---------------------------------------------------------------------------
# v2 distillation composition (lav_final_v2.py:186-223)
# ---------------------------------------------------------------------------

def _seg_mask_ref():
    cx = W / 2.0 + (CFG.min_y + CFG.max_y) / 2.0 * CFG.pixels_per_meter
    cy = H / 2.0 + (CFG.min_x + CFG.max_x) / 2.0 * CFG.pixels_per_meter
    x = torch.arange(W)
    y = torch.arange(H)
    gx = (-((x[:, None] - cx) / 240.0) ** 2).exp()
    gy = (-((y[:, None] - cy) / 240.0) ** 2).exp()
    return (gx[None] * gy[:, None]).max(dim=-1)[0]


def _plan_ref_v2(out, cmds):
    bw = torch.tensor(CFG.branch_weights).float()
    expert_sel = _gather_cmd_t(_t(out.ego_plan_locs_expert)[:, -1], cmds)
    return torch.mean(
        F.l1_loss(
            _t(out.ego_plan_locs),
            expert_sel[:, None, None].repeat(1, I, C, 1, 1),
            reduction="none",
        ).mean(dim=[1, 2, 3, 4]) * bw[cmds]
    )


def test_distill_v2_composition_oracle():
    out, batch, preds = _make_out_and_batch(4)
    loss, m = make_distill_loss_fn(CFG, v2=True, mode="full")(
        preds, out, batch)

    cmds = _t(batch["cmds"])
    det_ref, seg_ref = _det_seg_ref(CFG, preds, batch, (0, 1, 2),
                                    seg_mask=_seg_mask_ref())
    plan_ref = _plan_ref_v2(out, cmds)
    cast_ref = F.l1_loss(_t(out.ego_cast_locs), _t(out.ego_cast_locs_expert))
    other_ref = F.l1_loss(
        _valid_rows(out.other_cast_locs, out.car_valid),
        _valid_rows(out.other_cast_locs_expert, out.car_valid),
    )
    cmd_ref = F.binary_cross_entropy(
        _valid_rows(out.other_cast_cmds, out.car_valid),
        _valid_rows(out.other_cast_cmds_expert, out.car_valid),
    )
    mot_ref = (plan_ref + cast_ref + other_ref * CFG.other_weight
               + cmd_ref * CFG.cmd_weight)
    _close(m["seg_loss"], seg_ref)
    _close(m["plan_loss"], plan_ref)
    _close(loss, mot_ref + (det_ref + seg_ref) * CFG.perception_weight)

    # --motion-only (lav_final_v2.py:217-218)
    loss_m, _ = make_distill_loss_fn(CFG, v2=True, mode="motion_only")(
        preds, out, batch)
    _close(loss_m, mot_ref)


def test_distill_v2_nondistill_branch_oracle():
    """The v2 trainer's distill=False branch (lav_final_v2.py:208-213):
    brake-masked GT-command cast loss, min-mode others, smoothed cmd BCE."""
    cfg = CFG.replace(distill=False)
    out, batch, preds = _make_out_and_batch(5)
    loss, m = make_distill_loss_fn(cfg, v2=True, mode="motion_only")(
        preds, out, batch)

    cmds = _t(batch["cmds"])
    idxs = (1 - _t(batch["bras"])).bool()
    plan_ref = _plan_ref_v2(out, cmds)
    cast_ref = F.l1_loss(
        _gather_cmd_t(_t(out.ego_cast_locs), cmds),
        _t(batch["ego_locs"])[:, 1:], reduction="none",
    ).mean(dim=[1, 2])[idxs].mean()
    o_cast = _valid_rows(out.other_cast_locs, out.car_valid)
    o_next = _valid_rows(out.other_locs, out.car_valid)
    other_ref = F.l1_loss(
        o_cast, o_next[:, None].repeat(1, C, 1, 1), reduction="none"
    ).mean(dim=[2, 3]).min(1)[0].mean()
    cmd_ref = F.binary_cross_entropy(
        _t(out.ego_cast_cmds),
        (1.0 - cfg.cmd_smooth) * F.one_hot(cmds, C) + cfg.cmd_smooth / C,
    )
    _close(m["ego_cast_loss"], cast_ref)
    _close(m["other_cast_loss"], other_ref)
    _close(m["cmd_loss"], cmd_ref)
    _close(loss, plan_ref + cast_ref + other_ref * cfg.other_weight
           + cmd_ref * cfg.cmd_weight)

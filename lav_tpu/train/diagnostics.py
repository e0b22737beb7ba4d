"""Train-time inference probes: eval-mode detection + planning on sample 0.

The reference re-runs inference on the first batch item at every logging
step (lav_final.py:190-198, 240-273 `det_inference`/`mot_inference`) as an
inline integration check; these jitted probes reproduce that, returning
fixed-shape arrays for the diagnostic figure builders
(lav_tpu.utils.figures.det_panel / bev_panel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lav_tpu.config import LAVConfig
from lav_tpu.models.lidar import lidar_model_apply
from lav_tpu.models.planner import bev_planner_infer, uniplanner_infer
from lav_tpu.ops.peak import det_inference


def make_lidar_probe(cfg: LAVConfig):
    """(params, lidar (P,D), valid (P,), cmd, nxp) -> dict of detections +
    plans, all eval-mode (mirrors mot_inference)."""

    lidar_kw = dict(
        min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y, max_y=cfg.max_y,
        pixels_per_meter=cfg.pixels_per_meter, num_features=cfg.num_features,
    )

    @jax.jit
    def probe(params, lidar, valid, cmd, nxp):
        feats, hm, size, ori, bev, _ = lidar_model_apply(
            params["lidar_model"], lidar[None], valid[None], train=False,
            **lidar_kw,
        )
        H, W = cfg.ny, cfg.nx
        ego_px = jnp.array([W / 2.0, H / 2.0 + cfg.y_offset * H / 2.0])
        dets = det_inference(
            jax.nn.sigmoid(hm[0]), size[0], ori[0],
            pixels_per_meter=cfg.pixels_per_meter, max_det=cfg.max_det,
            min_score=0.2, ego_xy=ego_px,
        )
        veh = {k: v[1] for k, v in dets._asdict().items()}
        plan, cast_cmd, other_locs, other_cmds, other_valid = uniplanner_infer(
            params["uniplanner"], cfg, feats[0], veh, cmd, nxp
        )
        return dict(
            dets={k: v for k, v in dets._asdict().items()},
            pred_bev=bev[0],
            ego_plan_locs=plan,
            other_cast_locs=other_locs,
            other_cast_cmds=other_cmds,
            other_valid=other_valid,
        )

    return probe


def make_bev_probe(cfg: LAVConfig):
    """(params, bev (H,W,C), nxp) -> teacher plan/cast diagnostics."""

    @jax.jit
    def probe(params, bev, nxp):
        plan, cast_locs, cmds = bev_planner_infer(
            params, cfg, bev[None], nxp[None]
        )
        return dict(
            ego_plan_locs=plan[0, -1],
            ego_cast_locs=cast_locs[0],
            ego_cast_cmds=cmds[0],
        )

    return probe

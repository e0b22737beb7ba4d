"""The fused closed-loop driving agent: one jittable step function.

This is the TPU-native redesign of the reference's Python agent tick
(/root/reference/team_code_v2/lav_agent.py:198-357 and its TorchScript
"fast" variant lav_agent_fast.py / model_inference.py): camera segmentation,
on-device point painting, temporal lidar stacking from an HBM-resident ring
buffer, PointPillars perception, masked peak detection, multi-modal
cast/plan, EKF, PID, and every safety override — all inside ONE `jax.jit`
step with static shapes.  The whole step can be vmapped over an ego axis
for batched multi-ego evaluation and sharded over a device mesh.

Host-side responsibilities (not compute): route following (Waypointer /
RoutePlanner in lav_tpu.agent.route) supplies the command integer and the
world-frame target vector.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lav_tpu.config import LAVConfig
from lav_tpu.agent.control import pid_control, plan_collide
from lav_tpu.agent.ekf import (
    EKFState, ekf_init_state, ekf_make, ekf_predict_update,
)
from lav_tpu.agent.pid import pid_init, pid_make
from lav_tpu.core.geometry import move_lidar_points, _apply_rot2
from lav_tpu.models.lidar import lidar_model_apply
from lav_tpu.models.planner import uniplanner_infer
from lav_tpu.models.rgb import seg_model_apply, brake_model_apply
from lav_tpu.ops.painting import CameraRig, point_painting
from lav_tpu.ops.peak import det_inference

NUM_REPEAT = 4
GAP = NUM_REPEAT + 1  # subsample every 5th frame into the stack


class AgentState(NamedTuple):
    """All per-ego mutable state, carried through the jitted step."""
    ekf: EKFState
    lidar_buf: jnp.ndarray     # (F, Pb, Df) fused painted sweeps
    lidar_valid: jnp.ndarray   # (F, Pb) bool
    locs_buf: jnp.ndarray      # (F, 2) EKF position at each buffered sweep
    oris_buf: jnp.ndarray      # (F,)
    buf_ptr: jnp.ndarray       # () int32 — next write slot
    buf_count: jnp.ndarray     # () int32 — sweeps pushed so far (saturating)
    prev_lidar: jnp.ndarray    # (P, 4) previous raw sweep
    prev_valid: jnp.ndarray    # (P,)
    turn_window: jnp.ndarray   # (turn_n,)
    speed_window: jnp.ndarray  # (speed_n,)
    stop_counter: jnp.ndarray  # () int32
    force_move: jnp.ndarray    # () int32
    lane_change_counter: jnp.ndarray  # () int32
    lane_changed: jnp.ndarray  # () int32, -1 = none
    num_frames: jnp.ndarray    # () int32


class Control(NamedTuple):
    steer: jnp.ndarray
    throttle: jnp.ndarray
    brake: jnp.ndarray


def _per_cmd(val, num_cmds: int):
    arr = np.asarray(val, dtype=np.float32)
    if arr.ndim == 0:
        arr = np.full((num_cmds,), float(arr), np.float32)
    return arr


def build_agent(cfg: LAVConfig, *, max_points: int = 0,
                camera_yaws=(-60, 0, 60), rgb_hw=(288, 256), cam_fov=64,
                compute_dtype=None, skip=(), use_pallas: bool = False,
                det_override: bool = False):
    """Returns (init_state, step) for the fused agent.

    max_points: raw per-sweep point capacity (default: cfg-derived).
    compute_dtype: optional dtype (e.g. jnp.bfloat16) for the heavy conv
    paths (segmentation, brake, pillars/backbone, planner crops+resnet);
    geometry, EKF, PID, GRU rollouts and control stay f32.  Default f32
    for exact reference parity.
    skip: diagnostic-only set of stage names ('seg', 'paint', 'brake',
    'lidar', 'planner', 'stack') replaced by cheap dummies — for isolating
    per-stage cost inside the COMPILED full graph (scheduling differs from
    stages timed standalone).  Never use in deployment.
    det_override: detections come from caller-supplied ground-truth maps
    instead of the detection heads — the reference ships the same option
    commented into mot_inference ("Comment this to use predicted
    detections", lav_final_v2.py:228-231 / lav_final.py:195-197); the
    route-replay evaluator uses it to drive the planner/collision stack
    with scripted traffic.  Adds obs keys det_heatmaps (2, H, W)
    probabilities, det_sizemaps / det_orimaps (2, H, W).  The camera and
    lidar nets still run (the planner consumes their features).
    step(params, state, obs) -> (Control, AgentState, aux dict); params is
    {'lidar_model', 'uniplanner', 'seg_model', 'bra_model'}.
    obs per tick:
      lidar (P, 4) padded raw sweep, lidar_valid (P,) bool
      rgbs (num_cams, H, W, 3) float 0-255, tel_rgb (Ht, Wt, 3)
      gps (2,) lat/lon, compass () rad, speed () m/s
      cmd () int32 model command, target (2,) world-frame vector to goal
    """
    cdt = compute_dtype or jnp.float32
    num_stack = cfg.num_frame_stack + 1
    num_keep = num_stack * GAP if cfg.num_frame_stack > 0 else 1
    P = max_points or (cfg.max_lidar_points // max(num_stack, 2))
    Pb = 2 * P  # fused = current + previous sweep
    n_sem = len(cfg.seg_channels)
    Df = 4 + n_sem  # xyzr + painted classes
    ekf_consts = ekf_make(cos0=1.0, freq=cfg.fps)

    rigs = tuple(
        CameraRig.build(yaw, lidar_xyz=(0, 0, cfg.camera_z),
                        cam_xyz=(cfg.camera_x, 0, cfg.camera_z),
                        rgb_h=rgb_hw[0], rgb_w=rgb_hw[1], fov=cam_fov)
        for yaw in camera_yaws
    )

    ctl = dict(
        turn_pid=pid_make(cfg.turn_KP, cfg.turn_KI, cfg.turn_KD, cfg.turn_n),
        speed_pid=pid_make(cfg.speed_KP, cfg.speed_KI, cfg.speed_KD, cfg.speed_n),
        aim_point=jnp.asarray(_per_cmd(cfg.aim_point, cfg.num_cmds), jnp.int32),
        speed_ratio=jnp.asarray(_per_cmd(cfg.speed_ratio, cfg.num_cmds)),
        pixels_per_meter=float(cfg.pixels_per_meter),
        brake_speed=cfg.brake_speed,
        clip_delta=cfg.clip_delta,
        max_throttle=cfg.max_throttle,
    )

    def init_state() -> AgentState:
        return AgentState(
            ekf=ekf_init_state(),
            lidar_buf=jnp.zeros((num_keep, Pb, Df)),
            lidar_valid=jnp.zeros((num_keep, Pb), bool),
            locs_buf=jnp.zeros((num_keep, 2)),
            oris_buf=jnp.zeros((num_keep,)),
            buf_ptr=jnp.array(0, jnp.int32),
            buf_count=jnp.array(0, jnp.int32),
            prev_lidar=jnp.zeros((P, 4)),
            prev_valid=jnp.zeros((P,), bool),
            turn_window=pid_init(cfg.turn_n),
            speed_window=pid_init(cfg.speed_n),
            stop_counter=jnp.array(0, jnp.int32),
            force_move=jnp.array(0, jnp.int32),
            lane_change_counter=jnp.array(0, jnp.int32),
            lane_changed=jnp.array(-1, jnp.int32),
            num_frames=jnp.array(0, jnp.int32),
        )

    def _ego_hull_mask(pts):
        """Drop returns from the ego vehicle body (lav_agent.py:448-457)."""
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        hull = (x > -2.4) & (x < 0) & (y > -0.8) & (y < 0.8) & (z > -1.5) & (z < -1)
        return ~hull

    def _stacked_lidar(state, loc0, ori0):
        """Re-register `num_stack` buffered sweeps into the current ego frame
        and tag them with one-hot age channels (lav_agent.py:360-380)."""
        sweeps, valids = [], []
        for i in range(num_stack):
            idx = jnp.mod(state.buf_ptr - 1 - i * GAP, num_keep)
            sweep = state.lidar_buf[idx]
            svalid = state.lidar_valid[idx] & ((i * GAP) < state.buf_count)
            loc, ori = state.locs_buf[idx], state.oris_buf[idx]
            xyz = move_lidar_points(sweep[:, :3], loc - loc0, ori0, ori)
            if cfg.num_frame_stack > 0:
                age = jnp.zeros((Pb, num_stack)).at[:, i].set(1.0)
                sweep = jnp.concatenate([xyz, sweep[:, 3:], age], axis=-1)
            else:
                sweep = jnp.concatenate([xyz, sweep[:, 3:]], axis=-1)
            sweeps.append(sweep)
            valids.append(svalid)
        return jnp.concatenate(sweeps, 0), jnp.concatenate(valids, 0)

    def step(params, state: AgentState, obs) -> Tuple[Control, AgentState, Dict]:
        num_frames = state.num_frames + 1

        compass = jnp.where(jnp.isnan(obs["compass"]), 0.0, obs["compass"])
        ori_meas = compass - math.pi / 2
        spd = obs["speed"]

        # EKF: first tick latches the measurement; afterwards the filter ran
        # a predict-update at the END of the previous tick, so reading .x
        # here matches the reference order (lav_agent.py:213-217, 335).
        ekf0 = jax.lax.cond(
            state.ekf.initialized,
            lambda: state.ekf,
            lambda: ekf_predict_update(
                ekf_consts, state.ekf, spd, 0.0, obs["gps"][0], obs["gps"][1],
                ori_meas,
            ),
        )
        loc, ori = ekf0.x[:2], ekf0.x[2]

        stop_counter = jnp.where(spd < 0.1, state.stop_counter + 1, 0)

        # ---- lidar fuse + paint -------------------------------------------
        raw = obs["lidar"]
        raw_valid = obs["lidar_valid"] & _ego_hull_mask(raw)
        fused = jnp.concatenate([raw, state.prev_lidar], axis=0)      # (Pb, 4)
        fused_valid = jnp.concatenate(
            [raw_valid, state.prev_valid & _ego_hull_mask(state.prev_lidar)], 0
        )

        if "seg" in skip:
            pred_sem = jnp.zeros((len(camera_yaws), *rgb_hw, n_sem))
        else:
            seg_logits, _ = seg_model_apply(
                params["seg_model"], obs["rgbs"].astype(cdt), False
            )
            sem_prob = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
            # softmax stays f32 (precision); the painted FEATURES are
            # ordinary activations — carry them in the compute dtype so
            # the painting gather and the ring buffer row don't run f32
            pred_sem = (sem_prob[..., 1:]
                        * (1.0 - sem_prob[..., :1])).astype(cdt)
        if "paint" in skip:
            painted = jnp.zeros((Pb, n_sem))
        else:
            painted = point_painting(
                fused[:, :3], pred_sem, rigs, valid=fused_valid
            )
        fused_painted = jnp.concatenate([fused, painted], axis=-1)    # (Pb, Df)

        # ---- ring buffer push (skipped on the very first frame, matching
        # the reference's early return, lav_agent.py:224-226) ---------------
        push = num_frames >= 2
        ptr = state.buf_ptr
        lidar_buf = state.lidar_buf.at[ptr].set(
            jnp.where(push, fused_painted, state.lidar_buf[ptr])
        )
        lidar_valid = state.lidar_valid.at[ptr].set(
            jnp.where(push, fused_valid, state.lidar_valid[ptr])
        )
        locs_buf = state.locs_buf.at[ptr].set(
            jnp.where(push, loc, state.locs_buf[ptr])
        )
        oris_buf = state.oris_buf.at[ptr].set(
            jnp.where(push, ori, state.oris_buf[ptr])
        )
        new_ptr = jnp.where(push, jnp.mod(ptr + 1, num_keep), ptr)
        new_count = jnp.where(
            push, jnp.minimum(state.buf_count + 1, num_keep), state.buf_count
        )

        tmp_state = state._replace(
            lidar_buf=lidar_buf, lidar_valid=lidar_valid,
            locs_buf=locs_buf, oris_buf=oris_buf,
            buf_ptr=new_ptr, buf_count=new_count,
        )
        if "stack" in skip:
            D_st = Df + (num_stack if cfg.num_frame_stack > 0 else 0)
            stacked = jnp.zeros((Pb * num_stack, D_st))
            stacked_valid = jnp.ones((Pb * num_stack,), bool)
        else:
            stacked, stacked_valid = _stacked_lidar(tmp_state, loc, ori)

        # ---- command + lane-change suppression ----------------------------
        cmd = obs["cmd"].astype(jnp.int32)
        is_lc = (cmd == 4) | (cmd == 5)
        lcc = jnp.where(
            is_lc & (state.lane_changed != -1) & (cmd != state.lane_changed),
            0, state.lane_change_counter,
        )
        lcc = jnp.where(is_lc, lcc + 1, 0)
        lane_changed = jnp.where(is_lc & (lcc > 300), cmd, -1)
        cmd_eff = jnp.where(cmd == lane_changed, 3, cmd)

        # target vector world -> ego (lav_agent.py:299,309: rotate by
        # theta = -compass + pi/2, then negate).  _apply_rot2(x,y,c,s) is the
        # CCW rotation (c x - s y, s x + c y).
        theta = -compass + math.pi / 2
        tx, ty = _apply_rot2(
            obs["target"][0], obs["target"][1], jnp.cos(theta), jnp.sin(theta)
        )
        nxp = jnp.stack([-tx, -ty])

        # ---- brake net -----------------------------------------------------
        if "brake" in skip:
            pred_bra = jnp.zeros(())
        else:
            ncams = obs["rgbs"].shape[0]
            wide = jnp.concatenate(
                [obs["rgbs"][i] for i in range(ncams)], axis=1
            )
            pred_bra, _ = brake_model_apply(
                params["bra_model"], wide[None].astype(cdt),
                obs["tel_rgb"][None].astype(cdt), False,
                version=2 if cfg.num_frame_stack > 0 else 1,
            )
            pred_bra = pred_bra[0].astype(jnp.float32)

        # ---- perception + planning ----------------------------------------
        if "lidar" in skip:
            feats = jnp.zeros(
                (1, cfg.ny // 2, cfg.nx // 2, 6 * cfg.num_features[-1]), cdt
            )
            hm = jnp.zeros((1, 2, cfg.ny, cfg.nx))
            size = jnp.ones((1, 2, cfg.ny, cfg.nx))
            orim = jnp.ones((1, 2, cfg.ny, cfg.nx))
            bev = jnp.zeros((1, 3, cfg.ny, cfg.nx))
        else:
            feats, hm, size, orim, bev, _ = lidar_model_apply(
                params["lidar_model"], stacked[None].astype(cdt),
                stacked_valid[None],
                min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y,
                max_y=cfg.max_y,
                pixels_per_meter=cfg.pixels_per_meter,
                num_features=cfg.num_features, train=False,
                use_pallas=use_pallas,
            )
            hm = hm.astype(jnp.float32)
            size = size.astype(jnp.float32)
            orim = orim.astype(jnp.float32)
        H, W = cfg.ny, cfg.nx
        ego_px = jnp.array([W / 2.0, H / 2.0 + cfg.y_offset * H / 2.0])
        if det_override:
            # GT maps are already probabilities — the reference feeds them
            # unsigmoided too (gt_det, lav_final_v2.py:233)
            hm_in, size_in, ori_in = (obs["det_heatmaps"],
                                      obs["det_sizemaps"],
                                      obs["det_orimaps"])
        else:
            hm_in, size_in, ori_in = jax.nn.sigmoid(hm[0]), size[0], orim[0]
        dets = det_inference(
            hm_in, size_in, ori_in,
            pixels_per_meter=cfg.pixels_per_meter,
            max_det=cfg.max_det, min_score=cfg.det_min_score,
            ego_xy=ego_px, ego_exclusion_px=2.0,
        )
        veh = {k: v[1] for k, v in dets._asdict().items()}  # class 1 = vehicles

        if "planner" in skip:
            T, C, K = cfg.num_plan, cfg.num_cmds, cfg.max_det
            ego_plan_locs = jnp.zeros((T, 2))
            ego_cast_cmd_locs = jnp.zeros((T, 2))
            other_cast_locs = jnp.zeros((K, C, T, 2))
            other_cast_cmds = jnp.zeros((K, C))
            other_valid = jnp.zeros((K,), bool)
        else:
            ego_plan_locs, ego_cast_cmd_locs, other_cast_locs, \
                other_cast_cmds, other_valid = uniplanner_infer(
                    params["uniplanner"], cfg, feats[0], veh, cmd_eff, nxp
                )
        ego_plan_locs = ego_plan_locs.astype(jnp.float32)
        ego_cast_cmd_locs = ego_cast_cmd_locs.astype(jnp.float32)
        other_cast_locs = other_cast_locs.astype(jnp.float32)
        other_cast_cmds = other_cast_cmds.astype(jnp.float32)

        # lane-change commands drive on the raw cast (lav_agent.py:327-328)
        plan_wps = jnp.where(
            (cmd_eff == 4) | (cmd_eff == 5), ego_cast_cmd_locs, ego_plan_locs
        )

        # ---- control --------------------------------------------------------
        steer, throttle, brake_b, turn_w, speed_w = pid_control(
            ctl, state.turn_window, state.speed_window, plan_wps, spd, cmd_eff
        )
        plan_nan = jnp.isnan(plan_wps).any()
        steer = jnp.where(plan_nan, 0.0, steer)
        throttle = jnp.where(plan_nan, 0.0, throttle)
        brake = jnp.where(plan_nan, 0.0, brake_b.astype(jnp.float32))

        # EKF predict-update with this tick's steer (lav_agent.py:335)
        ekf1 = ekf_predict_update(
            ekf_consts, ekf0, spd, steer, obs["gps"][0], obs["gps"][1], ori_meas
        )

        # ---- overrides ------------------------------------------------------
        collide = plan_collide(
            plan_wps, other_cast_locs, other_cast_cmds, other_valid,
            pixels_per_meter=cfg.pixels_per_meter, cmd_thresh=cfg.cmd_thresh,
            brake_speed=cfg.brake_speed,
            dist_threshold_static=cfg.collide_dist_static,
            dist_threshold_moving=cfg.collide_dist_moving,
        )
        hard_brake = (pred_bra > cfg.brake_net_thresh) | collide
        throttle = jnp.where(hard_brake, 0.0, throttle)
        brake = jnp.where(hard_brake, 1.0, brake)
        throttle = jnp.where(spd * 3.6 > cfg.max_speed, 0.0, throttle)

        force_move = jnp.where(stop_counter >= 600, 20, state.force_move)
        throttle = jnp.where(force_move > 0, jnp.maximum(0.4, throttle), throttle)
        brake = jnp.where(force_move > 0, 0.0, brake)
        force_move = jnp.maximum(force_move - 1, 0)

        # first frame: no control (reference early return, lav_agent.py:224)
        first = num_frames <= 1
        steer = jnp.where(first, 0.0, steer)
        throttle = jnp.where(first, 0.0, throttle)
        brake = jnp.where(first, 0.0, brake)

        new_state = tmp_state._replace(
            ekf=ekf1,
            prev_lidar=raw,
            prev_valid=obs["lidar_valid"],
            turn_window=turn_w,
            speed_window=speed_w,
            stop_counter=stop_counter,
            force_move=force_move,
            lane_change_counter=lcc,
            lane_changed=lane_changed,
            num_frames=num_frames,
        )
        aux = dict(
            pred_bra=pred_bra,
            plan_locs=plan_wps,
            dets=veh,
            other_cast_locs=other_cast_locs,
            other_cast_cmds=other_cast_cmds,
            other_valid=other_valid,
            bev=bev[0],
            collide=collide,
            nxp=nxp,
        )
        return Control(steer, throttle, brake), new_state, aux

    return init_state, step

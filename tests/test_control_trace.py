"""Closed-loop control-trace oracle vs the reference's OWN Python.

VERDICT r2 missing-item 1: the agent's control stack (EKF, PID,
Waypointer/RoutePlanner, det decode, plan_collide, override ordering) was
a re-derivation tested against itself.  This test chains the reference's
importable, carla-free modules — /root/reference/team_code_v2/{ekf,pid,
waypointer,planner}.py and team_code_v2/models (torch) — into a faithful
reference tick (mirroring lav_agent.py:198-357 with camera segmentation /
point painting zeroed on BOTH sides and visualization dropped), feeds the
reference chain and the fused lav_tpu agent IDENTICAL synthetic
observation streams for 110 ticks, and asserts steer/throttle/brake trace
parity.

Geometry is scaled down (96x96 canvas, same y_offset=0.75 and ppm=4) so
the torch stack stays CPU-fast; every control constant comes from the
deployed v2 inference config (team_code_v2/config.yaml — whose
turn_KP=0.8 / speed_ratio[3]=0.6 values this oracle caught as wrong in
lav_tpu's v2_config).  The reference det_inference ego-exclusion hardcodes
(160, 280) = (W/2, H/2+y_offset*H/2) at full scale (lav_agent.py:440-441);
the mirror below uses the same center formula at this scale.
"""

import importlib.util
import math
import sys
import types
from collections import deque

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

sys.dont_write_bytecode = True
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")
if "/root/reference/team_code_v2" not in sys.path:
    sys.path.append("/root/reference/team_code_v2")

# ---- stubs the reference modules need -------------------------------------
if "agents.navigation.local_planner" not in sys.modules:
    import enum

    class RoadOption(enum.Enum):
        VOID = -1
        LEFT = 1
        RIGHT = 2
        STRAIGHT = 3
        LANEFOLLOW = 4
        CHANGELANELEFT = 5
        CHANGELANERIGHT = 6

    pkg = types.ModuleType("agents")
    nav = types.ModuleType("agents.navigation")
    lp = types.ModuleType("agents.navigation.local_planner")
    lp.RoadOption = RoadOption
    pkg.navigation = nav
    nav.local_planner = lp
    sys.modules["agents"] = pkg
    sys.modules["agents.navigation"] = nav
    sys.modules["agents.navigation.local_planner"] = lp

if "torch_scatter" not in sys.modules:
    def _scatter_mean(src, index, dim=0):
        n = int(index.max()) + 1
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        cnt = torch.zeros((n,), dtype=src.dtype)
        out.index_add_(0, index, src)
        cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
        return out / cnt.clamp(min=1).reshape(-1, *([1] * (src.dim() - 1)))

    def _scatter_max(src, index, dim=0):
        n = int(index.max()) + 1
        out = torch.full((n,) + src.shape[1:], -torch.inf, dtype=src.dtype)
        idx = index.reshape(-1, *([1] * (src.dim() - 1))).expand_as(src)
        out.scatter_reduce_(0, idx, src, reduce="amax", include_self=False)
        return out, None

    stub = types.ModuleType("torch_scatter")
    stub.scatter_mean = _scatter_mean
    stub.scatter_max = _scatter_max
    sys.modules["torch_scatter"] = stub


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


REF = "/root/reference/team_code_v2"
ref_ekf = _load("ref_ekf", f"{REF}/ekf.py")
ref_pid = _load("ref_pid", f"{REF}/pid.py")
ref_way = _load("ref_way", f"{REF}/waypointer.py")
ref_pln = _load("ref_pln", f"{REF}/planner.py")

from lav_tpu.config import LAVConfig  # noqa: E402
from lav_tpu.utils import weights as W  # noqa: E402

GAP = 5


def _cfg():
    # 96x96 canvas with the reference's y_offset (=0.75) and ppm=4;
    # control constants = team_code_v2/config.yaml
    return LAVConfig(
        num_plan=10, num_plan_iter=5, num_cmds=6,
        min_x=-3.0, max_x=21.0, min_y=-12.0, max_y=12.0,
        pixels_per_meter=4, crop_size=32,
        num_frame_stack=2, num_features=[16, 16],
        max_lidar_points=768, max_det=15, det_min_score=0.1,
        max_num_cars_student=4,
        aim_point=[4, 4, 4, 3, 6, 6],
        speed_ratio=[0.8, 0.8, 0.8, 0.6, 0.8, 0.8],
        turn_KP=0.8, turn_KI=0.5, turn_KD=0.2, turn_n=40,
        speed_KP=5.0, speed_KI=0.5, speed_KD=1.0, speed_n=40,
        brake_speed=0.2, clip_delta=0.25, max_throttle=0.8, max_speed=35.0,
        brake_net_thresh=0.1, cmd_thresh=0.2,
        collide_dist_static=1.0, collide_dist_moving=2.5,
    )


def _extract_peak(heatmap, max_pool_ks=7, min_score=0.1, max_det=15):
    """lav_agent.py:547-562 (verbatim behavior)."""
    max_cls = F.max_pool2d(heatmap[None, None], kernel_size=max_pool_ks,
                           padding=max_pool_ks // 2, stride=1)[0, 0]
    possible_det = heatmap - (max_cls > heatmap).float() * 1e5
    k = min(max_det, possible_det.numel())
    score, loc = torch.topk(possible_det.view(-1), k)
    return [(float(s), int(l) % heatmap.size(1), int(l) // heatmap.size(1))
            for s, l in zip(score.cpu(), loc.cpu()) if s > min_score]


class RefAgent:
    """The reference v2 tick (lav_agent.py:198-357) chained from the
    reference's own EKF/PID/Waypointer/RoutePlanner/torch models, with
    segmentation+painting zeroed and visualization dropped."""

    def __init__(self, cfg, lidar_model, uniplanner, bra_model, global_plan,
                 n_sem):
        self.cfg = cfg
        self.lidar_model, self.uniplanner = lidar_model, uniplanner
        self.bra_model = bra_model
        self.n_sem = n_sem
        self.ekf = ref_ekf.EKF(1, 1.477531, 1.393600)
        self.ekf_initialized = False
        self.lidars, self.locs, self.oris = deque(), deque(), deque()
        self.num_frames = 0
        self.prev_lidar = None
        self.num_frame_keep = (cfg.num_frame_stack + 1) * GAP
        self.turn_controller = ref_pid.PIDController(
            K_P=cfg.turn_KP, K_I=cfg.turn_KI, K_D=cfg.turn_KD, n=cfg.turn_n)
        self.speed_controller = ref_pid.PIDController(
            K_P=cfg.speed_KP, K_I=cfg.speed_KI, K_D=cfg.speed_KD,
            n=cfg.speed_n)
        self.lane_change_counter = 0
        self.stop_counter = 0
        self.force_move = 0
        self.lane_changed = None
        self.waypointer = None
        self.planner = None
        self._global_plan = global_plan

    def preprocess(self, lidar_xyzr):
        x, y, z = lidar_xyzr[:, 0], lidar_xyzr[:, 1], lidar_xyzr[:, 2]
        hull = ((x > -2.4) & (x < 0) & (y > -0.8) & (y < 0.8)
                & (z > -1.5) & (z < -1))
        return lidar_xyzr[~hull]

    def get_stacked_lidar(self):
        loc0, ori0 = self.locs[-1], self.oris[-1]
        rel = []
        for i, t in enumerate(range(len(self.lidars) - 1, -1, -GAP)):
            loc, ori = self.locs[t], self.oris[t]
            lidar = self.lidars[t]
            xyz = ref_ekf.move_lidar_points(
                lidar[:, :3], loc - loc0, ori0, ori)
            age = np.zeros((len(xyz), self.cfg.num_frame_stack + 1),
                           dtype=xyz.dtype)
            age[:, i] = 1
            rel.append(np.concatenate([xyz, lidar[:, 3:], age], axis=-1))
        return np.concatenate(rel)

    def det_inference(self, heatmaps, sizemaps, orimaps):
        cfg = self.cfg
        cx = cfg.nx / 2
        cy = cfg.ny / 2 + 0.75 * cfg.ny / 2
        dets = []
        for i, c in enumerate(heatmaps):
            det = []
            for s, x, y in _extract_peak(c, min_score=cfg.det_min_score,
                                         max_det=cfg.max_det):
                w, h = float(sizemaps[0, y, x]), float(sizemaps[1, y, x])
                cos, sin = float(orimaps[0, y, x]), float(orimaps[1, y, x])
                # NOTE operator precedence kept from the reference
                if i == 1 and w < 0.1 * cfg.pixels_per_meter \
                        or h < 0.2 * cfg.pixels_per_meter:
                    continue
                if np.linalg.norm([x - cx, y - cy]) <= 2:
                    continue
                det.append((x, y, w, h, cos, sin))
            dets.append(det)
        return dets

    def plan_collide(self, ego_plan_locs, other_cast_locs, other_cast_cmds):
        cfg = self.cfg
        for other_trajs, other_cmds in zip(other_cast_locs, other_cast_cmds):
            init_x, init_y = other_trajs[0, 0]
            if init_y > 0.5 * cfg.pixels_per_meter:
                continue
            for other_traj, other_cmd in zip(other_trajs, other_cmds):
                if other_cmd < cfg.cmd_thresh:
                    continue
                spd = np.linalg.norm(
                    other_traj[1:] - other_traj[:-1], axis=-1).mean()
                thr = (cfg.collide_dist_static if spd < cfg.brake_speed
                       else cfg.collide_dist_moving)
                if np.linalg.norm(other_traj - ego_plan_locs,
                                  axis=-1).min() < thr:
                    return True
        return False

    def pid_control(self, waypoints, speed, cmd):
        cfg = self.cfg
        waypoints = np.copy(waypoints) * cfg.pixels_per_meter
        waypoints[:, 1] *= -1
        desired_speed = np.linalg.norm(
            waypoints[1:] - waypoints[:-1], axis=1).mean()
        aim = waypoints[cfg.aim_point[cmd]]
        angle = np.degrees(np.pi / 2 - np.arctan2(aim[1], aim[0])) / 90
        steer = float(np.clip(self.turn_controller.step(angle), -1.0, 1.0))
        brake = desired_speed < cfg.brake_speed * cfg.pixels_per_meter
        delta = np.clip(desired_speed * cfg.speed_ratio[cmd] - speed,
                        0.0, cfg.clip_delta)
        throttle = float(np.clip(self.speed_controller.step(delta),
                                 0.0, cfg.max_throttle))
        throttle = throttle if not brake else 0.0
        return steer, throttle, float(brake)

    def run_step(self, obs):
        cfg = self.cfg
        self.num_frames += 1
        lidar = np.asarray(obs["lidar"], np.float64)
        gps = np.asarray(obs["gps"], np.float64)
        spd = float(obs["speed"])
        compass = float(obs["compass"])
        if np.isnan(compass):
            compass = 0.0

        if not self.ekf_initialized:
            self.ekf.init(*gps[:2], compass - math.pi / 2)
            self.ekf_initialized = True
        loc, ori = self.ekf.x[:2], self.ekf.x[2]

        if spd < 0.1:
            self.stop_counter += 1
        else:
            self.stop_counter = 0

        if self.num_frames <= 1:
            self.prev_lidar = lidar
            return 0.0, 0.0, 0.0

        cur_lidar = np.concatenate([lidar, self.prev_lidar])
        self.prev_lidar = lidar
        cur_lidar = self.preprocess(cur_lidar)

        # painting zeroed on both sides
        painted = np.zeros((len(cur_lidar), self.n_sem), cur_lidar.dtype)
        fused_lidar = np.concatenate([cur_lidar, painted], axis=-1)

        self.lidars.append(fused_lidar)
        self.locs.append(loc)
        self.oris.append(ori)
        if len(self.lidars) > self.num_frame_keep:
            self.lidars.popleft()
            self.locs.popleft()
            self.oris.popleft()

        stacked_lidar = self.get_stacked_lidar()

        if self.waypointer is None:
            self.waypointer = ref_way.Waypointer(
                self._global_plan, gps, pop_lane_change=True)
            self.planner = ref_pln.RoutePlanner(self._global_plan)
        _, _, cmd = self.waypointer.tick(gps)
        wx, wy = self.planner.run_step(gps)

        cmd_value = cmd.value - 1
        cmd_value = 3 if cmd_value < 0 else cmd_value

        if cmd_value in [4, 5]:
            if (self.lane_changed is not None
                    and cmd_value != self.lane_changed):
                self.lane_change_counter = 0
            self.lane_change_counter += 1
            self.lane_changed = (cmd_value
                                 if self.lane_change_counter > 300 else None)
        else:
            self.lane_change_counter = 0
            self.lane_changed = None
        if cmd_value == self.lane_changed:
            cmd_value = 3

        theta = -compass + np.pi / 2
        c, s = np.cos(theta), np.sin(theta)
        wx, wy = c * wx - s * wy, s * wx + c * wy

        wide = np.concatenate([obs["rgbs"][i]
                               for i in range(len(obs["rgbs"]))], axis=1)
        with torch.no_grad():
            pred_bra = self.bra_model(
                torch.tensor(wide[None]).permute(0, 3, 1, 2).float(),
                torch.tensor(np.asarray(obs["tel_rgb"])[None]).permute(
                    0, 3, 1, 2).float(),
            )
            lidar_points = torch.tensor(stacked_lidar, dtype=torch.float32)
            nxps = torch.tensor([-wx, -wy]).float()
            features, hm, size, orim, _bev = self.lidar_model(
                [lidar_points], [len(lidar_points)])
            det = self.det_inference(torch.sigmoid(hm[0]), size[0], orim[0])
            ego_plan_locs, ego_cast_locs, other_cast_locs, other_cast_cmds = \
                self.uniplanner.infer(features[0], det[1], cmd_value, nxps)
        ego_plan_locs = ego_plan_locs.numpy()
        ego_cast_locs = ego_cast_locs.numpy()
        other_cast_locs = other_cast_locs.numpy()
        other_cast_cmds = other_cast_cmds.numpy()

        if cmd_value in [4, 5]:
            ego_plan_locs = ego_cast_locs

        if not np.isnan(ego_plan_locs).any():
            steer, throt, brake = self.pid_control(
                ego_plan_locs, spd, cmd_value)
        else:
            steer, throt, brake = 0, 0, 0

        self.ekf.step(spd, steer, *gps[:2], compass - math.pi / 2)

        if float(pred_bra) > cfg.brake_net_thresh:
            throt, brake = 0, 1
        elif self.plan_collide(ego_plan_locs, other_cast_locs,
                               other_cast_cmds):
            throt, brake = 0, 1
        if spd * 3.6 > cfg.max_speed:
            throt = 0

        if self.stop_counter >= 600:
            self.force_move = 20
        if self.force_move > 0:
            throt, brake = max(0.4, throt), 0
            self.force_move -= 1
        return float(steer), float(throt), float(brake)


def _build_models(cfg, n_sem, seed=11):
    from models.lidar import LiDARModel          # team_code_v2/models
    from models.uniplanner import UniPlanner
    from models.bev_planner import BEVPlanner
    from models.rgb import RGBBrakePredictionModel

    torch.manual_seed(seed)
    num_input = n_sem + 10 + cfg.num_frame_stack
    lidar_model = LiDARModel(
        num_input=num_input, backbone="cnn", num_features=cfg.num_features,
        min_x=int(cfg.min_x), max_x=int(cfg.max_x),
        min_y=int(cfg.min_y), max_y=int(cfg.max_y),
        pixels_per_meter=int(cfg.pixels_per_meter)).eval()
    y_off = 1 + cfg.min_x / ((cfg.max_x - cfg.min_x) / 2)
    bev_planner = BEVPlanner(
        pixels_per_meter=cfg.pixels_per_meter, crop_size=cfg.crop_size,
        x_offset=0, y_offset=y_off, num_cmds=cfg.num_cmds,
        num_plan=cfg.num_plan, num_plan_iter=cfg.num_plan_iter,
        num_frame_stack=cfg.num_frame_stack)
    uniplanner = UniPlanner(
        bev_planner, pixels_per_meter=cfg.pixels_per_meter,
        crop_size=cfg.crop_size, x_offset=0, y_offset=y_off,
        num_cmds=cfg.num_cmds, num_plan=cfg.num_plan,
        num_input_feature=cfg.num_features[-1] * 6,
        num_plan_iter=cfg.num_plan_iter).eval()
    bra_model = RGBBrakePredictionModel([4, 10, 18], pretrained=False).eval()
    # keep the random-init brake net decisively OFF (sigmoid(-4) ~ 0.018 <
    # 0.1) so the trace exercises driving, not a constant brake override
    with torch.no_grad():
        for name, p in bra_model.named_parameters():
            if p.shape == (1,) and "bias" in name:
                p.fill_(-4.0)
            if p.dim() == 2 and p.shape[0] == 1:
                p.mul_(0.1)
    return lidar_model, uniplanner, bra_model


def _obs_stream(cfg, n_ticks, P, rng):
    """Synthetic route + sensor stream shared verbatim by both agents."""
    cos0_deg = 0.0
    m2lat = 1.0 / (6371e3 * math.pi / 180.0)
    m2lon = 1.0 / (6371e3 * math.pi / 180.0 * math.cos(cos0_deg))

    # route: 12 waypoints straight ahead (+x), 10 m apart; one LEFT and one
    # CHANGELANELEFT command to exercise the command machinery
    LANEFOLLOW, LEFT, CHANGELANELEFT = 4, 1, 6
    plan = []
    for i in range(12):
        cmd = LEFT if i == 5 else (CHANGELANELEFT if i == 8 else LANEFOLLOW)
        ro = sys.modules["agents.navigation.local_planner"].RoadOption(cmd)
        plan.append(({"lat": (i * 10.0) * m2lat, "lon": 0.0, "z": 0.0}, ro))

    obs = []
    x = 0.0
    for t in range(n_ticks):
        spd = 3.0 + 2.5 * math.sin(t / 17.0) + 0.5 * rng.standard_normal()
        spd = max(0.0, spd)
        x += spd / cfg.fps
        lat = x * m2lat + rng.standard_normal() * 2e-9
        lon = 0.3 * math.sin(t / 23.0) * m2lon
        compass = math.pi / 2 + 0.05 * math.sin(t / 31.0)
        pts = np.stack([
            rng.uniform(cfg.min_x, cfg.max_x, P),
            rng.uniform(cfg.min_y, cfg.max_y, P),
            rng.uniform(-2.3, 0.5, P),
            rng.uniform(0, 1, P),
        ], axis=1).astype(np.float32)
        obs.append(dict(
            lidar=pts,
            gps=np.array([lat, lon, 0.0], np.float64),
            compass=np.float64(compass),
            speed=np.float64(spd),
            rgbs=rng.uniform(0, 255, (3, 64, 96, 3)).astype(np.float32),
            tel_rgb=rng.uniform(0, 255, (48, 96, 3)).astype(np.float32),
        ))
    return plan, obs


def test_control_trace_parity():
    from lav_tpu.agent.agent import build_agent
    from lav_tpu.agent.route import (
        Waypointer as JWaypointer, RoutePlanner as JRoutePlanner,
        cmd_to_model_value,
    )

    cfg = _cfg()
    n_sem = len(cfg.seg_channels)
    n_ticks, P = 110, 96
    rng = np.random.default_rng(3)
    plan, stream = _obs_stream(cfg, n_ticks, P, rng)
    lidar_model, uniplanner, bra_model = _build_models(cfg, n_sem)

    ref = RefAgent(cfg, lidar_model, uniplanner, bra_model, plan, n_sem)
    plan_int = [(g, ro.value) for g, ro in plan]  # lav_tpu takes raw ints

    # ---- lav_tpu agent with the SAME (converted) weights ------------------
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {
        "lidar_model": jax.tree.map(
            jnp.asarray,
            W.convert_lidar_model(sd(lidar_model),
                                  num_features=cfg.num_features)),
        "uniplanner": jax.tree.map(
            jnp.asarray, W.convert_uniplanner(sd(uniplanner))),
        "bra_model": jax.tree.map(
            jnp.asarray, W.convert_brake_model(sd(bra_model), version=2)),
        "seg_model": None,  # seg skipped
    }
    init_state, step = build_agent(cfg, max_points=P, rgb_hw=(64, 96),
                                   skip=("seg", "paint"))
    jstep = jax.jit(step)
    state = init_state()
    jway, jplanner = None, None

    trace_ref, trace_jax = [], []
    for t, ob in enumerate(stream):
        # reference tick
        trace_ref.append(ref.run_step(ob))

        # lav_tpu tick: host-side route following + fused device step
        if t >= 1 and jway is None:
            jway = JWaypointer(plan_int, ob["gps"], pop_lane_change=True)
            jplanner = JRoutePlanner(plan_int)
        if jway is not None:
            _, _, cmd_ro = jway.tick(ob["gps"])
            target = jplanner.run_step(ob["gps"])
            cmd_val = cmd_to_model_value(int(cmd_ro))
        else:
            cmd_val, target = 3, np.zeros(2)
        jobs = dict(
            lidar=jnp.asarray(ob["lidar"]),
            lidar_valid=jnp.ones((P,), bool),
            rgbs=jnp.asarray(ob["rgbs"]),
            tel_rgb=jnp.asarray(ob["tel_rgb"]),
            gps=jnp.asarray(ob["gps"]),
            compass=jnp.asarray(ob["compass"]),
            speed=jnp.asarray(ob["speed"]),
            cmd=jnp.asarray(cmd_val, jnp.int32),
            target=jnp.asarray(target),
        )
        ctrl, state, _aux = jstep(params, state, jobs)
        trace_jax.append((float(ctrl.steer), float(ctrl.throttle),
                          float(ctrl.brake)))

    ref_arr = np.asarray(trace_ref)
    jax_arr = np.asarray(trace_jax)
    d_steer = np.abs(ref_arr[:, 0] - jax_arr[:, 0]).max()
    d_throt = np.abs(ref_arr[:, 1] - jax_arr[:, 1]).max()
    brake_match = (ref_arr[:, 2] == jax_arr[:, 2]).mean()
    # f32 jax vs f64 numpy through a 110-tick closed loop: documented
    # tolerance 5e-3 on the continuous channels, exact on binary brake
    assert d_steer < 5e-3, f"steer trace diverged: {d_steer}"
    assert d_throt < 5e-3, f"throttle trace diverged: {d_throt}"
    assert brake_match == 1.0, (
        f"brake trace mismatch on {(1 - brake_match) * n_ticks:.0f} ticks"
    )
    # the stream must actually exercise driving, not a degenerate trace
    assert ref_arr[:, 1].max() > 0.05, "throttle never engaged"
    assert np.abs(ref_arr[:, 0]).max() > 1e-4, "steer never engaged"

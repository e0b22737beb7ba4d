"""CARLA leaderboard adapter: the live-simulator deployment surface.

Wraps the fused jitted agent (lav_tpu.agent.agent) in the leaderboard's
AutonomousAgent protocol (sensors()/setup()/run_step()/destroy(),
reference team_code_v2/lav_agent.py:37-198) so the framework drops into
`leaderboard/scripts/run_evaluation.sh` unchanged.  carla/leaderboard are
imported lazily — absent in this image, present on an evaluation host.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from lav_tpu.config import LAVConfig, load_config, v2_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.agent.route import RoutePlanner, Waypointer, cmd_to_model_value

CAMERA_YAWS = (-60, 0, 60)


def get_entry_point():
    return "LAVAgent"


def sensor_suite(camera_x: float, camera_z: float):
    """The reference sensor layout (team_code_v2/lav_agent.py:38-60)."""
    sensors = [
        {"type": "sensor.speedometer", "id": "EGO"},
        {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": camera_z,
         "id": "GPS"},
        {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": camera_z,
         "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.05,
         "id": "IMU"},
        {"type": "sensor.lidar.ray_cast", "x": 0.0, "y": 0.0, "z": camera_z,
         "yaw": 0.0, "pitch": 0.0, "roll": 0.0, "id": "LIDAR"},
    ]
    for i, yaw in enumerate(CAMERA_YAWS):
        sensors.append({
            "type": "sensor.camera.rgb", "x": camera_x, "y": 0.0,
            "z": camera_z, "roll": 0.0, "pitch": 0.0, "yaw": yaw,
            "width": 256, "height": 288, "fov": 64, "id": f"RGB_{i}",
        })
    sensors.append({
        "type": "sensor.camera.rgb", "x": camera_x, "y": 0.0, "z": camera_z,
        "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "width": 480, "height": 288,
        "fov": 40, "id": "TEL_RGB",
    })
    return sensors


class LAVAgentCore:
    """Simulator-agnostic agent core: host route following + jitted step.
    Used by both the CARLA adapter and the replay evaluator."""

    def __init__(self, cfg: LAVConfig, params, max_points: int = 8192,
                 rgb_hw=(288, 256)):
        self.cfg = cfg
        self.params = params
        init_state, step = build_agent(cfg, max_points=max_points,
                                       rgb_hw=rgb_hw)
        self.state = init_state()
        self.step = jax.jit(step)
        self.max_points = max_points
        self.waypointer: Optional[Waypointer] = None
        self.planner: Optional[RoutePlanner] = None
        self._global_plan = None

    def set_global_plan(self, global_plan):
        self._global_plan = global_plan

    def run_step(self, lidar, rgbs, tel_rgb, gps, compass, speed):
        if self.waypointer is None:
            self.waypointer = Waypointer(self._global_plan, gps)
            self.planner = RoutePlanner(self._global_plan)
        _, _, cmd = self.waypointer.tick(gps)
        target = self.planner.run_step(gps)

        pts = np.zeros((self.max_points, 4), np.float32)
        valid = np.zeros((self.max_points,), bool)
        n = min(len(lidar), self.max_points)
        pts[:n] = lidar[:n, :4]
        valid[:n] = True

        obs = dict(
            lidar=jnp.asarray(pts),
            lidar_valid=jnp.asarray(valid),
            rgbs=jnp.asarray(np.asarray(rgbs, np.float32)),
            tel_rgb=jnp.asarray(np.asarray(tel_rgb, np.float32)),
            gps=jnp.asarray(np.asarray(gps[:2], np.float32)),
            compass=jnp.asarray(np.float32(compass)),
            speed=jnp.asarray(np.float32(speed)),
            cmd=jnp.asarray(cmd_to_model_value(cmd), jnp.int32),
            target=jnp.asarray(target.astype(np.float32)),
        )
        ctrl, self.state, aux = self.step(self.params, self.state, obs)
        return (float(ctrl.steer), float(ctrl.throttle), float(ctrl.brake),
                aux)


try:  # pragma: no cover — only on a CARLA evaluation host
    import carla  # type: ignore
    from leaderboard.autoagents.autonomous_agent import (  # type: ignore
        AutonomousAgent, Track,
    )

    class LAVAgent(AutonomousAgent):
        def sensors(self):
            return sensor_suite(self._cfg.camera_x, self._cfg.camera_z)

        def setup(self, path_to_conf_file):
            self.track = Track.SENSORS
            self._cfg = (load_config(path_to_conf_file)
                         if path_to_conf_file else v2_config())
            from lav_tpu.train.checkpoints import load_checkpoint
            from lav_tpu.models.lidar import lidar_model_init
            from lav_tpu.models.planner import uniplanner_init
            from lav_tpu.models.rgb import brake_model_init, seg_model_init

            ks = jax.random.split(jax.random.key(0), 4)
            cfg = self._cfg
            params = {
                "lidar_model": lidar_model_init(
                    ks[0], cfg.num_input, cfg.num_features
                ),
                "uniplanner": uniplanner_init(ks[1], cfg),
                "seg_model": seg_model_init(ks[2], len(cfg.seg_channels)),
                "bra_model": brake_model_init(ks[3], 3, version=2),
            }
            for name, path in (
                ("lidar_model", cfg.lidar_model_dir),
                ("uniplanner", cfg.uniplanner_dir),
                ("seg_model", cfg.seg_model_dir),
                ("bra_model", cfg.bra_model_dir),
            ):
                if path:
                    params[name] = load_checkpoint(path, params[name])
            self.core = LAVAgentCore(cfg, params)

        def run_step(self, input_data, timestamp):
            _, lidar = input_data.get("LIDAR")
            _, gps = input_data.get("GPS")
            _, imu = input_data.get("IMU")
            _, ego = input_data.get("EGO")
            rgbs = [input_data.get(f"RGB_{i}")[1][..., :3][..., ::-1]
                    for i in range(len(CAMERA_YAWS))]
            tel = input_data.get("TEL_RGB")[1][..., :3][..., ::-1]
            tel = tel[:-self._cfg.crop_tel_bottom]
            if self.core._global_plan is None:
                self.core.set_global_plan(self._global_plan)
            steer, throttle, brake, _ = self.core.run_step(
                lidar, np.stack(rgbs), tel, gps, imu[-1], ego.get("speed")
            )
            return carla.VehicleControl(
                steer=steer, throttle=throttle, brake=brake
            )

        def destroy(self):
            self.core = None

except Exception:  # carla not installed — replay-only deployment
    LAVAgent = None  # type: ignore

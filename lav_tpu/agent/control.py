"""Waypoint-following control + collision-forecast braking, fully tensorized.

Re-expression of the reference agent's pid_control and plan_collide
(/root/reference/team_code_v2/lav_agent.py:382-424) as pure functions so
they live inside the jitted agent step (the reference runs them in Python
on CPU every tick).
"""

from __future__ import annotations

import jax.numpy as jnp

from lav_tpu.agent.pid import pid_step


def pid_control(cfg_static, turn_window, speed_window, waypoints, speed, cmd):
    """waypoints (T, 2) meters (plan output); speed m/s; cmd scalar int.

    cfg_static: dict with turn_pid, speed_pid consts, aim_point (num_cmds,),
    speed_ratio (num_cmds,), pixels_per_meter, brake_speed, clip_delta,
    max_throttle.
    Returns (steer, throttle, brake_bool, new_turn_window, new_speed_window).
    """
    ppm = cfg_static["pixels_per_meter"]
    wps = waypoints * ppm
    wps = wps.at[:, 1].multiply(-1.0)

    deltas = jnp.linalg.norm(wps[1:] - wps[:-1], axis=1)
    desired_speed = deltas.mean()

    aim_idx = jnp.asarray(cfg_static["aim_point"])[cmd]
    aim = wps[aim_idx]
    angle = jnp.degrees(jnp.pi / 2 - jnp.arctan2(aim[1], aim[0])) / 90.0
    steer, turn_window = pid_step(cfg_static["turn_pid"], turn_window, angle)
    steer = jnp.clip(steer, -1.0, 1.0)

    brake = desired_speed < cfg_static["brake_speed"] * ppm
    ratio = jnp.asarray(cfg_static["speed_ratio"])[cmd]
    delta = jnp.clip(desired_speed * ratio - speed, 0.0, cfg_static["clip_delta"])
    throttle, speed_window = pid_step(cfg_static["speed_pid"], speed_window, delta)
    throttle = jnp.clip(throttle, 0.0, cfg_static["max_throttle"])
    throttle = jnp.where(brake, 0.0, throttle)

    return steer, throttle, brake, turn_window, speed_window


def plan_collide(ego_plan_locs, other_cast_locs, other_cast_cmds, other_valid,
                 *, pixels_per_meter: float, cmd_thresh: float,
                 brake_speed: float, dist_threshold_static: float = 1.0,
                 dist_threshold_moving: float = 2.5):
    """Emergency-brake test: does any plausible forecast of a detected car
    intersect the ego plan?  (reference lav_agent.py:382-399)

    ego_plan_locs (T, 2); other_cast_locs (K, C, T, 2);
    other_cast_cmds (K, C); other_valid (K,) bool.  Returns () bool.
    """
    # cars starting meaningfully ahead-threshold are skipped
    init_y = other_cast_locs[:, 0, 0, 1]
    car_ok = other_valid & ~(init_y > 0.5 * pixels_per_meter)

    traj = other_cast_locs  # (K, C, T, 2)
    spd = jnp.linalg.norm(traj[:, :, 1:] - traj[:, :, :-1], axis=-1).mean(-1)
    thresh = jnp.where(spd < brake_speed, dist_threshold_static,
                       dist_threshold_moving)  # (K, C)
    dist = jnp.linalg.norm(traj - ego_plan_locs[None, None], axis=-1).min(-1)
    hit = (dist < thresh) & (other_cast_cmds >= cmd_thresh) & car_ok[:, None]
    return hit.any()

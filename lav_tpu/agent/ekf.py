"""Extended Kalman filter for ego pose (x, y, theta), pure-functional.

State-space model from the reference agent
(/root/reference/team_code_v2/ekf.py:4-99): kinematic-bicycle prediction,
GPS+compass measurement update with fixed noise covariances, F = H = I.

Reference quirk reproduced on purpose (do NOT "fix" silently): the heading
update uses `tan(theta_k)` — the current heading — rather than the wheel
angle (ekf.py:89).  The deployed policy was tuned against this filter, so
behavioral parity requires it.

The update inverts one 3x3 innovation covariance (`jnp.linalg.inv` — XLA
lowers the fixed 3x3 case to closed-form cofactor arithmetic, no iterative
solve); everything else is scalar math inside the fused agent step.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

EARTH_RADIUS = 6371e3


class EKFState(NamedTuple):
    x: jnp.ndarray  # (3,) [x, y, theta]
    P: jnp.ndarray  # (3, 3) covariance
    initialized: jnp.ndarray  # () bool


def ekf_make(cos0: float = 1.0, lf: float = 1.477531, lr: float = 1.393600,
             gnss_noise: float = 0.000005, compass_noise: float = 1e-7,
             max_steer_angle: float = 70.0, freq: float = 20.0):
    """Build the static constants dict shared by all EKF calls."""
    xy_noise = EARTH_RADIUS * gnss_noise * math.pi / 180.0
    cps_noise = compass_noise * math.pi / 180.0
    return dict(
        Q=jnp.eye(3) * 1e-7,
        R=jnp.diag(jnp.array([xy_noise ** 2, xy_noise ** 2, cps_noise ** 2])),
        max_steer=max_steer_angle * math.pi / 180.0,
        cos0=cos0,
        lr=lr,
        L=lf + lr,
        dt=1.0 / freq,
    )


def ekf_init_state() -> EKFState:
    return EKFState(
        x=jnp.zeros(3), P=jnp.zeros((3, 3)), initialized=jnp.array(False)
    )


def latlon_to_xy(consts, lat, lon):
    x = EARTH_RADIUS * lat * (jnp.pi / 180.0)
    y = EARTH_RADIUS * lon * (jnp.pi / 180.0) * jnp.cos(consts["cos0"])
    return x, y


def _kbm_step(consts, x, spd, steer):
    """Kinematic bicycle prediction (reference ekf.py:74-91)."""
    xk, yk, theta = x[0], x[1], x[2]
    wheel = steer * consts["max_steer"]
    beta = jnp.arctan(consts["lr"] * jnp.tan(wheel) / consts["L"])
    dt = consts["dt"]
    xp = xk + spd * jnp.cos(theta + beta) * dt
    yp = yk + spd * jnp.sin(theta + beta) * dt
    # reference quirk: tan(theta), not tan(wheel) (ekf.py:89)
    tp = theta + spd * jnp.tan(theta) * jnp.cos(beta) / consts["L"] * dt
    return jnp.stack([xp, yp, tp])


def _inv3(S):
    """Closed-form 3x3 inverse (adjugate / determinant)."""
    a, b, c = S[0, 0], S[0, 1], S[0, 2]
    d, e, f = S[1, 0], S[1, 1], S[1, 2]
    g, h, i = S[2, 0], S[2, 1], S[2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.array([
        [A, c * h - b * i, b * f - c * e],
        [B, a * i - c * g, c * d - a * f],
        [C, b * g - a * h, a * e - b * d],
    ])
    return adj / det


def ekf_predict_update(consts, state: EKFState, spd, steer, lat, lon,
                       compass) -> EKFState:
    """One predict+update; on the first call just latches the measurement
    (reference init, ekf.py:33-43).  compass must already be ori
    (= raw compass - pi/2)."""
    x_gps, y_gps = latlon_to_xy(consts, lat, lon)
    z = jnp.stack([x_gps, y_gps, compass])

    # predict
    x_pred = _kbm_step(consts, state.x, spd, steer)
    P_pred = state.P + consts["Q"]  # F = I

    # update (H = I).  S is 3x3 — invert in closed form (adjugate/det):
    # jnp.linalg.inv lowers to an LU while-loop + per-element gathers,
    # pure launch overhead at this size inside the fused tick
    S = P_pred + consts["R"]
    K = P_pred @ _inv3(S)
    x_new = x_pred + K @ (z - x_pred)
    P_new = (jnp.eye(3) - K) @ P_pred

    # first tick: initialize from measurement with zero covariance
    x_out = jnp.where(state.initialized, x_new, z)
    P_out = jnp.where(state.initialized, P_new, jnp.zeros((3, 3)))
    return EKFState(x=x_out, P=P_out, initialized=jnp.array(True))

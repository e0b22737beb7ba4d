"""Windowed PID controller as a pure function over a rolling error buffer.

Reference (/root/reference/team_code_v2/pid.py:4-26): a deque of the last n
errors (pre-filled with zeros), I-term = window mean, D-term = last diff.
Here the window is a fixed (n,) array rolled in-place inside the jitted
agent step.
"""

from __future__ import annotations

import jax.numpy as jnp


def pid_make(K_P: float, K_I: float, K_D: float, n: int):
    return dict(K_P=K_P, K_I=K_I, K_D=K_D, n=n)


def pid_init(n: int):
    return jnp.zeros((n,))


def pid_step(consts, window, error):
    """Returns (control, new_window)."""
    window = jnp.roll(window, -1).at[-1].set(error)
    integral = window.mean()
    derivative = window[-1] - window[-2]
    out = consts["K_P"] * error + consts["K_I"] * integral + consts["K_D"] * derivative
    return out, window

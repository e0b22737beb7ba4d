"""AOT export of the fused agent step (the TorchScript-trace analog).

The reference ships torch.jit traces for Python-free deployment
(team_code_v2/model_inference.py:20-32, weights/seg_1.pt etc.).  The
TPU-native equivalent is `jax.export`: serialize the fully-lowered agent
step (StableHLO) so a serving runtime can execute it without the model
code, and reload it for inference.

    from lav_tpu.agent.export import export_agent_step, load_agent_step
    blob = export_agent_step(cfg, params)            # bytes
    step = load_agent_step(blob)                     # callable
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lav_tpu.config import LAVConfig
from lav_tpu.agent.agent import build_agent


def _example_inputs(cfg: LAVConfig, max_points: int, rgb_hw, tel_hw,
                    compute_dtype=None):
    init_state, step = build_agent(cfg, max_points=max_points, rgb_hw=rgb_hw,
                                   compute_dtype=compute_dtype)
    state = init_state()
    P = state.prev_lidar.shape[0]
    obs = dict(
        lidar=jnp.zeros((P, 4)),
        lidar_valid=jnp.zeros((P,), bool),
        rgbs=jnp.zeros((3, *rgb_hw, 3)),
        tel_rgb=jnp.zeros((*tel_hw, 3)),
        gps=jnp.zeros((2,)),
        compass=jnp.zeros(()),
        speed=jnp.zeros(()),
        cmd=jnp.zeros((), jnp.int32),
        target=jnp.zeros((2,)),
    )
    return step, state, obs


_REGISTERED = False


def _register_pytrees():
    """jax.export needs named(tuple) serialization registered once."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from lav_tpu.agent.agent import AgentState, Control
    from lav_tpu.agent.ekf import EKFState

    for cls in (AgentState, Control, EKFState):
        jexport.register_namedtuple_serialization(
            cls, serialized_name=f"lav_tpu.{cls.__name__}"
        )
    _REGISTERED = True


def export_agent_step(cfg: LAVConfig, params, *, max_points: int = 8192,
                      rgb_hw=(288, 256), tel_hw=(192, 480),
                      compute_dtype=None, quant_int8: bool = False) -> bytes:
    """Serialize the jitted closed-loop step with params baked in.

    compute_dtype / quant_int8 export the SERVING configuration (bf16
    activations + int8 MXU-bound conv stacks, the bench default): params
    are quantized here (weights int8, static per-channel scales) and
    baked into the artifact like any other constant."""
    from jax import export as jexport

    _register_pytrees()
    if quant_int8:
        from lav_tpu.nn.quant import quantize_tree

        params = dict(params)
        params["lidar_model"] = quantize_tree(params["lidar_model"])
        params["uniplanner"] = quantize_tree(params["uniplanner"])
    step, state, obs = _example_inputs(cfg, max_points, rgb_hw, tel_hw,
                                       compute_dtype=compute_dtype)

    def fn(state, obs):
        return step(params, state, obs)

    exported = jexport.export(jax.jit(fn))(state, obs)
    return exported.serialize()


def load_agent_step(blob: bytes) -> Callable:
    from jax import export as jexport

    _register_pytrees()
    return jexport.deserialize(blob).call

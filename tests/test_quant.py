"""int8 quantized inference: correctness envelope + policy parity.

The int8 path (lav_tpu/nn/quant.py) is opt-in and accuracy is bounded at
the POLICY level, the only level that matters for a driving agent: the
fused agent is replayed in f32 and int8 over the same observation stream
and the control deviation must stay inside the documented envelope.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L
from lav_tpu.nn.quant import quantize_tree, quantize_conv


def test_quantize_conv_roundtrip(rng):
    p = L.conv2d_init(jax.random.key(0), 32, 64, 3)
    q = quantize_conv(p)
    assert q["w_int8"].dtype == jnp.int8
    # dequantized weights within one quantization step of the original
    deq = q["w_int8"].astype(jnp.float32) * q["w_scale"]
    step = np.asarray(q["w_scale"])
    assert np.all(np.abs(np.asarray(deq - p["w"])) <= step + 1e-7)


def test_conv2d_int8_close(rng):
    p = L.conv2d_init(jax.random.key(1), 64, 64, 3)
    q = quantize_tree({"c": p})["c"]
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    y = L.conv2d(p, x, stride=1, padding=1)
    yq = L.conv2d(q, x, stride=1, padding=1)
    rel = float(jnp.max(jnp.abs(y - yq)) / (jnp.max(jnp.abs(y)) + 1e-9))
    assert rel < 0.02, rel


def test_conv_transpose2d_int8_close(rng):
    p = L.conv_transpose2d_init(jax.random.key(2), 64, 32, 3)
    q = quantize_tree({"c": p})["c"]
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    y = L.conv_transpose2d(p, x, stride=2, padding=1, output_padding=1)
    yq = L.conv_transpose2d(q, x, stride=2, padding=1, output_padding=1)
    rel = float(jnp.max(jnp.abs(y - yq)) / (jnp.max(jnp.abs(y)) + 1e-9))
    assert rel < 0.02, rel


def test_quantize_tree_skips_protected_subtrees():
    from lav_tpu.models.lidar import lidar_model_init

    p = lidar_model_init(jax.random.key(3), 16, [16, 16])
    q = quantize_tree(p)
    # entry block and merged-head weights must keep raw 'w'
    assert "w" in q["backbone"]["conv1_0"]["conv"]
    assert "w" in q["center_head"]["conv"]
    assert "w" in q["center_head"]["up"]
    # deeper backbone blocks are quantized
    assert "w_int8" in q["backbone"]["conv2_0"]["conv"]


N_TICKS = 100


def test_agent_policy_parity_int8(rng):
    """Replay 100 ticks through the fused agent in f32 vs int8 (seg+brake+
    lidar backbone+planner quantized) and bound the control deviation
    (VERDICT r2 item 2: >=100-tick policy-parity oracle)."""
    from lav_tpu.config import tiny_config
    from lav_tpu.agent.agent import build_agent
    from lav_tpu.agent.demo import build_params
    from lav_tpu.agent.env import ReplayEnv
    from lav_tpu.data.store import make_synthetic_episode

    cfg = tiny_config()
    img_hw = (32, 32)
    P = 128
    init_state, step_fn = build_agent(cfg, max_points=P, rgb_hw=img_hw)
    params = build_params(cfg)
    params_q = quantize_tree(params)
    # bench.py's DEFAULT scope (BENCH_INT8=mxu): only the MXU-bound
    # stacks — a strict subset of the full quantization, tested on the
    # same replay so the headline config is parity-bounded directly
    params_mxu = dict(params)
    params_mxu["lidar_model"] = quantize_tree(params["lidar_model"])
    params_mxu["uniplanner"] = quantize_tree(params["uniplanner"])

    env = ReplayEnv(
        make_synthetic_episode(n_frames=N_TICKS + cfg.num_plan + 1, n_lidar=P,
                               img_hw=img_hw, bev_hw=(cfg.ny, cfg.nx),
                               seed=5),
        cfg, max_points=P,
    )
    step = jax.jit(step_fn)
    traces = {}
    for name, prm in (("f32", params), ("int8", params_q),
                      ("mxu", params_mxu)):
        state = init_state()
        out = []
        for t, obs in enumerate(env.frames()):
            if t >= N_TICKS:
                break
            obs = jax.tree.map(jnp.asarray, obs)
            ctrl, state, _ = step(prm, state, obs)
            out.append([float(ctrl.steer), float(ctrl.throttle),
                        float(ctrl.brake)])
        traces[name] = np.asarray(out)

    for q in ("int8", "mxu"):
        d = np.abs(traces["f32"] - traces[q])
        # documented policy envelope: continuous channels within 0.05,
        # binary brake flips on at most 10% of ticks
        assert d[:, 0].max() < 0.05, f"{q} steer dev {d[:, 0].max()}"
        assert d[:, 1].max() < 0.05, f"{q} throttle dev {d[:, 1].max()}"
        assert (traces["f32"][:, 2] != traces[q][:, 2]).mean() <= 0.10

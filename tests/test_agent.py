"""Closed-loop fused agent: multi-tick smoke test on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.agent.ekf import ekf_make, ekf_init_state, ekf_predict_update
from lav_tpu.agent.control import plan_collide
from lav_tpu.models.lidar import lidar_model_init
from lav_tpu.models.planner import uniplanner_init
from lav_tpu.models.rgb import seg_model_init, brake_model_init

CFG = tiny_config()
IMG_HW = (32, 32)


def _params(cfg):
    ks = jax.random.split(jax.random.key(7), 4)
    return {
        "lidar_model": lidar_model_init(ks[0], cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(ks[1], cfg),
        "seg_model": seg_model_init(ks[2], len(cfg.seg_channels)),
        "bra_model": brake_model_init(ks[3], 3, version=1),
    }


def _obs(rng, P, frame):
    return dict(
        lidar=jnp.asarray(rng.uniform(-10, 10, size=(P, 4)).astype(np.float32)),
        lidar_valid=jnp.ones((P,), bool),
        rgbs=jnp.asarray(rng.uniform(0, 255, size=(3, *IMG_HW, 3)).astype(np.float32)),
        tel_rgb=jnp.asarray(rng.uniform(0, 255, size=(*IMG_HW, 3)).astype(np.float32)),
        gps=jnp.array([1e-4 * frame, 2e-4]),
        compass=jnp.array(0.5),
        speed=jnp.array(3.0),
        cmd=jnp.array(3, jnp.int32),
        target=jnp.array([5.0, 1.0]),
    )


def test_agent_three_ticks(rng):
    cfg = CFG
    init_state, step = build_agent(cfg, rgb_hw=IMG_HW)
    params = _params(cfg)
    state = init_state()
    P = state.prev_lidar.shape[0]

    jstep = jax.jit(step)
    for frame in range(3):
        ctrl, state, aux = jstep(params, state, _obs(rng, P, frame))
        s, t, b = float(ctrl.steer), float(ctrl.throttle), float(ctrl.brake)
        assert np.isfinite([s, t, b]).all(), f"frame {frame}"
        assert -1.0 <= s <= 1.0 and 0.0 <= t <= 1.0 and b in (0.0, 1.0)

    assert int(state.num_frames) == 3
    assert bool(state.ekf.initialized)
    assert int(state.buf_count) >= 1
    # first frame must emit zero control (reference early return)


def test_agent_temporal_stack_ticks(rng):
    """v2-style agent (num_frame_stack=2): ring buffer, re-registration,
    age one-hots, v2 brake net — advances over GAP boundaries."""
    cfg = CFG.replace(num_frame_stack=2, max_lidar_points=768)
    init_state, step = build_agent(cfg, rgb_hw=IMG_HW)
    ks = jax.random.split(jax.random.key(9), 4)
    params = {
        "lidar_model": lidar_model_init(ks[0], cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(ks[1], cfg),
        "seg_model": seg_model_init(ks[2], len(cfg.seg_channels)),
        "bra_model": brake_model_init(ks[3], 3, version=2),
    }
    state = init_state()
    assert state.lidar_buf.shape[0] == 15  # (stack+1) * GAP
    P = state.prev_lidar.shape[0]
    jstep = jax.jit(step)
    for frame in range(7):
        ctrl, state, aux = jstep(params, state, _obs(rng, P, frame))
        assert np.isfinite(float(ctrl.steer))
    assert int(state.buf_count) == 6  # pushes start at frame 2
    assert int(state.buf_ptr) == 6


def test_agent_first_tick_zero_control(rng):
    cfg = CFG
    init_state, step = build_agent(cfg, rgb_hw=IMG_HW)
    params = _params(cfg)
    state = init_state()
    P = state.prev_lidar.shape[0]
    ctrl, state, _ = jax.jit(step)(params, state, _obs(rng, P, 0))
    assert float(ctrl.steer) == 0.0
    assert float(ctrl.throttle) == 0.0
    assert float(ctrl.brake) == 0.0


def test_ekf_latches_then_tracks():
    consts = ekf_make()
    st = ekf_init_state()
    st = ekf_predict_update(consts, st, 0.0, 0.0, 1e-4, 2e-4, 0.3)
    x0 = np.asarray(st.x)
    assert bool(st.initialized)
    # measurement latched exactly on init
    assert abs(x0[2] - 0.3) < 1e-6
    # subsequent steps stay finite and track the (static) measurement
    for _ in range(5):
        st = ekf_predict_update(consts, st, 1.0, 0.1, 1e-4, 2e-4, 0.3)
    assert np.isfinite(np.asarray(st.x)).all()
    assert abs(float(st.x[2]) - 0.3) < 0.1


def test_plan_collide_detects_and_respects_masks():
    T, K, C = 4, 3, 2
    ego = jnp.zeros((T, 2))
    # car 0 sits right on the ego plan with a confident command
    other = jnp.zeros((K, C, T, 2)).at[1:].set(100.0)
    cmds = jnp.full((K, C), 0.9)
    valid = jnp.array([True, True, True])
    kw = dict(pixels_per_meter=4.0, cmd_thresh=0.2, brake_speed=0.2)
    assert bool(plan_collide(ego, other, cmds, valid, **kw))
    # masked out -> no collision
    assert not bool(plan_collide(ego, other, cmds, jnp.array([False, True, True]), **kw))
    # low command confidence -> no collision
    assert not bool(plan_collide(ego, other, jnp.full((K, C), 0.05), valid, **kw))

"""Batched multi-ego agent stepping, sharded over a device mesh.

The headline scaling feature (BASELINE.md): the whole fused agent step is
vmapped over an ego axis and the batch sharded across devices — hundreds of
ego vehicles advance per device step on real hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lav_tpu.config import tiny_config
from lav_tpu.agent.agent import build_agent
from lav_tpu.parallel import make_mesh, batch_sharding, replicate
from tests.test_agent import _params, _obs, IMG_HW

CFG = tiny_config()


def test_vmapped_multi_ego_sharded(rng):
    n_ego = 8
    cfg = CFG
    init_state, step = build_agent(cfg, rgb_hw=IMG_HW)
    params = _params(cfg)
    P = init_state().prev_lidar.shape[0]

    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    params = replicate(mesh, params)

    states = jax.tree.map(
        lambda x: jax.device_put(jnp.stack([x] * n_ego), sh), init_state()
    )
    obs = [
        _obs(np.random.default_rng(i), P, 0) for i in range(n_ego)
    ]
    obs = jax.tree.map(
        lambda *xs: jax.device_put(jnp.stack(xs), sh), *obs
    )

    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))
    for _ in range(2):
        ctrl, states, aux = vstep(params, states, obs)

    steer = np.asarray(ctrl.steer)
    assert steer.shape == (n_ego,)
    assert np.isfinite(steer).all()
    assert int(states.num_frames[0]) == 2
    # each ego evolved its own state independently
    assert np.asarray(states.ekf.x).shape == (n_ego, 3)

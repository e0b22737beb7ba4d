"""Train-step smoke tests: loss finite + decreasing; data-parallel sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lav_tpu.config import tiny_config
from lav_tpu.models.lidar import lidar_model_init
from lav_tpu.models.planner import bev_planner_init, uniplanner_init
from lav_tpu.parallel import make_mesh, shard_batch, replicate
from lav_tpu.train.privileged import make_bev_train_step
from lav_tpu.train.distill import make_full_train_step

CFG = tiny_config()


def _bev_batch(rng, cfg, B=2):
    T, N = cfg.num_plan, cfg.max_objs
    return dict(
        bev=jnp.asarray(rng.uniform(size=(B, cfg.ny, cfg.nx, 5)).astype(np.float32)),
        ego_locs=jnp.asarray(
            np.cumsum(rng.normal(size=(B, T + 1, 2)), 1).astype(np.float32)
        ),
        cmds=jnp.zeros((B,), jnp.int32),
        nxps=jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32)),
        bras=jnp.zeros((B,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((B, N)),
        typs=jnp.ones((B, N), jnp.int32),
    )


def test_bev_train_step_decreases_loss(rng):
    cfg = CFG
    params = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_bev_train_step(cfg, opt))
    batch = _bev_batch(rng, cfg)

    vals = []
    for i in range(4):
        params, opt_state, m = step(params, opt_state, batch, jax.random.key(i))
        vals.append(float(m["loss"]))
    assert np.isfinite(vals).all()
    assert vals[-1] < vals[0], vals


def test_full_train_step_and_teacher_frozen(rng):
    cfg = CFG
    k1, k2 = jax.random.split(jax.random.key(1))
    params = {
        "lidar_model": lidar_model_init(k1, cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(k2, cfg),
    }
    teacher_before = jax.tree.map(
        lambda x: np.asarray(x).copy(), params["uniplanner"]["bev_planner"]
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_full_train_step(cfg, opt, v2=False, mode="full"))

    B, P = 2, 64
    T, N = cfg.num_plan, cfg.max_objs
    batch = dict(
        lidar=jnp.asarray(
            rng.uniform(-4, 10, size=(B, P, cfg.num_input - 5)).astype(np.float32)
        ),
        lidar_valid=jnp.ones((B, P), bool),
        heatmaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        sizemaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        orimaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        bev=jnp.asarray((rng.uniform(size=(B, cfg.ny, cfg.nx, 5)) > 0.5).astype(np.float32)),
        ego_locs=jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32)),
        cmds=jnp.zeros((B,), jnp.int32),
        nxps=jnp.zeros((B, 2)),
        bras=jnp.zeros((B,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((B, N)),
        typs=jnp.ones((B, N), jnp.int32),
    )
    params, opt_state, m = step(params, opt_state, batch, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
    # the frozen teacher must be bit-identical after the update
    teacher_after = params["uniplanner"]["bev_planner"]
    for a, b in zip(jax.tree.leaves(teacher_before), jax.tree.leaves(teacher_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_train_step_bf16(rng):
    """Mixed precision: bf16 compute, f32 losses/params/BN-stats. Loss stays
    finite over several steps, tracks the f32 loss closely on step 1, and the
    student actually moves."""
    # NOTE: the crossed-center decoration quirk (ops/pillar.py decorate,
    # reproducing reference point_pillar.py:57-58) makes raw point features
    # span the full grid extent, so bf16 rounding at random init diverges
    # more than with small cell offsets — hence the loose 12% band below.
    cfg = CFG
    k1, k2 = jax.random.split(jax.random.key(2))
    params = {
        "lidar_model": lidar_model_init(k1, cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(k2, cfg),
    }
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step16 = jax.jit(
        make_full_train_step(cfg, opt, v2=False, mode="full",
                             compute_dtype=jnp.bfloat16)
    )
    step32 = jax.jit(make_full_train_step(cfg, opt, v2=False, mode="full"))

    B, P = 2, 64
    T, N = cfg.num_plan, cfg.max_objs
    batch = dict(
        lidar=jnp.asarray(
            rng.uniform(-4, 10, size=(B, P, cfg.num_input - 5)).astype(np.float32)
        ),
        lidar_valid=jnp.ones((B, P), bool),
        heatmaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        sizemaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        orimaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        bev=jnp.asarray((rng.uniform(size=(B, cfg.ny, cfg.nx, 5)) > 0.5).astype(np.float32)),
        ego_locs=jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32)),
        cmds=jnp.zeros((B,), jnp.int32),
        nxps=jnp.zeros((B, 2)),
        bras=jnp.zeros((B,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((B, N)),
        typs=jnp.ones((B, N), jnp.int32),
    )

    _, _, m32 = step32(params, opt_state, batch, jax.random.key(3))
    p16, o16, m16 = step16(params, opt_state, batch, jax.random.key(3))
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.12, (l16, l32)
    # params stay f32 and the student moved
    for leaf in jax.tree.leaves(p16):
        assert leaf.dtype != jnp.bfloat16
    before = jax.tree.leaves(params["lidar_model"])[0]
    after = jax.tree.leaves(p16["lidar_model"])[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))
    for i in range(2):
        p16, o16, m16 = step16(p16, o16, batch, jax.random.key(10 + i))
        assert np.isfinite(float(m16["loss"]))


def test_full_train_step_remat_matches(rng):
    """remat=True must be a pure memory/compute trade: identical loss."""
    cfg = CFG
    k1, k2 = jax.random.split(jax.random.key(4))
    params = {
        "lidar_model": lidar_model_init(k1, cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(k2, cfg),
    }
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    B, P = 2, 64
    T, N = cfg.num_plan, cfg.max_objs
    batch = dict(
        lidar=jnp.asarray(
            rng.uniform(-4, 10, size=(B, P, cfg.num_input - 5)).astype(np.float32)
        ),
        lidar_valid=jnp.ones((B, P), bool),
        heatmaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        sizemaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        orimaps=jnp.asarray(rng.uniform(size=(B, 2, cfg.ny, cfg.nx)).astype(np.float32)),
        bev=jnp.asarray((rng.uniform(size=(B, cfg.ny, cfg.nx, 5)) > 0.5).astype(np.float32)),
        ego_locs=jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32)),
        cmds=jnp.zeros((B,), jnp.int32),
        nxps=jnp.zeros((B, 2)),
        bras=jnp.zeros((B,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((B, N)),
        typs=jnp.ones((B, N), jnp.int32),
    )
    outs = {}
    for rm in (False, True):
        step = jax.jit(make_full_train_step(cfg, opt, v2=False, mode="full",
                                            remat=rm))
        p, _, m = step(params, opt_state, batch, jax.random.key(7))
        outs[rm] = (float(m["loss"]), jax.tree.leaves(p["lidar_model"])[0])
    assert np.isfinite(outs[False][0])
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(outs[False][1]), np.asarray(outs[True][1]), rtol=1e-5,
        atol=1e-7,
    )


def test_bev_train_step_grad_accum(rng):
    """optax.MultiSteps(k=2): weights frozen until the k-th micro-step,
    then one averaged update (BN uses per-micro batch statistics, matching
    the reference's per-replica DataParallel BN — so the update is the
    mean of micro-grads, not bit-equal to one full-batch step)."""
    cfg = CFG
    params0 = bev_planner_init(jax.random.key(0), cfg)
    full = _bev_batch(rng, cfg, B=4)
    micro0 = jax.tree.map(lambda x: x[:2], full)
    micro1 = jax.tree.map(lambda x: x[2:], full)

    acc = optax.MultiSteps(optax.adam(1e-3), every_k_schedule=2)
    acc_state = acc.init(params0)
    astep = jax.jit(make_bev_train_step(cfg, acc))

    w0 = np.asarray(jax.tree.leaves(params0["bev_conv_emb"])[0])
    p1, acc_state, m1 = astep(params0, acc_state, micro0, jax.random.key(0))
    # conv weights untouched until the k-th micro-step
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p1["bev_conv_emb"])[0]), w0)
    p2, acc_state, m2 = astep(p1, acc_state, micro1, jax.random.key(0))
    w2 = np.asarray(jax.tree.leaves(p2["bev_conv_emb"])[0])
    assert not np.array_equal(w2, w0)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_bev_train_step_data_parallel(rng):
    """Same step on an 8-device mesh with a sharded batch: runs and stays
    finite (gradient all-reduce inserted by XLA)."""
    cfg = CFG
    mesh = make_mesh(8)
    params = replicate(mesh, bev_planner_init(jax.random.key(0), cfg))
    opt = optax.adam(1e-3)
    opt_state = replicate(mesh, opt.init(params))
    step = jax.jit(make_bev_train_step(cfg, opt))
    batch = shard_batch(mesh, _bev_batch(rng, cfg, B=8))
    params, opt_state, m = step(params, opt_state, batch, jax.random.key(5))
    assert np.isfinite(float(m["loss"]))


def test_bev_train_step_hybrid_dcn_mesh(rng):
    """(dcn=2, data=4) hybrid mesh: batch sharded over BOTH axes, loss
    EQUAL to the single-device step on the same global batch (XLA's
    hierarchical all-reduce changes nothing numerically at f32 tolerance)."""
    from lav_tpu.parallel import make_hybrid_mesh

    cfg = CFG
    mesh = make_hybrid_mesh(n_slices=2, n_devices=8)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)
    params0 = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    batch = _bev_batch(rng, cfg, B=8)

    step = jax.jit(make_bev_train_step(cfg, opt))
    _, _, m1 = step(params0, opt.init(params0), batch, jax.random.key(5))

    params = replicate(mesh, params0)
    opt_state = replicate(mesh, opt.init(params))
    sharded = shard_batch(mesh, batch)
    for leaf in jax.tree.leaves(sharded):
        assert not leaf.sharding.is_fully_replicated
    _, _, m2 = step(params, opt_state, sharded, jax.random.key(5))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)

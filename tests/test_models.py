"""Shape/finiteness/grad tests for the model zoo on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lav_tpu.config import tiny_config
from lav_tpu.models.lidar import lidar_model_init, lidar_model_apply
from lav_tpu.models.planner import (
    bev_planner_init, bev_planner_forward, bev_planner_infer,
    uniplanner_init, uniplanner_forward,
)
from lav_tpu.models import losses

CFG = tiny_config()


def _lidar_kwargs(cfg):
    return dict(
        min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y, max_y=cfg.max_y,
        pixels_per_meter=cfg.pixels_per_meter, num_features=cfg.num_features,
    )


def test_lidar_model_shapes(rng):
    cfg = CFG
    key = jax.random.key(0)
    num_input = cfg.num_input
    params = lidar_model_init(key, num_input, cfg.num_features)
    B, P = 2, 64
    pts = jnp.asarray(rng.uniform(-5, 10, size=(B, P, num_input - 5)).astype(np.float32))
    valid = jnp.ones((B, P), bool)
    feats, hm, size, ori, bev, _ = lidar_model_apply(
        params, pts, valid, train=True, **_lidar_kwargs(cfg)
    )
    assert feats.shape == (B, cfg.ny // 2, cfg.nx // 2, 6 * cfg.num_features[-1])
    assert hm.shape == (B, 2, cfg.ny, cfg.nx)
    assert size.shape == (B, 2, cfg.ny, cfg.nx)
    assert bev.shape == (B, 3, cfg.ny, cfg.nx)
    assert np.isfinite(np.asarray(bev)).all()
    assert float(bev.min()) >= 0.0 and float(bev.max()) <= 1.0  # sigmoided


def test_bev_planner_forward_and_losses(rng):
    cfg = CFG
    params = bev_planner_init(jax.random.key(1), cfg)
    B, T, N = 2, cfg.num_plan, cfg.max_objs
    bev = jnp.asarray(rng.normal(size=(B, cfg.ny, cfg.nx, 5)).astype(np.float32))
    ego_locs = jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32))
    locs = jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32))
    oris = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    nxps = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    typs = jnp.ones((B, N), jnp.int32)
    cmds = jnp.zeros((B,), jnp.int32)

    out, _ = bev_planner_forward(
        params, cfg, bev, ego_locs, locs, oris, nxps, typs,
        jax.random.key(2), train=True,
    )
    C, K, I = cfg.num_cmds, cfg.max_num_cars, cfg.num_plan_iter
    assert out.ego_plan_locs.shape == (B, I, C, T, 2)
    assert out.ego_cast_locs.shape == (B, C, T, 2)
    assert out.other_cast_locs.shape == (B, K, C, T, 2)
    assert out.car_valid.dtype == bool

    # the teacher losses (lav_privileged.py:113-122)
    pl = losses.plan_loss_all_cmds(out.ego_plan_locs, ego_locs[:, 1:])
    cl = losses.cast_loss_at_cmd(out.ego_cast_locs, ego_locs[:, 1:], cmds)
    ol = losses.other_cast_loss_min_mode(
        out.other_cast_locs, out.other_locs, out.car_valid
    )
    cmdl = losses.cmd_bce(out.ego_cast_cmds, cmds, cfg.num_cmds)
    for v in (pl, cl, ol, cmdl):
        assert np.isfinite(float(v))


def test_bev_planner_no_cars_masked(rng):
    """All-pedestrian scene: car_valid must be all False and the masked
    other-cast loss must be exactly 0 (reference zero-branch,
    bev_planner.py:127-137)."""
    cfg = CFG
    params = bev_planner_init(jax.random.key(1), cfg)
    B, T, N = 1, cfg.num_plan, cfg.max_objs
    out, _ = bev_planner_forward(
        params, cfg,
        jnp.zeros((B, cfg.ny, cfg.nx, 5)),
        jnp.zeros((B, T + 1, 2)),
        jnp.zeros((B, N, T + 1, 2)),
        jnp.zeros((B, N)),
        jnp.zeros((B, 2)),
        jnp.zeros((B, N), jnp.int32),  # all type-0
        jax.random.key(3), train=True,
    )
    assert not bool(out.car_valid.any())
    ol = losses.other_cast_loss_min_mode(
        out.other_cast_locs, out.other_locs, out.car_valid
    )
    assert float(ol) == 0.0


def test_uniplanner_forward_distill_grad(rng):
    """Student gradient flows; frozen teacher gets zero gradient."""
    cfg = CFG
    key = jax.random.key(4)
    params = uniplanner_init(key, cfg)
    B, T, N = 1, cfg.num_plan, cfg.max_objs
    Cf = cfg.uniplanner_input_channels
    feats = jnp.asarray(
        rng.normal(size=(B, cfg.ny // 2, cfg.nx // 2, Cf)).astype(np.float32)
    )
    bev = jnp.asarray(rng.normal(size=(B, cfg.ny, cfg.nx, 5)).astype(np.float32))
    ego_locs = jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32))
    locs = jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32))
    oris = jnp.zeros((B, N))
    nxps = jnp.zeros((B, 2))
    typs = jnp.ones((B, N), jnp.int32)

    def loss_fn(p):
        out, _ = uniplanner_forward(
            p, cfg, feats, bev, ego_locs, locs, oris, nxps, typs,
            jax.random.key(5), train=True,
        )
        return (
            losses.distill_l1(out.ego_cast_locs, out.ego_cast_locs_expert)
            + losses.distill_l1(
                out.other_cast_locs, out.other_cast_locs_expert, out.car_valid
            )
        )

    g = jax.grad(loss_fn)(params)
    student_norm = float(
        jnp.abs(g["cast_grus"]["w_ih"]).sum() + jnp.abs(g["lidar_conv_emb"]["conv1"]["w"]).sum()
    )
    teacher_norm = float(
        sum(jnp.abs(x).sum() for x in jax.tree.leaves(g["bev_planner"]))
    )
    assert student_norm > 0
    assert teacher_norm == 0.0


def test_uniplanner_infer_merged_crop_path(rng):
    """The TPU route folds the ego crop into the detection crops (one
    kernel launch, one conv_emb/cast pass) — must equal the separate-crop
    fallback exactly.  On CPU use_pallas_crop=True exercises the merged
    logic with the XLA sampler (compiled Pallas falls back off-TPU)."""
    import numpy as np
    from lav_tpu.config import tiny_config
    from lav_tpu.models.planner import uniplanner_init, uniplanner_infer

    cfg = tiny_config()
    params = uniplanner_init(jax.random.key(0), cfg)
    nrng = np.random.default_rng(11)
    Hf = Wf = cfg.ny // 2
    feats = jnp.asarray(nrng.uniform(
        -1, 1, (Hf, Wf, cfg.uniplanner_input_channels)).astype(np.float32))
    K = 4
    det = dict(
        x=jnp.asarray(nrng.uniform(0, cfg.nx, (K,)).astype(np.float32)),
        y=jnp.asarray(nrng.uniform(0, cfg.ny, (K,)).astype(np.float32)),
        w=jnp.ones((K,)), h=jnp.ones((K,)),
        cos=jnp.asarray(np.cos(nrng.uniform(-3, 3, (K,))).astype(np.float32)),
        sin=jnp.asarray(np.sin(nrng.uniform(-3, 3, (K,))).astype(np.float32)),
        valid=jnp.ones((K,), bool),
    )
    a = uniplanner_infer(params, cfg, feats, det, jnp.asarray(1),
                         jnp.asarray([2.0, -3.0]), use_pallas_crop=False)
    b = uniplanner_infer(params, cfg, feats, det, jnp.asarray(1),
                         jnp.asarray([2.0, -3.0]), use_pallas_crop=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-5)


def test_merged_heads_match_separate(rng):
    """The fused four-head path (one conv + bn + block-diagonal convT) must
    equal running each head separately — values, BN states, and parameter
    gradients, train and eval."""
    import lav_tpu.models.lidar as LM
    import numpy as np

    cfg = tiny_config()
    params = lidar_model_init(jax.random.key(2), cfg.num_input,
                              cfg.num_features)
    nrng = np.random.default_rng(13)
    B, P = 2, 256
    pts = jnp.asarray(
        nrng.uniform(-6, 6, (B, P, cfg.num_input - 5)).astype(np.float32))
    valid = jnp.asarray(nrng.uniform(size=(B, P)) > 0.3)
    kw = dict(min_x=cfg.min_x, max_x=cfg.max_x, min_y=cfg.min_y,
              max_y=cfg.max_y, pixels_per_meter=cfg.pixels_per_meter,
              num_features=cfg.num_features)

    def run(merged, train):
        old = LM.MERGED_HEADS
        LM.MERGED_HEADS = merged
        try:
            return lidar_model_apply(params, pts, valid, train=train, **kw)
        finally:
            LM.MERGED_HEADS = old

    for train in (False, True):
        a = run(False, train)
        b = run(True, train)
        for x, y in zip(a[:5], b[:5]):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5, rtol=1e-5)
        sa = jax.tree.leaves(a[5])
        sb = jax.tree.leaves(b[5])
        for x, y in zip(sa, sb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5, rtol=1e-5)

    def loss(p, merged):
        old = LM.MERGED_HEADS
        LM.MERGED_HEADS = merged
        try:
            feats, hm, box, ori, seg, _ = lidar_model_apply(
                p, pts, valid, train=True, **kw)
        finally:
            LM.MERGED_HEADS = old
        return (jnp.sum(hm ** 2) + jnp.sum(box ** 2) + jnp.sum(ori ** 2)
                + jnp.sum(seg) + jnp.sum(feats ** 2))

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)

    # summation order differs through the merged convT (measured rel
    # ~1e-6), and biases feeding straight into BN have ANALYTICALLY ZERO
    # gradients (shift invariance) where both paths produce only noise —
    # so compare against the global gradient scale, not per-leaf
    gscale = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g0))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x) / gscale, np.asarray(y) / gscale, atol=1e-5),
        g0, g1,
    )

"""Full-model parity oracle against the ACTUAL reference classes.

Imports the reference's own torch modules from /root/reference/lav/models
(with a pure-torch `torch_scatter` stub), random-initializes them on CPU,
converts their state_dicts through lav_tpu.utils.weights, and asserts
end-to-end forward parity with the lav_tpu implementations.  With the
released .th checkpoints being git-lfs stubs, this is the strongest
attainable bit-for-policy oracle (VERDICT.md round-1 item 1).

Covered reference architectures (the 9 released checkpoints):
  seg (ERFNet)             rgb.py:35-45
  bra v1 / bra v2          rgb.py:47-78 / rgb_v2.py:48-82
  lidar v1 / lidar v2      lidar.py + point_pillar.py (full forward)
  bev v1 / bev v2          bev_planner.py:50-72 / bev_planner_v2.py
  uniplanner v1 (+teacher) uniplanner.py:160-224 (infer) and :56-150 (forward)
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")


# ---------------------------------------------------------------------------
# torch_scatter stub (reference point_pillar.py:6 is the only native dep)
# ---------------------------------------------------------------------------

def _scatter_mean(src, index, dim=0):
    assert dim == 0
    n = int(index.max()) + 1
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    cnt = torch.zeros((n,), dtype=src.dtype)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    return out / cnt.clamp(min=1).reshape(-1, *([1] * (src.dim() - 1)))


def _scatter_max(src, index, dim=0):
    assert dim == 0
    n = int(index.max()) + 1
    out = torch.full((n,) + src.shape[1:], -torch.inf, dtype=src.dtype)
    idx = index.reshape(-1, *([1] * (src.dim() - 1))).expand_as(src)
    out.scatter_reduce_(0, idx, src, reduce="amax", include_self=False)
    return out, None  # reference uses [0] only


if "torch_scatter" not in sys.modules:
    stub = types.ModuleType("torch_scatter")
    stub.scatter_mean = _scatter_mean
    stub.scatter_max = _scatter_max
    sys.modules["torch_scatter"] = stub


from lav_tpu.config import LAVConfig  # noqa: E402
from lav_tpu.utils import weights as W  # noqa: E402


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _t(rng, *shape, scale=1.0):
    return torch.tensor(
        rng.normal(size=shape).astype(np.float32) * scale
    )


TOL = dict(atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# ERFNet segmentation
# ---------------------------------------------------------------------------

def test_oracle_seg_model(rng):
    from lav.models.rgb import RGBSegmentationModel
    from lav_tpu.models.rgb import seg_model_apply

    torch.manual_seed(0)
    m = RGBSegmentationModel([4, 6, 7, 10]).eval()
    rgb = torch.tensor(
        rng.uniform(0, 255, (2, 3, 64, 96)).astype(np.float32)
    )
    with torch.no_grad():
        ref = m(rgb).numpy()

    params = W.convert_seg_model(_sd(m))
    out, _ = seg_model_apply(
        params, jnp.asarray(rgb.numpy().transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, **TOL
    )


# ---------------------------------------------------------------------------
# Brake prediction v1 / v2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("version", [1, 2])
def test_oracle_brake_model(rng, version):
    if version == 1:
        from lav.models.rgb import RGBBrakePredictionModel
    else:
        from lav.models.rgb_v2 import RGBBrakePredictionModel
    from lav_tpu.models.rgb import brake_model_apply

    torch.manual_seed(1)
    m = RGBBrakePredictionModel([4, 10, 18], pretrained=False).eval()
    rgb1 = torch.tensor(rng.uniform(0, 255, (2, 3, 64, 96)).astype(np.float32))
    rgb2 = torch.tensor(rng.uniform(0, 255, (2, 3, 64, 64)).astype(np.float32))
    with torch.no_grad():
        bra, sem1, sem2 = m(rgb1, rgb2, mask=True)

    params = W.convert_brake_model(_sd(m), version=version)
    nhwc = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    pred, psem1, psem2, _ = brake_model_apply(
        params, nhwc(rgb1), nhwc(rgb2), False, with_mask=True, version=version
    )
    np.testing.assert_allclose(np.asarray(pred), bra.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(psem1).transpose(0, 3, 1, 2), sem1.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(psem2).transpose(0, 3, 1, 2), sem2.numpy(), **TOL
    )


# ---------------------------------------------------------------------------
# LiDARModel (PointPillarNet + ConvBackbone + 4 heads), v1 and v2 widths
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_features", [[32, 32], [64, 64]])
def test_oracle_lidar_model(rng, num_features):
    from lav.models.lidar import LiDARModel
    from lav_tpu.models.lidar import lidar_model_apply

    geom = dict(min_x=-2, max_x=6, min_y=-4, max_y=4, pixels_per_meter=4)
    num_input = 9
    torch.manual_seed(2)
    m = LiDARModel(num_input=num_input, num_features=num_features,
                   backbone="cnn", **geom).eval()

    P1, P2 = 300, 200
    def pts(n):
        a = rng.uniform(-1, 1, (n, num_input - 5)).astype(np.float32)
        a[:, 0] = rng.uniform(-3, 7, n)   # x: some out of range
        a[:, 1] = rng.uniform(-5, 5, n)   # y
        return a

    p1, p2 = pts(P1), pts(P2)
    with torch.no_grad():
        feats, hm, box, ori, seg = m(
            [torch.tensor(p1), torch.tensor(p2)], [P1, P2]
        )

    params = W.convert_lidar_model(_sd(m), num_features=num_features)
    P = max(P1, P2)
    batch = np.zeros((2, P, num_input - 5), np.float32)
    valid = np.zeros((2, P), bool)
    batch[0, :P1], valid[0, :P1] = p1, True
    batch[1, :P2], valid[1, :P2] = p2, True
    jfeats, jhm, jbox, jori, jseg, _ = lidar_model_apply(
        params, jnp.asarray(batch), jnp.asarray(valid),
        num_features=num_features, train=False,
        **{k: float(v) for k, v in geom.items()},
    )
    np.testing.assert_allclose(
        np.asarray(jfeats).transpose(0, 3, 1, 2), feats.numpy(), **TOL
    )
    for jout, tout in ((jhm, hm), (jbox, box), (jori, ori), (jseg, seg)):
        np.testing.assert_allclose(np.asarray(jout), tout.numpy(), **TOL)


# ---------------------------------------------------------------------------
# BEVPlanner.infer v1 / v2
# ---------------------------------------------------------------------------

def _bev_cfg(**kw):
    # defaults give y_offset == 0.75, matching the reference ctor default
    return LAVConfig(num_plan=10, num_cmds=6, num_plan_iter=5,
                     crop_size=32, **kw)


@pytest.mark.parametrize("v2", [False, True])
def test_oracle_bev_planner_infer(rng, v2):
    if v2:
        from lav.models.bev_planner_v2 import BEVPlanner
    else:
        from lav.models.bev_planner import BEVPlanner
    from lav_tpu.models.planner import bev_planner_init, bev_planner_infer

    torch.manual_seed(3)
    kw = dict(num_frame_stack=2) if v2 else {}
    m = BEVPlanner(pixels_per_meter=4, crop_size=32, num_plan=10,
                   num_plan_iter=5, **kw).eval()
    cfg = _bev_cfg(num_frame_stack=2 if v2 else 0)
    cin = cfg.bev_input_channels
    assert cin == (9 if v2 else 5)

    # reference infer hardcodes batch 1 (bev_planner.py:52-55)
    bev = torch.tensor(rng.uniform(0, 1, (1, cin, 96, 96)).astype(np.float32))
    nxps = _t(rng, 1, 2, scale=4.0)
    with torch.no_grad():
        plan, cast_locs, cmds = m.infer(bev, nxps)

    params = jax.tree.map(
        jnp.asarray, W.convert_bev_planner(_sd(m), num_cmds=6)
    )
    jplan, jcast, jcmds = bev_planner_infer(
        params, cfg, jnp.asarray(bev.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(nxps.numpy()),
    )
    np.testing.assert_allclose(np.asarray(jplan), plan.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(jcast), cast_locs.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(jcmds), cmds.numpy(), **TOL)


# ---------------------------------------------------------------------------
# UniPlanner.infer (detections path) and forward (distillation path)
# ---------------------------------------------------------------------------

def _make_uniplanner(torch_seed=4):
    from lav.models.bev_planner import BEVPlanner
    from lav.models.uniplanner import UniPlanner

    torch.manual_seed(torch_seed)
    teacher = BEVPlanner(pixels_per_meter=4, crop_size=32, num_plan=10,
                         num_plan_iter=5)
    m = UniPlanner(teacher, pixels_per_meter=4, crop_size=32,
                   num_input_feature=96, num_plan=10, num_plan_iter=5,
                   max_num_cars=4).eval()
    cfg = _bev_cfg(num_features=[16, 16], max_num_cars_student=4)
    assert cfg.uniplanner_input_channels == 96
    return m, cfg


def test_oracle_uniplanner_infer(rng):
    from lav_tpu.models.planner import uniplanner_infer

    m, cfg = _make_uniplanner()
    Hf = Wf = 48
    feats = rng.uniform(-1, 1, (Hf, Wf, 96)).astype(np.float32)

    # detections in canvas px (full-res 96x96 frame), one inside the 4-px
    # ego-exclusion zone (must be dropped by both implementations)
    center = np.array([48.0, 48 + 0.75 * 48])
    det_rows = [
        (center[0] + 20, center[1] - 30, 8, 4, np.cos(0.5), np.sin(0.5)),
        (center[0] - 25, center[1] + 10, 8, 4, np.cos(-1.2), np.sin(-1.2)),
        (center[0] + 1, center[1] - 1, 8, 4, 1.0, 0.0),  # excluded
    ]
    cmd, nxp = 2, np.array([3.0, -6.0], np.float32)
    with torch.no_grad():
        t_feats = torch.tensor(feats.transpose(2, 0, 1))
        ego_plan, ego_cast, other_locs, other_cmds = m.infer(
            t_feats, det_rows, cmd, torch.tensor(nxp)
        )

    params = jax.tree.map(jnp.asarray, W.convert_uniplanner(_sd(m)))
    K = cfg.max_det
    det = {k: jnp.zeros((K,)) for k in ("x", "y", "w", "h", "cos", "sin")}
    det["valid"] = jnp.zeros((K,), bool)
    for i, (X, Y, h, w, c, s) in enumerate(det_rows):
        det["x"] = det["x"].at[i].set(X)
        det["y"] = det["y"].at[i].set(Y)
        det["h"] = det["h"].at[i].set(h)
        det["w"] = det["w"].at[i].set(w)
        det["cos"] = det["cos"].at[i].set(c)
        det["sin"] = det["sin"].at[i].set(s)
        det["valid"] = det["valid"].at[i].set(True)

    jplan, jcast, jolocs, jocmds, jovalid = uniplanner_infer(
        params, cfg, jnp.asarray(feats), det, jnp.asarray(cmd),
        jnp.asarray(nxp),
    )
    np.testing.assert_allclose(np.asarray(jplan), ego_plan.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(jcast), ego_cast.numpy(), **TOL)
    ov = np.asarray(jovalid)
    assert ov.tolist()[:3] == [True, True, False]
    np.testing.assert_allclose(
        np.asarray(jolocs)[:2], other_locs.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(jocmds)[:2], other_cmds.numpy(), **TOL
    )


def test_oracle_uniplanner_forward_distill(rng, monkeypatch):
    """Training-path parity: zero jitter (torch.rand patched to 0.5), all
    qualifying cars <= max_num_cars so no random subsample; compares student
    AND frozen-teacher outputs, per-car order matched on other_locs."""
    from lav_tpu.models.planner import uniplanner_forward

    m, cfg = _make_uniplanner()
    def _half_rand(*s, **k):
        if len(s) == 1 and isinstance(s[0], (tuple, torch.Size)):
            s = tuple(s[0])
        return torch.full(s, 0.5)

    monkeypatch.setattr(torch, "rand", _half_rand, raising=True)

    B, N, T = 2, 5, cfg.num_plan  # slot 0 ego + 4 others == max_num_cars
    Hf = Wf = 48
    feats = rng.uniform(-1, 1, (B, Hf, Wf, 96)).astype(np.float32)
    bev = rng.uniform(0, 1, (B, 5, 96, 96)).astype(np.float32)

    ego_locs = np.cumsum(
        rng.uniform(-0.3, 0.3, (B, T + 1, 2)), axis=1
    ).astype(np.float32)
    locs = np.cumsum(
        rng.uniform(-0.4, 0.4, (B, N, T + 1, 2)), axis=2
    ).astype(np.float32)
    locs[:, :, 0] += rng.uniform(-8, 8, (B, N, 2))
    locs[..., 1] -= 10.0  # all ahead of ego -> all qualify (<= 4 cars)
    locs[:, 0] = ego_locs  # slot 0 is the ego
    oris = rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32)
    typs = np.ones((B, N), np.int64)
    nxps = rng.uniform(-5, 5, (B, 2)).astype(np.float32)

    with torch.no_grad():
        (t_olocs, t_ocast, t_ocmds, t_ocast_e, t_ocmds_e, t_elocs, t_eplan,
         t_ecast, t_ecmds, t_ecast_e, t_eplan_e) = m(
            torch.tensor(feats.transpose(0, 3, 1, 2)),
            torch.tensor(bev),
            torch.tensor(ego_locs), torch.tensor(locs),
            torch.tensor(oris), torch.tensor(nxps), torch.tensor(typs),
        )

    params = jax.tree.map(jnp.asarray, W.convert_uniplanner(_sd(m)))
    out, _ = uniplanner_forward(
        params, cfg, jnp.asarray(feats),
        jnp.asarray(bev.transpose(0, 2, 3, 1)),
        jnp.asarray(ego_locs), jnp.asarray(locs), jnp.asarray(oris),
        jnp.asarray(nxps), jnp.asarray(typs), jax.random.key(0),
        train=False,  # zero jitter, matching the patched torch.rand
    )

    # ego-path comparisons are order-free
    np.testing.assert_allclose(np.asarray(out.ego_plan_locs),
                               t_eplan.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_cast_locs),
                               t_ecast.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_cast_cmds),
                               t_ecmds.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_plan_locs_expert),
                               t_eplan_e.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_cast_locs_expert),
                               t_ecast_e.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_locs),
                               t_elocs.numpy(), **TOL)

    # other-car slots: reference flattens (B*K) in batch-major order; match
    # jax slots to torch rows by nearest other_locs
    assert bool(np.asarray(out.car_valid).all())
    j_olocs = np.asarray(out.other_locs).reshape(B, -1, T, 2)
    t_olocs_np = t_olocs.numpy().reshape(B, -1, T, 2)
    K = j_olocs.shape[1]
    for b in range(B):
        d = np.linalg.norm(
            j_olocs[b][:, None] - t_olocs_np[b][None], axis=(-1, -2)
        )
        match = d.argmin(axis=1)
        assert sorted(match.tolist()) == list(range(K))
        np.testing.assert_allclose(j_olocs[b], t_olocs_np[b][match], **TOL)
        for jarr, tarr in (
            (out.other_cast_locs, t_ocast),
            (out.other_cast_cmds, t_ocmds),
            (out.other_cast_locs_expert, t_ocast_e),
            (out.other_cast_cmds_expert, t_ocmds_e),
        ):
            ja = np.asarray(jarr).reshape((B, K) + jarr.shape[2:])[b]
            ta = tarr.numpy().reshape((B, K) + tuple(tarr.shape[1:]))[b]
            np.testing.assert_allclose(ja, ta[match], **TOL)


def test_oracle_bev_planner_forward(rng, monkeypatch):
    """Teacher training-path parity (reference bev_planner.py:74-176):
    zero jitter (torch.rand patched to 0.5), all qualifying cars <=
    max_num_cars so no random subsample; compares other-car casts (order
    matched on other_locs) and the ego plan/cast/cmd heads."""
    from lav.models.bev_planner import BEVPlanner
    from lav_tpu.models.planner import bev_planner_init, bev_planner_forward

    torch.manual_seed(6)
    m = BEVPlanner(pixels_per_meter=4, crop_size=32, num_plan=10,
                   num_plan_iter=5).eval()
    cfg = _bev_cfg()
    assert cfg.max_num_cars == 5

    def _half_rand(*s, **k):
        if len(s) == 1 and isinstance(s[0], (tuple, torch.Size)):
            s = tuple(s[0])
        return torch.full(s, 0.5)

    monkeypatch.setattr(torch, "rand", _half_rand, raising=True)

    B, N, T = 2, 6, cfg.num_plan  # slot 0 ego + 5 others == max_num_cars
    bev = rng.uniform(0, 1, (B, 5, 96, 96)).astype(np.float32)
    ego_locs = np.cumsum(
        rng.uniform(-0.3, 0.3, (B, T + 1, 2)), axis=1
    ).astype(np.float32)
    locs = np.cumsum(
        rng.uniform(-0.4, 0.4, (B, N, T + 1, 2)), axis=2
    ).astype(np.float32)
    locs[:, :, 0] += rng.uniform(-8, 8, (B, N, 2))
    locs[..., 1] -= 10.0  # all ahead of the ego -> every slot qualifies
    locs[:, 0] = ego_locs  # slot 0 is the ego
    oris = rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32)
    typs = np.ones((B, N), np.int64)
    nxps = rng.uniform(-5, 5, (B, 2)).astype(np.float32)

    with torch.no_grad():
        (t_olocs, t_ocast, t_ocmds, t_eplan, t_ecast, t_ecmds) = m(
            torch.tensor(bev),
            torch.tensor(ego_locs), torch.tensor(locs),
            torch.tensor(oris), torch.tensor(nxps), torch.tensor(typs),
        )

    params = jax.tree.map(
        jnp.asarray, W.convert_bev_planner(_sd(m), num_cmds=6)
    )
    out, _ = bev_planner_forward(
        params, cfg, jnp.asarray(bev.transpose(0, 2, 3, 1)),
        jnp.asarray(ego_locs), jnp.asarray(locs), jnp.asarray(oris),
        jnp.asarray(nxps), jnp.asarray(typs), jax.random.key(0),
        train=False,  # zero jitter, matching the patched torch.rand
    )

    np.testing.assert_allclose(np.asarray(out.ego_plan_locs),
                               t_eplan.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_cast_locs),
                               t_ecast.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.ego_cast_cmds),
                               t_ecmds.numpy(), **TOL)

    # other-car slots: match jax slots to torch rows by nearest other_locs
    assert bool(np.asarray(out.car_valid).all())
    K = cfg.max_num_cars
    j_olocs = np.asarray(out.other_locs).reshape(B, K, T, 2)
    t_olocs_np = t_olocs.numpy().reshape(B, K, T, 2)
    j_ocast = np.asarray(out.other_cast_locs)
    j_ocmds = np.asarray(out.other_cast_cmds)
    t_ocast_np = t_ocast.numpy().reshape(B, K, cfg.num_cmds, T, 2)
    t_ocmds_np = t_ocmds.numpy().reshape(B, K, cfg.num_cmds)
    for b in range(B):
        d = np.linalg.norm(
            j_olocs[b][:, None] - t_olocs_np[b][None], axis=(-1, -2)
        )
        match = d.argmin(axis=1)
        assert sorted(match.tolist()) == list(range(K))
        np.testing.assert_allclose(j_olocs[b], t_olocs_np[b][match], **TOL)
        np.testing.assert_allclose(j_ocast[b], t_ocast_np[b][match], **TOL)
        np.testing.assert_allclose(j_ocmds[b], t_ocmds_np[b][match], **TOL)

"""Round-2 observability additions: MJPEG-AVI eval video, gradient
watching, elastic augmentation."""

import os
import struct

import numpy as np
import jax
import optax

from lav_tpu.utils.video import VideoRecorder
from lav_tpu.utils.logging import Logger


def test_video_recorder_writes_valid_avi(tmp_path):
    path = str(tmp_path / "run.avi")
    rec = VideoRecorder(path, fps=20)
    rng = np.random.default_rng(0)
    for _ in range(6):
        rec.append(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    assert len(rec) == 6
    assert rec.close() == path

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data
    # 6 frame chunks present
    assert data.count(b"00dc") >= 6 + 6  # movi chunks + idx entries

    # frames decode back as JPEGs
    from PIL import Image
    import io
    first = data.find(b"00dc", data.find(b"movi"))
    size = struct.unpack("<I", data[first + 4:first + 8])[0]
    img = Image.open(io.BytesIO(data[first + 8:first + 8 + size]))
    assert img.size == (64, 48)


def test_video_recorder_max_frames(tmp_path):
    rec = VideoRecorder(str(tmp_path / "v.avi"), max_frames=3)
    for _ in range(10):
        rec.append(np.zeros((8, 8, 3), np.uint8))
    assert len(rec) == 3


def test_logger_log_gradients(tmp_path):
    logger = Logger("test_grads", save_dir=str(tmp_path))
    grads = {"layer": {"w": np.full((4, 4), 2.0), "b": np.zeros((4,))}}
    rec = logger.log_gradients(0, grads)
    logger.close()
    assert rec["grad/layer/w"] == 8.0
    assert rec["grad/layer/b"] == 0.0
    assert abs(rec["grad/global_norm"] - 8.0) < 1e-9


def test_train_step_reports_grad_norm(rng):
    from lav_tpu.config import tiny_config
    from lav_tpu.models.planner import bev_planner_init
    from lav_tpu.train.privileged import make_bev_train_step
    import jax.numpy as jnp

    cfg = tiny_config()
    params = bev_planner_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    step = jax.jit(make_bev_train_step(cfg, opt))
    B, T, N = 2, cfg.num_plan, cfg.max_objs
    batch = dict(
        bev=jnp.asarray(rng.uniform(size=(B, cfg.ny, cfg.nx, 5)).astype(np.float32)),
        ego_locs=jnp.asarray(rng.normal(size=(B, T + 1, 2)).astype(np.float32)),
        cmds=jnp.zeros((B,), jnp.int32),
        nxps=jnp.zeros((B, 2)),
        bras=jnp.zeros((B,), jnp.int32),
        locs=jnp.asarray(rng.normal(size=(B, N, T + 1, 2)).astype(np.float32)),
        oris=jnp.zeros((B, N)),
        typs=jnp.ones((B, N), jnp.int32),
    )
    _, _, m = step(params, opt.init(params), batch, jax.random.key(1))
    assert np.isfinite(float(m["grad_norm"])) and float(m["grad_norm"]) > 0


def test_elastic_augmentation():
    from lav_tpu.data.augment import _elastic

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (32, 40, 3)).astype(np.float32)
    out = _elastic(np.random.default_rng(5), img)
    assert out.shape == img.shape
    assert not np.allclose(out, img)          # it actually warps
    assert abs(out.mean() - img.mean()) < 8   # but only locally (small alpha)
    # deterministic given the rng state
    out2 = _elastic(np.random.default_rng(5), img)
    np.testing.assert_array_equal(out, out2)


def test_augmenter_includes_elastic():
    from lav_tpu.data import augment

    assert augment._elastic in augment._OPS
    aug = augment.Augmenter(prob=1.0, seed=0)
    img = np.random.default_rng(0).integers(
        0, 255, (32, 32, 3), dtype=np.uint8
    )
    out = aug(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_fusion_kinds_from_hlo_nested():
    """Fusion trace names hide their content; the HLO-based classifier
    must see through one level of kCustom fusion nesting (the pillar
    scatters compile to fusion-in-fusion)."""
    from lav_tpu.utils.roofline import fusion_kinds_from_hlo, per_class_ms

    hlo = """\
%fused_computation.9 (p0: bf16[8,128]) -> bf16[8,128] {
  %p0 = bf16[8,128]{1,0} parameter(0)
  ROOT %s = bf16[8,128]{1,0} scatter(%p0, %p0, %p0), to_apply=%max
}

%fused_computation.8 (p0: bf16[8,128]) -> bf16[8,128] {
  %p0 = bf16[8,128]{1,0} parameter(0)
  ROOT %inner = bf16[8,128]{1,0} fusion(%p0), kind=kCustom, calls=%fused_computation.9
}

%fused_computation.7 (p0: bf16[8,128]) -> bf16[8,128] {
  %p0 = bf16[8,128]{1,0} parameter(0)
  ROOT %c = bf16[8,128]{1,0} convolution(%p0, %p0), window={}
}

ENTRY %main (a: bf16[8,128]) -> bf16[8,128] {
  %a = bf16[8,128]{1,0} parameter(0)
  %fusion.1 = bf16[8,128]{1,0} fusion(%a), kind=kCustom, calls=%fused_computation.8
  ROOT %fusion.2 = bf16[8,128]{1,0} fusion(%fusion.1), kind=kOutput, calls=%fused_computation.7
}
"""
    fk = fusion_kinds_from_hlo(hlo)
    assert fk["fusion.1"] == "scatter", fk
    assert fk["fusion.2"] == "conv", fk
    classes = per_class_ms({"fusion.1": 2000.0, "fusion.2": 1000.0,
                            "copy.5": 500.0}, iters=1, fusion_kinds=fk)
    assert classes == {"scatter": 2.0, "conv": 1.0, "copy": 0.5}


def test_point_budget_brackets():
    """The derived operating points must keep their bracket ordering:
    flat-world in-box <= geometric in-box cap <= all-rays cap, and the
    bench default (60k stacked) must sit inside [flat-world, config cap]."""
    from lav_tpu.utils.point_budget import summary

    s = summary()
    assert s["stacked_flat_world"] <= s["v2_config_cap"] == 120_000
    # bench.py's derived default: 6 * 10,000 stacked
    assert s["stacked_flat_world"] >= 60_000 * 0.8  # sanity: same regime
    per_sweep = s["stacked_flat_world"] / 3
    assert 0 < per_sweep <= 60_000  # hard all-rays cap per fused sweep

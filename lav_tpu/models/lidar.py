"""LiDAR perception model: PointPillars + FPN conv backbone + dense heads.

Architecture mirrors the reference LiDARModel
(/root/reference/lav/models/lidar.py:7-164): three strided conv stages whose
transposed-conv up-projections concatenate to a 6*num_feature half-resolution
feature map, plus four heads (center heatmap, box size, orientation, BEV
segmentation).  Note the reference's Conv->ReLU->BN ordering (BN after the
activation, eps=1e-3, momentum=0.01) — reproduced exactly for weight parity.

TPU-first differences: NHWC, pillar featurization is the static-shape
segment-op formulation in lav_tpu.ops.pillar, and the whole forward is one
jittable function.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L
from lav_tpu.ops.pillar import point_pillar_init, point_pillar_apply

_BN_CFG = dict(eps=1e-3, momentum=0.01)


def _conv_block_init(key, cin, cout):
    return {"conv": L.conv2d_init(key, cin, cout, 3, bias=False),
            "bn": L.batchnorm_init(cout)}


def _conv_block(p, x, stride, train, entry=False):
    # non-entry blocks may carry int8-quantized weights (nn/quant.py) with
    # no raw "w"; only the entry block (never quantized) reads it
    w = p["conv"]["w"] if entry else None
    if entry and x.shape[-1] == 128 and w.shape[2] < 128:
        # lane-padded canvas (ops/pillar.py PAD_CANVAS_LANES pads to
        # exactly 128): zero-pad the input-channel dim of the kernel —
        # identical math, and the conv consumes the scatter's (..., 128)
        # layout without a retile pass.  Only the backbone ENTRY block may
        # do this (its input is the pillar canvas); any other block seeing
        # a channel mismatch is a genuine bug and must fail the conv shape
        # check loudly rather than silently zero-pad real features.
        p = dict(p, conv=dict(
            p["conv"],
            w=jnp.pad(w, ((0, 0), (0, 0), (0, 128 - w.shape[2]), (0, 0))),
        ))
    out = L.conv2d(p["conv"], x, stride=stride, padding=1)
    out = jax.nn.relu(out)
    out, st = L.batchnorm(p["bn"], out, train, **_BN_CFG)
    return out, {"bn": st}


def _upconv_block_init(key, cin, cout, ksize):
    return {"conv": L.conv_transpose2d_init(key, cin, cout, ksize, bias=False),
            "bn": L.batchnorm_init(cout)}


def _upconv_block(p, x, stride, padding, output_padding, train):
    out = L.conv_transpose2d(
        p["conv"], x, stride=stride, padding=padding, output_padding=output_padding
    )
    out = jax.nn.relu(out)
    out, st = L.batchnorm(p["bn"], out, train, **_BN_CFG)
    return out, {"bn": st}


def _head_init(key, cin, cout, hidden=64):
    k1, k2 = jax.random.split(key)
    return {
        "conv": L.conv2d_init(k1, cin, hidden, 3, bias=False),
        "bn": L.batchnorm_init(hidden),
        "up": L.conv_transpose2d_init(k2, hidden, cout, 3, bias=True),
    }


def _head(p, x, train):
    out = L.conv2d(p["conv"], x, stride=1, padding=1)
    out = jax.nn.relu(out)
    out, st = L.batchnorm(p["bn"], out, train, **_BN_CFG)
    out = L.conv_transpose2d(p["up"], out, stride=2, padding=1, output_padding=1)
    return out, {"bn": st}


# run the four detection heads as ONE conv + bn + block-diagonal convT —
# identical math per head (channels are independent through conv/BN/relu;
# the merged convT weight is zero off-block), one kernel launch and ONE
# lane-padded full-resolution output write instead of four (each head's
# 2-3 channel convT output pads to 128 lanes on TPU)
MERGED_HEADS = True


def _merged_heads(head_params, x, train):
    """head_params: list of _head param dicts (same hidden width / convT
    geometry).  Returns (list of per-head outputs, list of per-head bn
    states) — exactly what running each _head separately yields."""
    couts = [p["up"]["w"].shape[-1] for p in head_params]
    n = len(head_params)

    if all("w_int8" in p["conv"] for p in head_params):
        # int8 heads (nn/quant.py): the merged 384->256 3x3 conv runs at
        # ~89% of bf16 MXU peak — exactly the shape int8 doubles.  Merge
        # the per-head int8 weights/scales along out-channels; all heads
        # see the SAME input, so the shared x_scale is the max of the
        # calibrated per-head ones (never smaller than any head saw).
        hid = head_params[0]["conv"]["w_int8"].shape[-1]
        conv_p = {
            "w_int8": jnp.concatenate(
                [p["conv"]["w_int8"] for p in head_params], axis=-1),
            "w_scale": jnp.concatenate(
                [p["conv"]["w_scale"] for p in head_params]),
        }
        # _x_scale on each PER-HEAD dict so calibration observations
        # persist in the params (the merged dict is rebuilt per call)
        from lav_tpu.nn.quant import _x_scale

        conv_p["x_scale"] = jnp.max(
            jnp.stack([_x_scale(p["conv"], x) for p in head_params]))
        out = L.conv2d(conv_p, x, stride=1, padding=1)
    else:
        hid = head_params[0]["conv"]["w"].shape[-1]
        conv_w = jnp.concatenate([p["conv"]["w"] for p in head_params],
                                 axis=-1)
        out = L.conv2d({"w": conv_w}, x, stride=1, padding=1)
    out = jax.nn.relu(out)
    bn = {k: jnp.concatenate([p["bn"][k] for p in head_params])
          for k in head_params[0]["bn"]}
    out, st = L.batchnorm(bn, out, train, **_BN_CFG)
    states = [{"bn": {k: v[i * hid:(i + 1) * hid] for k, v in st.items()}}
              for i in range(n)]

    kh, kw = head_params[0]["up"]["w"].shape[:2]
    up_w = jnp.zeros((kh, kw, n * hid, sum(couts)),
                     head_params[0]["up"]["w"].dtype)
    off = 0
    for i, p in enumerate(head_params):
        up_w = up_w.at[:, :, i * hid:(i + 1) * hid,
                       off:off + couts[i]].set(p["up"]["w"])
        off += couts[i]
    up_b = jnp.concatenate([p["up"]["b"] for p in head_params])
    out = L.conv_transpose2d({"w": up_w, "b": up_b}, out, stride=2,
                             padding=1, output_padding=1)
    outs, off = [], 0
    for c in couts:
        outs.append(out[..., off:off + c])
        off += c
    return outs, states


# stage schedule: (n_convs, channel multiplier) per reference lidar.py:57-112
_STAGES = ((4, 1), (6, 2), (6, 2))


def backbone_init(key, num_feature: int):
    n = sum(s[0] for s in _STAGES) + 3
    ks = jax.random.split(key, n)
    ki = iter(range(n))
    p = {}
    cin = num_feature
    for s, (n_convs, mult) in enumerate(_STAGES):
        cout = num_feature * mult
        for b in range(n_convs):
            p[f"conv{s + 1}_{b}"] = _conv_block_init(ks[next(ki)], cin, cout)
            cin = cout
    p["upconv1"] = _upconv_block_init(ks[next(ki)], num_feature, 2 * num_feature, 1)
    p["upconv2"] = _upconv_block_init(ks[next(ki)], 2 * num_feature, 2 * num_feature, 4)
    p["upconv3"] = _upconv_block_init(ks[next(ki)], 2 * num_feature, 2 * num_feature, 4)
    return p


def backbone_apply(p, x, train: bool):
    state = {}
    stage_outs = []
    out = x
    for s, (n_convs, _) in enumerate(_STAGES):
        for b in range(n_convs):
            name = f"conv{s + 1}_{b}"
            stride = 2 if b == 0 else 1
            out, state[name] = _conv_block(p[name], out, stride, train,
                                           entry=(s == 0 and b == 0))
        stage_outs.append(out)

    u1, state["upconv1"] = _upconv_block(p["upconv1"], stage_outs[0], 1, 0, 0, train)
    u2, state["upconv2"] = _upconv_block(p["upconv2"], stage_outs[1], 2, 1, 0, train)
    # reference: ConvTranspose2d(k=4, stride=4, padding=1, output_padding=2)
    u3, state["upconv3"] = _upconv_block(p["upconv3"], stage_outs[2], 4, 1, 2, train)
    return jnp.concatenate([u1, u2, u3], axis=-1), state


def lidar_model_init(key, num_input: int, num_features: Sequence[int]):
    ks = jax.random.split(key, 6)
    nf = num_features[-1]
    return {
        "point_pillar": point_pillar_init(ks[0], num_input, num_features),
        "backbone": backbone_init(ks[1], nf),
        "center_head": _head_init(ks[2], 6 * nf, 2),
        "box_head": _head_init(ks[3], 6 * nf, 2),
        "ori_head": _head_init(ks[4], 6 * nf, 2),
        "seg_head": _head_init(ks[5], 6 * nf, 3),
    }


def lidar_model_apply(
    p,
    points,
    valid,
    *,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    pixels_per_meter: float,
    num_features: Sequence[int],
    train: bool = False,
    use_pallas: bool = False,
):
    """points (B, P, D) padded, valid (B, P).

    Returns (features, heatmap_logits, sizemaps, orimaps, bev_seg, state):
      features (B, ny/2, nx/2, 6*nf), head outputs at full (ny, nx)
      resolution; bev_seg passed through sigmoid (reference lidar.py:32).
    """
    canvas, st_pp = point_pillar_apply(
        p["point_pillar"], points, valid,
        min_x=min_x, max_x=max_x, min_y=min_y, max_y=max_y,
        pixels_per_meter=pixels_per_meter, num_features=num_features,
        train=train, use_pallas=use_pallas,
    )
    features, st_bb = backbone_apply(p["backbone"], canvas, train)
    if MERGED_HEADS:
        (hm, box, ori, seg), (st_c, st_b, st_o, st_s) = _merged_heads(
            [p["center_head"], p["box_head"], p["ori_head"], p["seg_head"]],
            features, train,
        )
    else:
        hm, st_c = _head(p["center_head"], features, train)
        box, st_b = _head(p["box_head"], features, train)
        ori, st_o = _head(p["ori_head"], features, train)
        seg, st_s = _head(p["seg_head"], features, train)
    # final sigmoid in f32: bf16 sigmoid saturates to exactly 1.0 near
    # logit~6, and the BCE backward 1/(1-p) through it is then non-finite
    seg = jax.nn.sigmoid(seg.astype(jnp.float32))
    state = {
        "point_pillar": st_pp,
        "backbone": st_bb,
        "center_head": st_c,
        "box_head": st_b,
        "ori_head": st_o,
        "seg_head": st_s,
    }
    # heads output NHWC; convert to channel-first maps for loss/decoding
    to_chw = lambda t: jnp.moveaxis(t, -1, 1)
    return features, to_chw(hm), to_chw(box), to_chw(ori), to_chw(seg), state

"""Functional ERFNet encoder-decoder for camera semantic segmentation.

Same architecture as the reference camera segmenter
(/root/reference/lav/models/erfnet.py:12-146): downsampler blocks
(conv‖maxpool concat), factorized non-bottleneck-1d residual blocks with
dilation, transposed-conv upsamplers.  NHWC, functional params, BN eps=1e-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L

_BN_EPS = 1e-3


def downsampler_init(key, cin: int, cout: int):
    k1, _ = jax.random.split(key)
    return {
        "conv": L.conv2d_init(k1, cin, cout - cin, 3, bias=True),
        "bn": L.batchnorm_init(cout),
    }


def downsampler(p, x, train: bool):
    conv = L.conv2d(p["conv"], x, stride=2, padding=1)
    pool = L.max_pool2d(x, 2, 2, 0)
    out = jnp.concatenate([conv, pool], axis=-1)
    out, st = L.batchnorm(p["bn"], out, train, eps=_BN_EPS)
    return jax.nn.relu(out), {"bn": st}


def non_bt_1d_init(key, c: int):
    ks = jax.random.split(key, 4)
    return {
        "conv3x1_1": L.conv2d_init(ks[0], c, c, (3, 1), bias=True),
        "conv1x3_1": L.conv2d_init(ks[1], c, c, (1, 3), bias=True),
        "bn1": L.batchnorm_init(c),
        "conv3x1_2": L.conv2d_init(ks[2], c, c, (3, 1), bias=True),
        "conv1x3_2": L.conv2d_init(ks[3], c, c, (1, 3), bias=True),
        "bn2": L.batchnorm_init(c),
    }


def non_bt_1d(p, x, train: bool, dilated: int, dropprob: float, rng=None):
    out = L.conv2d(p["conv3x1_1"], x, padding=(1, 0))
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv1x3_1"], out, padding=(0, 1))
    out, s1 = L.batchnorm(p["bn1"], out, train, eps=_BN_EPS)
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv3x1_2"], out, padding=(dilated, 0), dilation=(dilated, 1))
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv1x3_2"], out, padding=(0, dilated), dilation=(1, dilated))
    out, s2 = L.batchnorm(p["bn2"], out, train, eps=_BN_EPS)
    if dropprob > 0 and train and rng is not None:
        out = L.dropout(rng, out, dropprob, train)
    return jax.nn.relu(out + x), {"bn1": s1, "bn2": s2}


# encoder block schedule: (type, args) — matches reference erfnet.py:64-85
_ENC_BLOCKS = (
    [("nb", 64, 1, 0.03)] * 5
    + [("down", 64, 128)]
    + [("nb", 128, 2, 0.3), ("nb", 128, 4, 0.3), ("nb", 128, 8, 0.3), ("nb", 128, 16, 0.3)] * 2
)

_DEC_BLOCKS = (
    [("up", 128, 64), ("nb", 64, 1, 0.0), ("nb", 64, 1, 0.0),
     ("up", 64, 16), ("nb", 16, 1, 0.0), ("nb", 16, 1, 0.0)]
)


def upsampler_init(key, cin: int, cout: int):
    k1, _ = jax.random.split(key)
    return {
        "conv": L.conv_transpose2d_init(k1, cin, cout, 3, bias=True),
        "bn": L.batchnorm_init(cout),
    }


def upsampler(p, x, train: bool):
    out = L.conv_transpose2d(p["conv"], x, stride=2, padding=1, output_padding=1)
    out, st = L.batchnorm(p["bn"], out, train, eps=_BN_EPS)
    return jax.nn.relu(out), {"bn": st}


def erfnet_init(key, num_classes: int):
    n = 2 + len(_ENC_BLOCKS) + len(_DEC_BLOCKS) + 1
    ks = jax.random.split(key, n)
    ki = iter(range(n))
    p = {"initial": downsampler_init(ks[next(ki)], 3, 16),
         "enc_down0": downsampler_init(ks[next(ki)], 16, 64)}
    for i, blk in enumerate(_ENC_BLOCKS):
        if blk[0] == "nb":
            p[f"enc_{i}"] = non_bt_1d_init(ks[next(ki)], blk[1])
        else:
            p[f"enc_{i}"] = downsampler_init(ks[next(ki)], blk[1], blk[2])
    for i, blk in enumerate(_DEC_BLOCKS):
        if blk[0] == "nb":
            p[f"dec_{i}"] = non_bt_1d_init(ks[next(ki)], blk[1])
        else:
            p[f"dec_{i}"] = upsampler_init(ks[next(ki)], blk[1], blk[2])
    p["output_conv"] = L.conv_transpose2d_init(ks[next(ki)], 16, num_classes, 2, bias=True)
    return p


def erfnet_apply(p, x, train: bool = False, rng=None):
    """x: (B, H, W, 3) normalized to [-1, 1] by the caller. Returns logits
    (B, H, W, num_classes) and BN state tree."""
    state = {}
    n_drop = sum(1 for b in list(_ENC_BLOCKS) + list(_DEC_BLOCKS)
                 if b[0] == "nb")
    rngs = iter(
        jax.random.split(rng, n_drop) if (train and rng is not None) else [None] * n_drop
    )
    out, state["initial"] = downsampler(p["initial"], x, train)
    out, state["enc_down0"] = downsampler(p["enc_down0"], out, train)
    for i, blk in enumerate(_ENC_BLOCKS):
        if blk[0] == "nb":
            out, state[f"enc_{i}"] = non_bt_1d(
                p[f"enc_{i}"], out, train, dilated=blk[2], dropprob=blk[3],
                rng=next(rngs),
            )
        else:
            out, state[f"enc_{i}"] = downsampler(p[f"enc_{i}"], out, train)
    for i, blk in enumerate(_DEC_BLOCKS):
        if blk[0] == "nb":
            out, state[f"dec_{i}"] = non_bt_1d(
                p[f"dec_{i}"], out, train, dilated=blk[2], dropprob=blk[3],
                rng=next(rngs),
            )
        else:
            out, state[f"dec_{i}"] = upsampler(p[f"dec_{i}"], out, train)
    out = L.conv_transpose2d(p["output_conv"], out, stride=2, padding=0, output_padding=0)
    return out, state

"""Camera models: semantic segmentation and brake prediction.

Mirrors /root/reference/lav/models/rgb.py:35-78 (v1) and rgb_v2.py:48-82
(v2): ERFNet segmenter with (x/255-.5)*2 normalization; brake predictor with
an ImageNet-normalized ResNet-18 over two image streams (wide triple-cam
concat + telephoto), pooled by global average (v1) or single-query attention
(v2), with an auxiliary train-time segmentation head.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L
from lav_tpu.nn.attention import attention_init, attention_apply
from lav_tpu.nn.erfnet import erfnet_init, erfnet_apply
from lav_tpu.nn.resnet import resnet18_init, resnet_apply

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


# ---------------------------------------------------------------------------
# RGBSegmentationModel
# ---------------------------------------------------------------------------

def seg_model_init(key, num_seg_channels: int):
    return {"erfnet": erfnet_init(key, num_seg_channels + 1)}


def seg_model_apply(params, rgb, train: bool = False, rng=None):
    """rgb (B, H, W, 3) uint8-scale floats. Returns (logits NHWC, state)."""
    x = (rgb / 255.0 - 0.5) * 2.0
    logits, state = erfnet_apply(params["erfnet"], x, train, rng)
    return logits, {"erfnet": state}


# ---------------------------------------------------------------------------
# SegmentationHead (aux head of the brake model, reference segmentation.py)
# ---------------------------------------------------------------------------

def _seg_head_init(key, cin: int, num_labels: int):
    ks = jax.random.split(key, 4)
    return {
        "up1": L.conv_transpose2d_init(ks[0], cin, 256, 3, bias=True),
        "bn1": L.batchnorm_init(256),
        "up2": L.conv_transpose2d_init(ks[1], 256, 128, 3, bias=True),
        "bn2": L.batchnorm_init(128),
        "up3": L.conv_transpose2d_init(ks[2], 128, 64, 3, bias=True),
        "bn3": L.batchnorm_init(64),
        "out": L.conv2d_init(ks[3], 64, num_labels, 1, bias=True),
    }


def _seg_head(p, x, train: bool):
    state = {}
    for i in (1, 2, 3):
        x = L.conv_transpose2d(p[f"up{i}"], x, stride=2, padding=1, output_padding=1)
        x, state[f"bn{i}"] = L.batchnorm(p[f"bn{i}"], x, train)
        x = jax.nn.relu(x)
    return L.conv2d(p["out"], x, padding=0), state


# ---------------------------------------------------------------------------
# RGBBrakePredictionModel
# ---------------------------------------------------------------------------

def brake_model_init(key, num_seg_channels: int, version: int = 1,
                     imagenet_sd=None):
    """imagenet_sd: optional torchvision resnet18 state_dict (numpy arrays)
    for the ImageNet-pretrained backbone init the reference uses
    (lav/lav_privileged.py:31, rgb.py:47 pretrained=True); converted via
    utils.weights.convert_resnet (torchvision layout == our key space)."""
    ks = jax.random.split(key, 5)
    if imagenet_sd is not None:
        from lav_tpu.utils.weights import convert_resnet

        backbone = jax.tree.map(jnp.asarray, convert_resnet(imagenet_sd))
    else:
        backbone = resnet18_init(ks[0], 3)
    p = {
        "conv_backbone": backbone,
        "seg_head": _seg_head_init(ks[1], 512, num_seg_channels + 1),
        "classifier": L.linear_init(ks[2], 1024, 1),
    }
    if version == 2:
        p["attn1"] = attention_init(ks[3], 512)
        p["attn2"] = attention_init(ks[4], 512)
    return p


def brake_model_apply(params, rgb1, rgb2, train: bool = False,
                      with_mask: bool = False, version: int = 1):
    """rgb1 wide concat (B, H, W, 3); rgb2 telephoto (B, H2, W2, 3),
    uint8-scale.  Returns (pred_bra (B,), [pred_sem1, pred_sem2,] state)."""

    def norm(x):
        # constants in x's dtype: the f32 arrays otherwise promote a bf16
        # activation back to f32 and the whole entry conv runs f32
        # (measured 1.4 ms/16-ego tick in the fused agent)
        return ((x / 255.0 - _IMAGENET_MEAN.astype(x.dtype))
                / _IMAGENET_STD.astype(x.dtype))

    x1, st1 = resnet_apply(params["conv_backbone"], norm(rgb1), train)
    x2, st2 = resnet_apply(params["conv_backbone"], norm(rgb2), train)

    if version == 2:
        h1 = attention_apply(params["attn1"], x1)
        h2 = attention_apply(params["attn2"], x2)
    else:
        h1 = x1.mean(axis=(1, 2))
        h2 = x2.mean(axis=(1, 2))

    pred = jax.nn.sigmoid(
        L.linear(params["classifier"], jnp.concatenate([h1, h2], axis=-1))
    )[:, 0]

    state = {"conv_backbone": st2}
    if not with_mask:
        return pred, state

    sem1, st_h1 = _seg_head(params["seg_head"], x1, train)
    sem2, st_h2 = _seg_head(params["seg_head"], x2, train)
    sem1 = L.interpolate_nearest(sem1, 4)
    sem2 = L.interpolate_nearest(sem2, 4)
    state["seg_head"] = st_h2
    return pred, sem1, sem2, state

"""Functional ResNet (torchvision-compatible weights) returning the layer4
feature map — the backbone used by the BEV/Uni planners and the brake net
(reference lav/models/resnet.py:235-272 keeps the same structure with a
`num_channels` first-conv argument and no avgpool/fc).

NHWC activations; BN running stats live in the params tree.  Apply functions
take `train` and return (features, new_state) where new_state mirrors the
params tree with updated BN stats (None-leaves elsewhere).
"""

from __future__ import annotations

from typing import List

import jax


from lav_tpu.nn import layers as L


def _bn(c):
    return L.batchnorm_init(c, eps=1e-5, momentum=0.1)


def basic_block_init(key, cin: int, cout: int, stride: int = 1):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": L.conv2d_init(ks[0], cin, cout, 3, bias=False),
        "bn1": _bn(cout),
        "conv2": L.conv2d_init(ks[1], cout, cout, 3, bias=False),
        "bn2": _bn(cout),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = L.conv2d_init(ks[2], cin, cout, 1, bias=False)
        p["down_bn"] = _bn(cout)
    return p


def basic_block(p, x, stride: int, train: bool):
    out = L.conv2d(p["conv1"], x, stride=stride, padding=1)
    out, s1 = L.batchnorm(p["bn1"], out, train)
    out = jax.nn.relu(out)
    out = L.conv2d(p["conv2"], out, stride=1, padding=1)
    out, s2 = L.batchnorm(p["bn2"], out, train)
    state = {"bn1": s1, "bn2": s2}
    if "down_conv" in p:
        identity = L.conv2d(p["down_conv"], x, stride=stride, padding=0)
        identity, sd = L.batchnorm(p["down_bn"], identity, train)
        state["down_bn"] = sd
    else:
        identity = x
    return jax.nn.relu(out + identity), state


def resnet_init(key, layers_cfg: List[int], num_channels: int = 3, width: int = 64):
    """layers_cfg e.g. [2,2,2,2] for resnet18."""
    n_keys = 2 + sum(layers_cfg)
    ks = jax.random.split(key, n_keys)
    ki = iter(range(n_keys))
    p = {
        "conv1": L.conv2d_init(ks[next(ki)], num_channels, width, 7, bias=False),
        "bn1": _bn(width),
    }
    cin = width
    for stage, blocks in enumerate(layers_cfg):
        cout = width * (2 ** stage)
        for b in range(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            p[f"layer{stage + 1}_{b}"] = basic_block_init(
                ks[next(ki)], cin, cout, stride
            )
            cin = cout
    return p


def resnet_apply(p, x, train: bool = False, layers_cfg=(2, 2, 2, 2)):
    """x: (B, H, W, C) -> layer4 features (B, H/32, W/32, 512-ish)."""
    state = {}
    out = L.conv2d(p["conv1"], x, stride=2, padding=3)
    out, state["bn1"] = L.batchnorm(p["bn1"], out, train)
    out = jax.nn.relu(out)
    out = L.max_pool2d(out, 3, 2, 1)
    for stage, blocks in enumerate(layers_cfg):
        for b in range(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            name = f"layer{stage + 1}_{b}"
            out, state[name] = basic_block(p[name], out, stride, train)
    return out, state


def resnet18_init(key, num_channels: int = 3):
    return resnet_init(key, [2, 2, 2, 2], num_channels)


def resnet34_init(key, num_channels: int = 3):
    return resnet_init(key, [3, 4, 6, 3], num_channels)


def resnet_small_init(key, num_channels: int = 3):
    """2-stage variant (reference resnet.py:270-272 `resnet_small`)."""
    return resnet_init(key, [2, 2], num_channels)

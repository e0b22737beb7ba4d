"""Classic UNet (inventory parity with team_code_v2/models/unet.py:6-36 —
imported but never instantiated in the reference; provided as a usable
segmentation backbone alternative here)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L


def _double_conv_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.conv2d_init(k1, cin, cout, 3),
        "bn1": L.batchnorm_init(cout),
        "conv2": L.conv2d_init(k2, cout, cout, 3),
        "bn2": L.batchnorm_init(cout),
    }


def _double_conv(p, x, train):
    x = L.conv2d(p["conv1"], x, padding=1)
    x, s1 = L.batchnorm(p["bn1"], x, train)
    x = jax.nn.relu(x)
    x = L.conv2d(p["conv2"], x, padding=1)
    x, s2 = L.batchnorm(p["bn2"], x, train)
    return jax.nn.relu(x), {"bn1": s1, "bn2": s2}


def unet_init(key, cin: int, num_classes: int, widths=(64, 128, 256, 512)):
    n = 2 * len(widths) + 1
    ks = jax.random.split(key, n)
    ki = iter(range(n))
    p = {}
    c = cin
    for i, w in enumerate(widths):
        p[f"down_{i}"] = _double_conv_init(ks[next(ki)], c, w)
        c = w
    for i, w in enumerate(reversed(widths[:-1])):
        p[f"up_{i}"] = {
            "upconv": L.conv_transpose2d_init(ks[next(ki)], c, w, 2),
            **_double_conv_init(ks[next(ki)], 2 * w, w),
        }
        c = w
    p["out"] = L.conv2d_init(ks[next(ki)], c, num_classes, 1)
    return p


def unet_apply(p, x, train: bool = False, widths=(64, 128, 256, 512)):
    state = {}
    skips = []
    for i in range(len(widths)):
        x, state[f"down_{i}"] = _double_conv(p[f"down_{i}"], x, train)
        if i < len(widths) - 1:
            skips.append(x)
            x = L.max_pool2d(x, 2, 2)
    for i in range(len(widths) - 1):
        up = p[f"up_{i}"]
        x = L.conv_transpose2d(up["upconv"], x, stride=2)
        skip = skips.pop()
        x = jnp.concatenate([skip, x], axis=-1)
        x, st = _double_conv(up, x, train)
        state[f"up_{i}"] = st
    return L.conv2d(p["out"], x, padding=0), state

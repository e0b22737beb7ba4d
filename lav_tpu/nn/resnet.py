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
import jax.numpy as jnp


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


# narrow-channel entry-conv rewrite switch (diagnosable knob)
S2D_ENTRY_CONV = True


def _conv1_space_to_depth(w, x):
    """Entry conv (7x7 stride 2 pad 3) as a space-to-depth conv.

    Narrow-channel NHWC inputs (the 5/9-channel BEV maps) pad their lane
    dim to 128 in every conv-adjacent copy on TPU — 25.6x phantom traffic,
    the reason reference-scale bs=256/512 OOMed (measured 26.8 GB input
    copy at bs=512; CLAUDE.md).  Folding 2x2 spatial blocks into channels
    quarters the padding and halves the spatial copy extents:

        y[i,j,o] = sum_{ky,kx,c} xp[2i+ky, 2j+kx, c] w[ky,kx,c,o]

    with xp = pad(x, 3).  Pad by 4 instead (even => block-aligned) and
    embed w at offset +1 in an 8x8 kernel: y[i,j] then reads xp4 rows
    2i..2i+7, i.e. s2d blocks i..i+3 — a 4x4 stride-1 conv over the
    (H/2, W/2, 4C) space-to-depth view.  Because the pad is even, padding
    before s2d equals padding s2d blocks: the explicit jnp.pad (a
    materialized 0.5 ms copy at agent shapes) folds into the CONV's own
    padding — front 2 blocks (= 4 rows), back 1 (the 4th back row is only
    read by the sliced-away last output, so ((2,1),(2,1)) also kills the
    output slice).  Exact same products as the direct conv (summation
    order differs at f32 rounding level).
    """
    import jax.numpy as jnp

    B, H, W, C = x.shape
    kh, kw, _, O = w.shape  # 7,7,C,O
    # mixed-precision trains keep params f32 and cast activations; the conv
    # wrapper normally handles the weight cast — mirror it here
    w = w.astype(x.dtype)
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

    w8 = jnp.zeros((8, 8, C, O), w.dtype).at[1:1 + kh, 1:1 + kw].set(w)
    w2 = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(4, 4, 4 * C, O)

    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def resnet_apply(p, x, train: bool = False, layers_cfg=(2, 2, 2, 2)):
    """x: (B, H, W, C) -> layer4 features (B, H/32, W/32, 512-ish)."""
    state = {}
    if (x.dtype == jnp.int8 and "w_int8" in p.get("conv1", {})
            and x.shape[-1] == 4 * p["conv1"]["w_int8"].shape[2]):
        # SPACE-TO-DEPTH int8 crops from the Pallas crop kernel's s2d
        # emit (core/warp_pallas.py): 4x4 stride-1 int8 conv at 94% of
        # int8 peak vs 49% for the direct 7x7s2 (scripts/exp_conv1.py)
        from lav_tpu.nn.quant import conv2d_int8_s2d

        out = conv2d_int8_s2d(p["conv1"], x)
    elif (S2D_ENTRY_CONV and x.shape[-1] <= 16
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        out = _conv1_space_to_depth(p["conv1"]["w"], x)
        if "b" in p["conv1"]:
            out = out + p["conv1"]["b"]
    else:
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

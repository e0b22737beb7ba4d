"""Functional NN layers with exact torch-semantics parity, NHWC layout.

Design: every layer is a pair of pure functions —
  *_init(key, ...) -> params pytree (dict of jnp arrays)
  *(params, x, ...) -> y
BatchNorm carries running statistics inside its params dict under keys
`mean`/`var`; training-mode calls return (y, new_stats) so trainers can
thread state functionally (the reference relies on torch BN train/eval
semantics for teacher-freezing, lav_final.py:54).

Layout: NHWC activations, HWIO conv kernels (XLA:TPU native).  The
torch->jax weight converter (lav_tpu/utils/weights.py) transposes
torch OIHW accordingly.

Initializers replicate torch defaults (kaiming_uniform(a=sqrt(5)) for
conv/linear, uniform(-1/sqrt(fan_in), ...) for biases and GRU) so trained-
from-scratch behavior matches the reference's initialization statistics.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# init helpers (torch default semantics)
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0)):
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _bias_uniform(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_features: int, out_features: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw, (in_features, out_features), in_features)}
    if bias:
        p["b"] = _bias_uniform(kb, (out_features,), in_features)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv2d_init(key, cin: int, cout: int, ksize, bias: bool = True):
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else ksize
    fan_in = cin * kh * kw
    k1, k2 = jax.random.split(key)
    p = {"w": _kaiming_uniform(k1, (kh, kw, cin, cout), fan_in)}
    if bias:
        p["b"] = _bias_uniform(k2, (cout,), fan_in)
    return p


def conv2d(p, x, stride=1, padding=0, dilation=1):
    """torch.nn.Conv2d semantics: integer/tuple zero padding.

    Dispatches to the int8 MXU path when the params were rewritten by
    lav_tpu.nn.quant.quantize_tree (presence of 'w_int8')."""
    strides = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    dil = (dilation, dilation) if isinstance(dilation, int) else dilation
    if "w_int8" in p:
        from lav_tpu.nn.quant import conv2d_int8

        return conv2d_int8(p, x, strides, padding, dil)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=strides,
        padding=padding,
        rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# ConvTranspose2d — exact torch semantics via input-dilated conv with a
# spatially flipped kernel:  out = (in-1)*s - 2p + k + output_padding
# ---------------------------------------------------------------------------

def conv_transpose2d_init(key, cin: int, cout: int, ksize, bias: bool = True):
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else ksize
    # torch ConvTranspose2d weight is (cin, cout, kh, kw); fan_in uses
    # cout * kh * kw (transposed fan). We store HWIO-for-the-equivalent-conv:
    # (kh, kw, cin, cout) already flipped at apply time.
    fan_in = cout * kh * kw
    k1, k2 = jax.random.split(key)
    p = {"w": _kaiming_uniform(k1, (kh, kw, cin, cout), fan_in)}
    if bias:
        p["b"] = _bias_uniform(k2, (cout,), fan_in)
    return p


def conv_transpose2d(p, x, stride=1, padding=0, output_padding=0):
    s = (stride, stride) if isinstance(stride, int) else stride
    pad = (padding, padding) if isinstance(padding, int) else padding
    op = (
        (output_padding, output_padding)
        if isinstance(output_padding, int)
        else output_padding
    )
    wkey = "w_int8" if "w_int8" in p else "w"
    kh, kw = p[wkey].shape[0], p[wkey].shape[1]
    conv_pad = (
        (kh - 1 - pad[0], kh - 1 - pad[0] + op[0]),
        (kw - 1 - pad[1], kw - 1 - pad[1] + op[1]),
    )
    if wkey == "w_int8":
        # int8 path (lav_tpu.nn.quant.quantize_tree): same input-dilated
        # conv with the flipped int8 kernel, int32 MXU accumulation
        from lav_tpu.nn.quant import conv_transpose2d_int8

        return conv_transpose2d_int8(p, x, conv_pad, s)
    w = jnp.flip(p["w"], axis=(0, 1)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=conv_pad,
        lhs_dilation=s,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# BatchNorm (2d over NHWC channels, or 1d over (N, C))
# ---------------------------------------------------------------------------

def batchnorm_init(c: int, eps: float = 1e-5, momentum: float = 0.1):
    """eps/momentum are architectural constants — pass them to batchnorm()
    at the (static) call site; they are not stored in the params pytree so
    optimizers never see them."""
    del eps, momentum
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def batchnorm(p, x, train: bool, mask=None, eps: float = 1e-5,
              momentum: float = 0.1):
    """BatchNorm over all axes but the last (channel) axis.

    Returns (y, new_stats) where new_stats is {'mean','var'} updated with
    torch momentum semantics (new = (1-m)*old + m*batch, unbiased var for
    the running stats, biased var for normalization — exactly torch).
    `mask` (broadcastable to x[..., 0]) restricts statistics to valid
    entries (used by the pillar featurizer over padded point sets).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        # statistics always in f32: bf16 mean/var are too coarse to train
        # with (identity cast for f32 inputs — numerics unchanged there)
        xs = x.astype(jnp.float32)
        if mask is None:
            mean = xs.mean(axis=axes)
            var = ((xs - mean) ** 2).mean(axis=axes)
            n = math.prod([x.shape[a] for a in axes])
            n = jnp.asarray(n, dtype=jnp.float32)
        else:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (xs * m).sum(axis=axes) / n
            var = (((xs - mean) ** 2) * m).sum(axis=axes) / n
        y = (xs - mean) * jax.lax.rsqrt(var + eps)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        # inference: fold running stats + affine into ONE per-channel
        # scale/shift computed in f32 (tiny vectors) and applied in the
        # INPUT dtype — the old form promoted the whole activation to f32
        # (params are f32), costing a convert-in/convert-out pass around
        # every BN (~5 ms of add_convert fusions per 16-ego agent tick)
        inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
        scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
        shift = (p["bias"].astype(jnp.float32)
                 - p["mean"].astype(jnp.float32)
                 * p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
        return x * scale + shift, {"mean": p["mean"], "var": p["var"]}
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_stats


def batchnorm_apply(p, x, train: bool, mask=None, eps: float = 1e-5):
    """batchnorm() for callers that discard state updates (eval paths)."""
    y, _ = batchnorm(p, x, train=train, mask=mask, eps=eps)
    return y


def bn_update(p, new_stats):
    """Merge running-stat updates back into a BN params dict."""
    q = dict(p)
    q["mean"], q["var"] = new_stats["mean"], new_stats["var"]
    return q


# ---------------------------------------------------------------------------
# GRU — torch gate order (r, z, n), batch_first, single layer.
# Weights stored transposed for right-multiplication.
# ---------------------------------------------------------------------------

def gru_init(key, input_size: int, hidden_size: int):
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_size)

    def u(kk, shape):
        return jax.random.uniform(kk, shape, minval=-bound, maxval=bound)

    return {
        "w_ih": u(k[0], (input_size, 3 * hidden_size)),
        "w_hh": u(k[1], (hidden_size, 3 * hidden_size)),
        "b_ih": u(k[2], (3 * hidden_size,)),
        "b_hh": u(k[3], (3 * hidden_size,)),
    }


def gru(p, x, h0=None):
    """x: (B, T, I); h0: (B, H) or None. Returns (outputs (B, T, H), h_T).

    Matches torch.nn.GRU: gates ordered (reset, update, new);
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)); h' = (1-z) n + z h.
    Implemented as a `lax.scan` over time — plan horizons are <= 20 steps
    so scan is the right TPU shape (no cuDNN-style fused kernel needed).
    """
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype=x.dtype)

    # Precompute input projections for all timesteps at once (one big matmul
    # that XLA maps onto the MXU), leaving only the recurrent part in scan.
    xi = x @ p["w_ih"].astype(x.dtype) + p["b_ih"].astype(x.dtype)  # (B, T, 3H)
    xi = jnp.swapaxes(xi, 0, 1)  # (T, B, 3H)

    w_hh = p["w_hh"].astype(x.dtype)
    b_hh = p["b_hh"].astype(x.dtype)

    def step(h, xi_t):
        hh = h @ w_hh + b_hh
        ir, iz, inn = jnp.split(xi_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # fully unroll short horizons: the plan/cast GRUs run T <= 20 tiny
    # steps whose per-iteration launch overhead dominates the math;
    # unrolling lets XLA fuse across steps (same numerics, scan semantics)
    h_last, ys = jax.lax.scan(step, h0, xi, unroll=T if T <= 24 else 1)
    return jnp.swapaxes(ys, 0, 1), h_last


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def max_pool2d(x, ksize: int, stride: int, padding: int = 0):
    """torch MaxPool2d (NHWC): zero-pad excluded via -inf padding.

    init_value must be a Python scalar so JAX recognizes the (max, -inf)
    monoid and uses its differentiable reduce-window-max rule.
    """
    neg = float("-inf") if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool_global(x):
    """AdaptiveAvgPool2d((1,1)) + flatten: (B, H, W, C) -> (B, C)."""
    return x.mean(axis=(1, 2))


def dropout(key, x, rate: float, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def interpolate_nearest(x, scale: int):
    """F.interpolate(scale_factor=s) default nearest mode, NHWC."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x

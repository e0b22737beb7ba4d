"""Single-learned-query multi-head attention pooling (v2 brake net).

Replaces global average pooling in the v2 brake predictor
(reference lav/models/attention.py:6-56): one learned query attends over
the flattened backbone feature map with 1-D sinusoidal positional encoding
added to the keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L


def positional_encoding_1d(d_model: int, length: int):
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def attention_init(key, dim: int, num_heads: int = 8):
    assert dim % num_heads == 0
    kq, kl = jax.random.split(key)
    dim_head = dim // num_heads
    return {
        "q": jax.random.normal(kq, (1, num_heads, 1, dim_head)),
        "linear_kv": L.linear_init(kl, dim, dim * 2),
    }


def attention_apply(p, x, num_heads: int = 8):
    """x: (B, H, W, D) -> pooled (B, D)."""
    B, H, W, D = x.shape
    dh = D // num_heads
    n = H * W
    xf = x.reshape(B, n, D)
    kv = L.linear(p["linear_kv"], xf)
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(B, n, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, n, num_heads, dh).transpose(0, 2, 1, 3)
    k = k + positional_encoding_1d(dh, n)[None, None]
    q = jnp.broadcast_to(p["q"], (B, num_heads, 1, dh))
    dots = jnp.einsum(
        "bhqd,bhnd->bhqn", q, k, precision=jax.lax.Precision.HIGHEST
    ) * (dh ** -0.5)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum(
        "bhqn,bhnd->bhqd", attn, v, precision=jax.lax.Precision.HIGHEST
    )
    return out.transpose(0, 2, 1, 3).reshape(B, D)

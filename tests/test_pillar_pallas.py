"""Pallas pillar scatter-max kernel vs the XLA scatter path (interpret
mode on CPU; the real kernel runs on TPU via use_pallas=True)."""

import numpy as np
import jax
import jax.numpy as jnp

from lav_tpu.ops.pillar_pallas import pillar_scatter_max_pallas, NEG


def _xla_reference(feat, pid, num_segments):
    canvas = jnp.full((num_segments, feat.shape[-1]), NEG, feat.dtype)
    canvas = canvas.at[pid].max(feat)
    return jnp.where(canvas > NEG, canvas, 0.0)


def test_pallas_kernel_matches_xla_scatter(rng):
    P, C, G = 512, 64, 200
    feat = rng.normal(size=(P, C)).astype(np.float32)
    pid = rng.integers(0, G, size=(P,)).astype(np.int32)
    # some invalid points carry NEG features and the dump id
    inv = rng.uniform(size=P) < 0.2
    feat[inv] = NEG
    pid[inv] = G - 1

    out = pillar_scatter_max_pallas(
        jnp.asarray(feat), jnp.asarray(pid), num_segments=G, slab=128,
        interpret=True,
    )
    ref = _xla_reference(jnp.asarray(feat), jnp.asarray(pid), G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_kernel_empty_and_padding(rng):
    P, C, G = 100, 32, 64  # P not a slab multiple -> exercises padding
    feat = np.full((P, C), NEG, np.float32)
    pid = np.full((P,), G - 1, np.int32)
    out = pillar_scatter_max_pallas(
        jnp.asarray(feat), jnp.asarray(pid), num_segments=G, slab=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.zeros((G, C)))

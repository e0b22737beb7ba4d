"""Crop-resnet conv1 forms at agent shapes: (256,96,96,384) -> (256,48,48,64).

In-graph: bf16 7x7s2 = 9.33 ms (77% bf16 peak), int8 7x7s2 = 7.36 ms
(49% of int8 peak) — the int8 form underperforms.  Candidates:
  * plain int8 7x7 stride-2 (the current lowering)
  * int8 space-to-depth: 96x96x384 -> 48x48x1536, 4x4 stride-1 VALID conv
    with the 7x7 kernel embedded in 8x8 (1.31x the MACs, but stride-1
    full-lane form the MXU tiles better)
bf16 7x7s2 as the reference point.  Pure conv (epilogues excluded).

Run (TPU): python scripts/exp_conv1.py

MEASURED (v5e, 2026-08-18): bf16 7x7s2 9.29 ms, int8 7x7s2 7.36, int8
s2d 4x4s1 10.84 = 5.01 conv (94% of int8 peak) + 5.83 XLA transpose.
The transpose was then fused into the Pallas crop kernel's epilogue
(q8_s2d; phase-major matmul column order) in two forms — enlarged-tile
gs=16 (pallas class 4.41 -> 8.51 ms: dense hinge build scales with
tile_rows x group_size) and 2x2-group quad emit (4.41 -> 7.19: sub-vreg
phase regrouping) — BOTH net losses in the full agent (298.9 -> 294.3
steps/s for quad).  Verdict: plain q8 crops + direct int8 7x7s2 conv1
stay the default; s2d kept behind LAV_S2D_CROPS=1.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from exp_scatter import device_ms  # noqa: E402

B, H, C, O = 256, 96, 384, 64


def main():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(7, 7, C, O)).astype(np.float32)
    w8 = np.clip(np.round(w / (np.abs(w).max() / 127)), -127, 127
                 ).astype(np.int8)

    # inputs generated ON DEVICE: a (256,96,96,384) host array is ~900 MB
    # int8 / 1.8 GB bf16, and the tunnel moves ~20-100 MB/s — host argsets
    # would take 10+ minutes to ship (first attempt did exactly that)
    def args_bf16(i):
        return (jax.random.normal(jax.random.key(i), (B, H, H, C),
                                  jnp.bfloat16),)

    def args_s8(i):
        return (jax.random.randint(jax.random.key(i), (B, H, H, C),
                                   -127, 128, jnp.int8),)

    wj = jnp.asarray(w, jnp.bfloat16)
    wq = jnp.asarray(w8)

    @jax.jit
    def bf16_direct(x):
        return jax.lax.conv_general_dilated(
            x, wj, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def int8_direct(x):
        return jax.lax.conv_general_dilated(
            x, wq, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    # space-to-depth: pad 4 (even) folds into conv padding ((2,1),(2,1)),
    # kernel embedded at +1 in 8x8 then blocked to 4x4 over 4C
    w8e = np.zeros((8, 8, C, O), np.int8)
    w8e[1:8, 1:8] = w8
    w2 = w8e.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w2 = jnp.asarray(w2.reshape(4, 4, 4 * C, O))

    @jax.jit
    def int8_s2d(x):
        Bx, Hx, Wx, Cx = x.shape
        x2 = x.reshape(Bx, Hx // 2, 2, Wx // 2, 2, Cx)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            Bx, Hx // 2, Wx // 2, 4 * Cx)
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    # numerical check: s2d == direct (same int32 accumulation)
    xs = args_s8(0)[0][:4]
    np.testing.assert_array_equal(
        np.asarray(int8_direct(xs)), np.asarray(int8_s2d(xs)))

    device_ms(bf16_direct, [args_bf16(i) for i in range(4)],
              label="bf16 7x7 s2")
    device_ms(int8_direct, [args_s8(i) for i in range(4)],
              label="int8 7x7 s2")
    device_ms(int8_s2d, [args_s8(i) for i in range(4)],
              label="int8 s2d 4x4 s1")


if __name__ == "__main__":
    main()

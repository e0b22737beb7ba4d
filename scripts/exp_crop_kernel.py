"""TPU timing: fused Pallas crop kernel vs XLA gather at agent shapes.

Agent hot path: per ego, K=15 detection crops of 96x96 from a
(160,160,384) feature map; 16 egos vmapped; bf16.
"""
import functools
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lav_tpu.core.warp import affine_grid, _crop_theta, grid_sample_shared
import lav_tpu.core.warp_pallas as wp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(E, K, H, W, C, crop, dtype, label):
    nrng = np.random.default_rng(0)
    imgs = jnp.asarray(nrng.normal(size=(E, H, W, C)), dtype)
    locs = jnp.asarray(nrng.uniform(-8, 8, (E, K, 2)), jnp.float32)
    oris = jnp.asarray(nrng.uniform(-np.pi, np.pi, (E, K)), jnp.float32)
    theta = jax.vmap(lambda l, o: _crop_theta(l, o, H, W, 2.0, crop, 0.0, 0.75))(locs, oris)
    grids = jax.vmap(lambda t: affine_grid(t, crop, crop))(theta)

    xla = jax.jit(jax.vmap(grid_sample_shared))
    try:
        t_x = timeit(xla, imgs, grids)
    except Exception as e:
        print(f"{label} XLA failed: {str(e)[:150]}")
        t_x = float("nan")

    # route through the public entry point (it picks cb/gs and enforces
    # supports()); a shape combo the kernel rejects raises loudly here
    # rather than being silently swallowed as a timing failure
    pal = jax.jit(jax.vmap(lambda i, g: wp.grid_sample_shared_pallas(i, g)))
    try:
        t_p = timeit(pal, imgs, grids)
    except ValueError as e:  # supports() rejection only
        print(f"{label}: pallas ineligible: {str(e)[:200]}", flush=True)
        return
    # correctness on one ego
    ref = np.asarray(xla(imgs, grids)[0], np.float32)
    out = np.asarray(pal(imgs, grids)[0], np.float32)
    err = np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-9)
    print(f"{label}: XLA {t_x*1e3:.2f} ms, pallas {t_p*1e3:.2f} ms "
          f"(x{t_x/t_p:.1f}), rel_err {err:.2e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # agent v2 detection-crop shape
    run(16, 15, 160, 160, 384, 96, jnp.bfloat16, "agent-bf16")
    run(16, 15, 160, 160, 384, 96, jnp.float32, "agent-f32")
    # distillation training crop shape (bs=8, K=4 others + 1 ego ~ 5)
    run(8, 5, 160, 160, 384, 96, jnp.float32, "distill-f32")
    # teacher BEV crop (5 channels -> no 8-divisible block; expect skip)
    run(8, 5, 320, 320, 8, 192, jnp.float32, "bev8-f32")


if __name__ == "__main__":
    main()

"""Experiment: Mosaic tpu.dynamic_gather feasibility + speed for crop sampling.

Q1: does take_along_axis(axis=0) compile in a Pallas TPU kernel at
    multi-vreg operand sizes ((9216,128) etc.)?
Q2: how fast is it vs the XLA (2,2,C)-slice gather that costs 69 ms/tick?
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def test_basic(S, L, dtype):
    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.asarray(np.random.randn(S, L), dtype)
    idx = jnp.asarray(np.random.randint(0, S, size=(S, L)), jnp.int32)
    f = jax.jit(lambda x, idx: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, L), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx))
    try:
        out = f(x, idx)
        ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0))
        dt = timeit(f, x, idx)
        gbps = (3 * S * L * np.dtype(dtype).itemsize if dtype != jnp.bfloat16 else (2*2+4) * S * L) / dt / 1e9
        print(f"  ({S},{L}) {np.dtype(dtype).name if dtype!=jnp.bfloat16 else 'bf16'}: ok={ok} {dt*1e6:.1f} us ({gbps:.0f} GB/s effective)")
        return True
    except Exception as e:
        print(f"  ({S},{L}) {dtype}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    print("devices:", jax.devices())
    print("Q1: basic dynamic_gather compile/correctness/speed")
    test_basic(8, 128, jnp.float32)
    test_basic(512, 128, jnp.float32)
    test_basic(9216, 128, jnp.float32)
    test_basic(9216, 128, jnp.bfloat16)
    test_basic(9216, 256, jnp.float32)
    test_basic(25600, 128, jnp.float32)


if __name__ == "__main__":
    main()

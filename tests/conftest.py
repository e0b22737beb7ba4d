import os

# Force a virtual 8-device CPU mesh before jax initializes, so sharding
# tests exercise real multi-device code paths without TPU hardware.
# NOTE: must OVERRIDE, not setdefault — the environment presets
# JAX_PLATFORMS=axon,cpu which would put every test on the real TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon plugin clobbers JAX_PLATFORMS at import time (config becomes
# "axon,cpu" regardless of the env var) and the single TPU serializes any
# two JAX processes — so tests MUST pin CPU post-import via config.update.
jax.config.update("jax_platforms", "cpu")

# This environment's platform plugin defaults matmuls to low precision even
# on CPU; parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

# Single-core box: XLA compiles dominate test time.  Persist compiled
# executables across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2021)

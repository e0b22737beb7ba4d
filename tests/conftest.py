import os

# Force a virtual 8-device CPU mesh before jax initializes, so sharding
# tests exercise real multi-device code paths without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This environment's platform plugin defaults matmuls to low precision even
# on CPU; parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2021)

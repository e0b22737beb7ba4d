"""Device mesh + sharding helpers: the framework's collectives layer.

The reference's only multi-device pattern is single-process DataParallel
(/root/reference/lav/lav_privileged.py:52-58) — replicate params, scatter
the batch, implicit gradient reduction.  The TPU-native equivalent is a 1-D
`data` mesh over ICI with batch-sharded inputs and replicated params;
`jax.jit` with these shardings makes XLA insert the psum for the gradient
all-reduce.  Models here are ResNet-18 scale, so tensor/pipeline sharding
axes are deliberately absent (SURVEY.md §2.6); the mesh abstraction leaves
room to add them (`make_mesh(axes=...)`) without touching trainers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("data",)):
    """1-D (default) or n-D mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 unless divisible layout is requested
        shape = (n,) + (1,) * (len(axes) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

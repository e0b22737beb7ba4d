"""Device mesh + sharding helpers: the framework's collectives layer.

The reference's only multi-device pattern is single-process DataParallel
(/root/reference/lav/lav_privileged.py:52-58) — replicate params, scatter
the batch, implicit gradient reduction.  The TPU-native equivalent is a 1-D
`data` mesh over ICI with batch-sharded inputs and replicated params;
`jax.jit` with these shardings makes XLA insert the psum for the gradient
all-reduce.  Models here are ResNet-18 scale, so tensor/pipeline sharding
axes are deliberately absent (SURVEY.md §2.6); the mesh abstraction leaves
room to add them (`make_mesh(axes=...)`) without touching trainers.

Beyond one slice: `make_hybrid_mesh` builds a ("dcn", "data") mesh whose
minor axis rides ICI (fast within-slice links) and whose major axis spans
slices over DCN.  Batch-shard over BOTH axes (`batch_sharding(mesh,
axis=("dcn", "data"))`) and XLA decomposes the gradient all-reduce
hierarchically — reduce within each slice over ICI first, then the small
cross-slice sum over DCN — the standard recipe for cross-slice data
parallelism (the models are replicated; only gradients cross DCN).
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


def make_hybrid_mesh(n_slices: Optional[int] = None,
                     n_devices: Optional[int] = None,
                     axes: Sequence[str] = ("dcn", "data")):
    """("dcn", "data") mesh: minor axis within a slice (ICI), major axis
    across slices (DCN).

    On real multi-slice TPU the grouping comes from each device's
    `slice_index` so the minor axis never crosses a DCN boundary; elsewhere
    (CPU mesh tests, single slice) the devices are factored
    (n_slices, n//n_slices).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    slice_ids = {getattr(d, "slice_index", 0) for d in devs}
    if len(slice_ids) > 1:
        per = {}
        for d in devs:
            per.setdefault(d.slice_index, []).append(d)
        counts = {len(v) for v in per.values()}
        assert len(counts) == 1, f"uneven slices: { {k: len(v) for k, v in per.items()} }"
        grid = [per[s] for s in sorted(per)]
        return Mesh(np.asarray(grid), axes)
    s = n_slices or 1
    assert n % s == 0, (n, s)
    return Mesh(np.asarray(devs).reshape(s, n // s), axes)


def batch_sharding(mesh: Mesh, axis=None):
    """Shard the leading (batch) dim over the given mesh axis (or ALL mesh
    axes by default — correct for both the 1-D data mesh and the hybrid
    ("dcn", "data") mesh), replicate the rest."""
    if axis is None:
        axis = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis=None):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

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
    """1-D mesh over the available devices (use `make_hybrid_mesh` for the
    2-D cross-slice case; no other multi-axis layout has a consumer)."""
    if len(axes) != 1:
        raise ValueError(
            f"make_mesh builds 1-D meshes only (got axes={tuple(axes)}); "
            "use make_hybrid_mesh for the ('dcn', 'data') layout"
        )
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axes)


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
    per = {}
    for d in devs:
        per.setdefault(getattr(d, "slice_index", 0), []).append(d)
    if len(per) > 1:
        if n_slices is not None and n_slices != len(per):
            raise ValueError(
                f"requested {n_slices} DCN slices but the {n} visible "
                f"devices span {len(per)} hardware slices "
                f"{sorted(per)} — the dcn axis must follow the real "
                f"slice topology"
            )
        counts = {len(v) for v in per.values()}
        if len(counts) != 1:
            raise ValueError(
                "uneven devices per slice "
                f"{ {k: len(v) for k, v in per.items()} } — pass an "
                "n_devices that keeps whole slices"
            )
        grid = [per[s] for s in sorted(per)]
        return Mesh(np.asarray(grid), axes)
    s = n_slices or 1
    if n % s:
        raise ValueError(f"{n} devices do not factor into {s} slices")
    return Mesh(np.asarray(devs).reshape(s, n // s), axes)


def batch_sharding(mesh: Mesh, axis=None):
    """Shard the leading (batch) dim, replicate the rest.

    Default axis: "data" for a 1-D mesh; ("dcn", "data") jointly for the
    hybrid mesh.  Any OTHER multi-axis mesh (e.g. a future ("data",
    "model") tensor mesh) must pass the batch axis explicitly — sharding
    the batch over a model axis silently would be wrong."""
    if axis is None:
        names = mesh.axis_names
        if names == ("dcn", "data"):
            axis = names
        elif len(names) == 1:
            axis = names[0]
        else:
            raise ValueError(
                f"mesh has axes {names}; pass the batch axis explicitly"
            )
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

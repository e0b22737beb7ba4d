"""Checkpointing: orbax-backed save/restore of params + optimizer state.

Upgrade over the reference's bare `torch.save(state_dict)` per epoch
(/root/reference/lav/train_full.py:33-42): we persist optimizer state and
step counters so mid-stage resume is exact, while keeping the reference's
stage-pointer pattern (each stage loads the previous stage's weights by
config path).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (params / {'params':..., 'opt_state':..., 'step':...})."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, tree, force=True)
        ckpt.wait_until_finished()
    else:  # flat-npz fallback
        flat, treedef = jax.tree.flatten(tree)
        np.savez(path + ".npz", treedef=str(treedef),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_params(path: str, like_params: Any):
    """Stage-pointer loading: accept either a full training snapshot
    ({'params', 'opt_state', 'epoch', 'it'}) or bare params."""
    import numpy as np

    try:
        snap = load_checkpoint(path, dict(
            params=like_params, opt_state=None,
            epoch=np.int64(0), it=np.int64(0),
        ))
        return snap["params"]
    except Exception:
        return load_checkpoint(path, like_params)


def load_checkpoint(path: str, like: Any):
    """Restore a pytree with the structure/shapes of `like`."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        # orbax accepts ndarray/jax.Array/ShapeDtypeStruct template leaves
        # but rejects bare numpy scalars (np.int64(0)) — normalize
        return ckpt.restore(path, jax.tree.map(np.asarray, like))
    data = np.load(path + ".npz", allow_pickle=True)
    flat, treedef = jax.tree.flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)

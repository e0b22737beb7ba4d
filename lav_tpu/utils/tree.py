"""Pytree utilities for threading BatchNorm running statistics.

Apply functions return a `state` tree that mirrors a *subset* of the params
tree, holding {'mean','var'} dicts at each BN site.  `merge_bn_state`
recursively writes those back into a params tree, producing the updated
params (pure — no mutation).
"""

from __future__ import annotations


def merge_bn_state(params, state):
    """Recursively merge a BN-state tree into a params tree.

    `state` has the same dict structure as `params` but only contains the
    branches that hold BN stats; a leaf-level dict {'mean','var'} replaces
    those two entries of the corresponding params dict.
    """
    if state is None:
        return params
    if isinstance(state, dict) and set(state.keys()) == {"mean", "var"}:
        out = dict(params)
        out["mean"], out["var"] = state["mean"], state["var"]
        return out
    if isinstance(state, dict):
        out = dict(params)
        for k, v in state.items():
            if k in out:
                out[k] = merge_bn_state(out[k], v)
        return out
    if isinstance(state, (list, tuple)):
        merged = [merge_bn_state(p, s) for p, s in zip(params, state)]
        return type(state)(merged) if not isinstance(params, list) else merged
    return params

"""Opt-in int8 quantized inference for the conv stacks.

The reference's "fast inference" move is TorchScript tracing
(/root/reference/team_code_v2/model_inference.py:20-32); the TPU-native
equivalent of its spirit — trade a bounded accuracy delta for throughput —
is int8 MXU arithmetic: v5e retires int8 matmuls at 2x the bf16 rate
(394 vs 197 TOPS) and int8 activations halve the HBM traffic of the
bandwidth-bound camera nets.

Scheme (inference only, no QAT):
  * weights: per-output-channel symmetric absmax int8, quantized ONCE by
    `quantize_tree` (a pure params transform — models are untouched;
    `layers.conv2d` dispatches on the presence of `w_int8`)
  * activations: dynamic per-tensor symmetric absmax int8, computed per
    call (one cheap reduction per conv)
  * accumulation in int32 on the MXU, dequantized to the caller's dtype,
    bias added in float

Accuracy is policy-bounded, not layer-bounded: tests/test_quant.py replays
ticks through the fused agent in f32 vs int8 and asserts the control
deviation stays inside a documented envelope.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_conv(p: Dict[str, Any]) -> Dict[str, Any]:
    """Conv/linear param dict {'w': HWIO or (I,O), 'b'?} -> int8 form.

    Computed host-side in numpy: a device round-trip per tiny op through
    the remote-TPU tunnel costs ~0.5 s each and made the jnp version of
    this one-time transform take minutes (measured 134 s for the agent's
    param tree)."""
    import numpy as np

    w = np.asarray(p["w"], np.float32)
    red = tuple(range(w.ndim - 1))          # all but the output channel
    scale = np.abs(w).max(axis=red) / 127.0
    scale = np.maximum(scale, 1e-12)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = {"w_int8": jnp.asarray(wq), "w_scale": jnp.asarray(scale)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_conv_params(node) -> bool:
    return (isinstance(node, dict) and "w" in node
            and hasattr(node["w"], "ndim") and node["w"].ndim == 4)


import re

# param-tree keys whose subtrees must stay float: ConvTranspose blocks
# (same 4-D 'w' layout as a conv — distinguished only by their consumer:
# rgb.py "up{i}", lidar.py "upconvN"/"up", erfnet "up"/"output_conv",
# unet "upconv") and the lidar entry block (consumes the 128-lane-padded
# canvas through the pad-absorbing fast path that reads p['conv']['w']).
# Detection-head subtrees are walked: their 3x3 conv (merged 384->256,
# ~89% of bf16 MXU peak) quantizes — models/lidar.py:_merged_heads
# merges the int8 weights/scales — while the block-diagonal convT's
# "up" key is caught by up\d* (zero digits) and stays raw.
_SKIP_KEYS = re.compile(r"^(up\d*|upconv\d*|output_conv|conv1_0)$")


def quantize_tree(tree, *, min_channels: int = 16, include=None):
    """Quantize every forward-conv weight dict in a params pytree (dicts
    with a 4-D 'w', excluding the _SKIP_KEYS subtrees above).
    `min_channels` keeps tiny entry stems in float (3-channel RGB stems:
    negligible cost, image-scale dynamic range).
    `include`: optional regex (string or compiled) of key names to walk
    even when _SKIP_KEYS matches — e.g. r"^upconv\\d$" quantizes the
    lidar backbone's ConvTranspose up-projections through
    conv_transpose2d_int8 (round-5 campaign on the 3.7 ms bf16-residue
    bucket).  MEASURED NET LOSS on TPU — bench 289.36 vs 298.90
    steps/s: the input-dilated s8 conv is +1.6 ms slower than the
    bf16 form (lhs_dilation defeats the int8 MXU fast path) and the
    quantize re-emits add +1.2 ms.  Kept off by default."""
    if include is not None and isinstance(include, str):
        include = re.compile(include)

    def skip(k):
        return (_SKIP_KEYS.match(k)
                and not (include is not None and include.match(k)))

    def walk(node):
        if _is_conv_params(node):
            if node["w"].shape[2] >= min_channels:
                return quantize_conv(node)
            return node
        if isinstance(node, dict):
            return {k: (v if skip(str(k)) else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    return walk(tree)


# ---------------------------------------------------------------------------
# activation scaling: dynamic per-tensor by default; after `calibrate`
# runs the model EAGERLY (params dicts are plain mutable dicts outside
# jit), each conv carries a static "x_scale" — the quantize then becomes
# a pure elementwise cast that XLA fuses into the producing op, instead
# of an unfusable amax-reduction barrier + extra activation pass
# (measured: dynamic scales cost +12 ms/tick on the 16-ego agent, MORE
# than the int8 convs save)
# ---------------------------------------------------------------------------

_CALIBRATING = False


def calibrate(run_once, *args, **kwargs):
    """Run `run_once` (an UNJITTED forward on representative inputs) with
    observer mode on: every int8 conv records its input absmax into its
    own param dict as a static x_scale (max over calls).  Returns the
    forward's result."""
    global _CALIBRATING
    _CALIBRATING = True
    try:
        return run_once(*args, **kwargs)
    finally:
        _CALIBRATING = False


def _x_scale(p, x):
    if _CALIBRATING and not isinstance(x, jax.core.Tracer):
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        prev = float(p.get("x_scale", 0.0))
        p["x_scale"] = jnp.float32(max(prev, max(amax, 1e-12) / 127.0))
        return p["x_scale"]
    # a TRACED x during calibration means this conv runs under a
    # scan/lax.map body (e.g. the planner's crop resnet,
    # uniplanner_infer) where observer mutation cannot see concrete
    # values — fall through to the stored/dynamic scale; such convs are
    # calibrated DIRECTLY by the caller (__graft_entry__._calibrate_v2_scales
    # replays real feature-map windows through resnet_apply at top level)
    if "x_scale" in p:
        return p["x_scale"]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.maximum(amax / 127.0, 1e-12)


def conv_transpose2d_int8(p, x, conv_pad, lhs_dil):
    """int8 input-dilated conv (the ConvTranspose lowering in layers.py)
    with int32 MXU accumulation."""
    s_x = _x_scale(p, x)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, jnp.flip(p["w_int8"], axis=(0, 1)),
        window_strides=(1, 1),
        padding=conv_pad,
        lhs_dilation=lhs_dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def split_scales(tree):
    """Split quantization scale leaves (w_scale / x_scale) out of a params
    pytree into host numpy arrays keyed by path.  Passing them back via
    `merge_scales` INSIDE a jitted wrapper turns them into compile-time
    constants: they vanish from the per-call argument list (through this
    environment's remote tunnel, +300 argument leaves measurably
    throttled dispatch below the device rate) and fold into the conv
    epilogues."""
    import numpy as np

    scales = {}

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("w_scale", "x_scale"):
                    scales[path + (k,)] = np.asarray(v)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,))
                              for i, v in enumerate(node))
        return node

    return walk(tree, ()), scales


def merge_scales(tree, scales):
    """Reinsert split scales (call inside jit so they become constants)."""
    def setpath(node, path, val):
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jnp.asarray(val)

    out = _shallow_clone(tree)
    for path, val in scales.items():
        setpath(out, path, val)
    return out


def _shallow_clone(node):
    if isinstance(node, dict):
        return {k: _shallow_clone(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_shallow_clone(v) for v in node)
    return node


def conv2d_int8_s2d(p, x_s2d, out_dtype=jnp.bfloat16):
    """conv1 on SPACE-TO-DEPTH int8 input: x_s2d (B, H/2, W/2, 4C) in
    (dy, dx, c) channel order (the Pallas crop kernel's s2d emit) with
    p's 7x7 'w_int8' (C in-channels), stride 2, padding 3.

    The direct int8 7x7s2 conv runs at 49% of int8 peak; embedding the
    kernel at +1 in 8x8 and blocking it 2x2 turns it into a 4x4 stride-1
    conv over the s2d view — identical int32 accumulation (verified
    element-exact, scripts/exp_conv1.py), 94% of peak.  The even pre-pad
    folds into conv padding ((2,1),(2,1)) exactly as in the bf16 s2d
    entry conv (nn/resnet.py::_conv1_space_to_depth)."""
    w = p["w_int8"]  # (7, 7, C, O)
    kh, kw, C, O = w.shape
    w8 = jnp.zeros((8, 8, C, O), w.dtype).at[1:1 + kh, 1:1 + kw].set(w)
    w2 = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(4, 4, 4 * C, O)
    y = jax.lax.conv_general_dilated(
        x_s2d, w2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (p["x_scale"] * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_int8(p, x, strides, padding, dil, out_dtype=None):
    """int8 x int8 -> int32 conv on the MXU, dequantized to x.dtype.

    An x that is ALREADY int8 is consumed as-is (it was quantized by its
    producer with this conv's calibrated x_scale — e.g. the Pallas crop
    kernel's q8 epilogue, core/warp_pallas.py) and dequantized to
    `out_dtype` (default bfloat16, the inference compute dtype)."""
    if x.dtype == jnp.int8:
        s_x = p["x_scale"]  # producer quantized with the calibrated scale
        xq = x
        out_dtype = out_dtype or jnp.bfloat16
    else:
        s_x = _x_scale(p, x)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        out_dtype = out_dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        xq, p["w_int8"],
        window_strides=strides,
        padding=padding,
        rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * p["w_scale"])
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)

"""Production-shape golden regressions (VERDICT r4 #4).

The round-4 miscompile lived exactly in the gap between tiny_config tests
and production shapes (C<=96 exact, C=128 miscompiled), so the tiny
goldens in test_golden.py cannot protect the headline configs.  These pin:

  (a) the full v2 agent step at the REAL config (320x320 grid, 288x256
      cameras, production channel widths; reduced point count so CPU f32
      stays tractable), and
  (b) the int8-mxu quantized step — the exact config bench.py's headline
      number is measured on (bf16 compute + int8 lidar/planner stacks,
      committed calibration scales).

Tolerances: (a) is f32 and uses the standard golden tolerance; (b) runs
bf16 compute, whose cross-machine reduction-order noise is ~1e-2
relative — the loose tolerance still catches miscompile-scale (O(1))
corruption, which is the failure mode this file exists for.

Regenerate intentionally: REGEN_GOLDEN=1 python -m pytest tests/test_golden_production.py -q
"""

import os

import numpy as np
import pytest
import jax

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = bool(os.environ.get("REGEN_GOLDEN"))

MAX_POINTS = 2048  # production grid/channels; reduced sweep for CPU f32


def _check(name, arrays: dict, atol, rtol):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    arrays = {k: np.asarray(v, np.float32) for k, v in arrays.items()}
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **arrays)
        pytest.skip(f"golden {name} (re)generated")
    if not os.path.exists(path):
        pytest.fail(
            f"golden file {path} missing — regenerate deliberately with "
            f"REGEN_GOLDEN=1 if the change is intended"
        )
    ref = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            v, ref[k], atol=atol, rtol=rtol,
            err_msg=f"{name}/{k} drifted from golden",
        )


def _run_ticks(step, params, state, obs, n=2):
    jstep = jax.jit(step)
    outs = []
    for _ in range(n):
        ctrl, state, aux = jstep(params, state, obs)
        outs.append([float(ctrl.steer), float(ctrl.throttle),
                     float(ctrl.brake)])
    return np.asarray(outs, np.float32), state, aux


def test_golden_v2_agent_production_f32():
    import __graft_entry__ as g

    step, params, state, obs, _ = g._v2_agent_setup(
        max_points=MAX_POINTS, compute_dtype=None, quant_int8=False)
    controls, state, aux = _run_ticks(step, params, state, obs)
    _check("v2_agent_production_f32", dict(
        controls=controls,
        plan=aux["plan_locs"],
        ekf=state.ekf.x,
    ), atol=1e-4, rtol=1e-3)


def test_golden_v2_agent_production_int8_mxu():
    import jax.numpy as jnp
    import __graft_entry__ as g

    step, params, state, obs, info = g._v2_agent_setup(
        max_points=MAX_POINTS, compute_dtype=jnp.bfloat16,
        quant_int8="mxu", allow_recalibrate=False)
    assert info["quant"] == "mxu", info  # the golden must pin the REAL config
    controls, state, aux = _run_ticks(step, params, state, obs)
    _check("v2_agent_production_int8", dict(
        controls=controls,
        plan=aux["plan_locs"],
        ekf=state.ekf.x,
    ), atol=3e-2, rtol=3e-2)

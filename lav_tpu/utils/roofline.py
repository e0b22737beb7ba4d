"""Roofline accounting: per-op-class device time + achieved-vs-peak summary.

The reference has no performance surface at all (SURVEY.md §5); here every
bench can emit a self-auditing roofline block: total FLOPs/bytes from XLA's
compiled cost analysis, per-op-class device time from a jax.profiler trace
(no tensorboard needed — the .trace.json.gz is parsed directly), and
achieved-vs-peak ratios against the chip's datasheet numbers.

Peak numbers are per-chip and settable per generation; defaults are
TPU v5e (197 TFLOP/s bf16, 394 TOP/s int8, 819 GB/s HBM).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from typing import Callable, Dict, Optional

import jax

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_INT8_OPS = 394e12
V5E_PEAK_HBM_BYTES = 819e9

# op-class buckets, tested in order; first match wins
_CLASSES = (
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv", re.compile(r"conv", re.I)),
    ("matmul", re.compile(r"\bdot\b|dot_general|einsum", re.I)),
    ("pallas", re.compile(r"custom-call|tpu_custom_call|pallas", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("gather", re.compile(r"gather|dynamic-slice|dynamic_slice", re.I)),
    ("copy", re.compile(r"copy|transpose|bitcast|reshape|broadcast", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("elementwise", re.compile(r"fusion|add|multiply|select|compare", re.I)),
)


def classify_op(name: str) -> str:
    for cls, pat in _CLASSES:
        if pat.search(name):
            return cls
    return "other"


def parse_trace(logdir: str) -> Dict[str, float]:
    """Sum device-track "X" event durations (us) by op name from the newest
    profile under `logdir` (CLAUDE.md recipe, made reusable)."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")
    ))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device op track = threads named "XLA Ops" on a TPU/device process
    dev_pids = set()
    op_tids = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if re.search(r"TPU|/device", ev["args"].get("name", ""), re.I):
                dev_pids.add(ev["pid"])
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            op_tids[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")

    def on_op_track(ev):
        tname = op_tids.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" in tname:
            return True
        # fallback: any thread on a device process when no "XLA Ops"
        # thread exists in this profiler version
        return (not any("XLA Ops" in v for v in op_tids.values())
                and ev.get("pid") in dev_pids)

    durs: Dict[str, float] = collections.defaultdict(float)
    for ev in events:
        if ev.get("ph") == "X" and on_op_track(ev):
            durs[ev.get("name", "?")] += ev.get("dur", 0.0)
    if not durs:
        raise RuntimeError("no device X events found in trace")
    return dict(durs)


def per_class_ms(durs_us: Dict[str, float], iters: int = 1) -> Dict[str, float]:
    out: Dict[str, float] = collections.defaultdict(float)
    for name, us in durs_us.items():
        out[classify_op(name)] += us / 1000.0 / iters
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def cost_totals(compiled) -> Dict[str, float]:
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes": float(cost.get("bytes accessed", float("nan"))),
    }


def roofline_summary(
    compiled,
    run: Callable[[], object],
    iters: int = 4,
    logdir: Optional[str] = None,
    peak_flops: float = V5E_PEAK_BF16_FLOPS,
    peak_bytes: float = V5E_PEAK_HBM_BYTES,
) -> Dict:
    """Trace `iters` calls of `run` (must block on its own result), parse
    per-op-class device time, and combine with the compiled cost analysis
    into an achieved-vs-peak summary.

    Returns a JSON-ready dict:
      classes_ms: per-op-class device ms per iteration
      device_ms:  total device compute ms per iteration
      flops/bytes: per-iteration totals (XLA cost analysis)
      achieved_tflops / hbm_gbs: totals over measured device time
      mfu / hbm_util: achieved vs datasheet peak
    """
    own = logdir is None
    logdir = logdir or tempfile.mkdtemp(prefix="lav_roofline_")
    try:
        run()  # warm
        jax.profiler.start_trace(logdir)
        try:
            for _ in range(iters):
                run()
        finally:
            jax.profiler.stop_trace()
        durs = parse_trace(logdir)
    finally:
        if own:
            shutil.rmtree(logdir, ignore_errors=True)
    classes = per_class_ms(durs, iters)
    device_ms = sum(classes.values())
    totals = cost_totals(compiled)
    dev_s = device_ms / 1000.0
    achieved_tflops = totals["flops"] / dev_s / 1e12 if dev_s else 0.0
    hbm_gbs = totals["bytes"] / dev_s / 1e9 if dev_s else 0.0
    return {
        "classes_ms": {k: round(v, 3) for k, v in classes.items()},
        "device_ms": round(device_ms, 3),
        "gflops": round(totals["flops"] / 1e9, 2),
        "gbytes": round(totals["bytes"] / 1e9, 3),
        "achieved_tflops": round(achieved_tflops, 2),
        "hbm_gbs": round(hbm_gbs, 1),
        "mfu": round(achieved_tflops * 1e12 / peak_flops, 4),
        "hbm_util": round(hbm_gbs * 1e9 / peak_bytes, 4),
    }

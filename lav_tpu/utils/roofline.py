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


def fusion_kinds_from_hlo(hlo_text: str) -> Dict[str, str]:
    """Map fusion op names -> dominant inner-op class by scanning each
    `calls=`d fused computation for a scatter/conv/gather/sort root.

    Trace event names like `fusion.41` say nothing about content (the
    pillar scatters, convs and gathers all present as bare fusions);
    this recovers the class from the compiled HLO so per_class_ms can
    attribute them honestly."""
    # fusion def lines: %fusion.N = <shape> fusion(...), ..., calls=%comp
    fusion_comp = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = \S+ fusion\([^\n]*?calls=%?([\w.\-]+)", hlo_text
    ):
        fusion_comp[m.group(1)] = m.group(2)
    # computation bodies: scan for high-signal inner ops; fusions NEST
    # (a kCustom scatter fusion wraps inner fusions), so also record each
    # body's inner `calls=` edges and resolve transitively
    cur = None
    kinds_present: Dict[str, set] = {}
    calls_edges: Dict[str, set] = {}
    for line in hlo_text.splitlines():
        m = re.match(r"%?([\w.\-]+) \(", line)
        if m and not line.startswith(" "):
            cur = m.group(1)
            kinds_present[cur] = set()
            calls_edges[cur] = set()
            continue
        if cur is None:
            continue
        om = re.match(r"\s+(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
        if om:
            kinds_present[cur].add(om.group(1))
        for cm in re.finditer(r"calls=%?([\w.\-]+)", line):
            calls_edges[cur].add(cm.group(1))
        if line.rstrip() == "}":
            cur = None
    priority = ("scatter", "convolution", "gather", "sort", "dot")
    rename = {"convolution": "conv", "dot": "matmul"}

    def resolve(comp: str, depth: int = 0) -> Optional[str]:
        if comp not in kinds_present or depth > 4:
            return None
        kinds = set(kinds_present[comp])
        for sub in calls_edges.get(comp, ()):
            if sub in kinds_present:
                kinds |= kinds_present[sub]
        for p in priority:
            if p in kinds:
                return rename.get(p, p)
        for sub in calls_edges.get(comp, ()):
            k = resolve(sub, depth + 1)
            if k:
                return k
        return None

    out = {}
    for f, c in fusion_comp.items():
        k = resolve(c)
        if k:
            out[f] = k
    return out


def per_class_ms(durs_us: Dict[str, float], iters: int = 1,
                 fusion_kinds: Optional[Dict[str, str]] = None
                 ) -> Dict[str, float]:
    out: Dict[str, float] = collections.defaultdict(float)
    for name, us in durs_us.items():
        cls = (fusion_kinds or {}).get(name) or classify_op(name)
        out[cls] += us / 1000.0 / iters
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
    fk = None
    try:
        fk = fusion_kinds_from_hlo(compiled.as_text())
    except Exception:
        pass  # classification falls back to name-pattern buckets
    classes = per_class_ms(durs, iters, fusion_kinds=fk)
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

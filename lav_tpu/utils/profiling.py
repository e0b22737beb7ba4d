"""Profiling: jax.profiler traces + step timing as first-class utilities.

The reference has no profiling surface at all (SURVEY.md §5 — tqdm bars
only); here every trainer/agent loop can wrap iterations in `StepTimer`
and capture device traces with `trace()` for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lav_tpu_trace"):
    """Capture a device trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with device sync on sample boundaries."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.samples: List[float] = []
        self._n = 0
        self._t: Optional[float] = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self.samples.append(dt)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[min(n - 1, int(n * 0.9))],
            "steps_per_sec": n / sum(s),
        }

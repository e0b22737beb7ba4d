"""Metrics/diagnostics logger: wandb when available, JSONL always.

Covers the reference Logger surface (lav/utils/logger.py:20-214): per-stage
scalar logging, periodic rich diagnostics, checkpoint registration — with a
local JSONL + npz sink so training is observable without network access.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

try:
    import wandb  # type: ignore
    _HAVE_WANDB = True
except Exception:  # pragma: no cover
    _HAVE_WANDB = False


class Logger:
    def __init__(self, project: str, save_dir: Optional[str] = None,
                 use_wandb: bool = False, config: Optional[dict] = None):
        self.project = project
        self.use_wandb = use_wandb and _HAVE_WANDB
        if self.use_wandb:
            wandb.init(project=project, config=config or {})
            self.save_dir = wandb.run.dir
        else:
            self.save_dir = save_dir or os.path.join(
                "runs", project, time.strftime("%Y%m%d_%H%M%S")
            )
            os.makedirs(self.save_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.save_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict):
        scalars = {}
        arrays = {}
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                scalars[k] = float(v)
            else:
                arrays[k] = v
        rec = {"step": step, "t": time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if arrays:
            np.savez_compressed(
                os.path.join(self.save_dir, f"diag_{step:08d}.npz"), **arrays
            )
        if self.use_wandb:
            wandb.log(scalars, step=step)
        return rec

    def log_gradients(self, step: int, grads, max_leaves: int = 256):
        """Functional analog of the reference's wandb.watch gradient
        watching (lav/utils/logger.py:32-33): per-parameter-path gradient
        norms + the global norm, into the same scalar sinks."""
        flat = {}

        def walk(tree, path):
            if isinstance(tree, dict):
                for k in sorted(tree):
                    walk(tree[k], f"{path}/{k}" if path else k)
            else:
                flat[path] = np.asarray(tree)

        walk(grads, "")
        sq = 0.0
        scalars = {}
        for i, (path, g) in enumerate(flat.items()):
            norm = float(np.linalg.norm(g.astype(np.float64)))
            sq += norm * norm
            if i < max_leaves:
                scalars[f"grad/{path}"] = norm
        scalars["grad/global_norm"] = float(np.sqrt(sq))
        return self.log(step, scalars)

    def video_recorder(self, name: str, fps: int = 20):
        """MJPEG-AVI recorder in the run dir (the reference flushes every
        evaluation's viz canvases to wandb as a 20-fps video,
        team_code_v2/lav_agent.py:158-165)."""
        from lav_tpu.utils.video import VideoRecorder

        return VideoRecorder(os.path.join(self.save_dir, name), fps=fps)

    def save_file(self, path: str):
        if self.use_wandb:
            wandb.save(path)

    def close(self):
        self._jsonl.close()
        if self.use_wandb:
            wandb.finish()

"""Static-shape center-heatmap peak extraction (detection decoding).

The reference decodes detections with a CPU/GPU ping-pong loop
(/root/reference/team_code_v2/lav_agent.py:427-446, 547-561 `extract_peak`):
maxpool NMS, dynamic top-k, Python-side score/geometry filters.  Here the
whole decode is masked tensor ops with a fixed `max_det`, so it fuses into
the jitted agent step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lav_tpu.nn.layers import max_pool2d


class Detections(NamedTuple):
    """Fixed-capacity detection set: slot i is meaningful iff valid[i]."""
    score: jnp.ndarray  # (..., K)
    x: jnp.ndarray      # (..., K) int32 column
    y: jnp.ndarray      # (..., K) int32 row
    w: jnp.ndarray      # (..., K) box half-width (px)
    h: jnp.ndarray      # (..., K) box half-height (px)
    cos: jnp.ndarray    # (..., K)
    sin: jnp.ndarray    # (..., K)
    valid: jnp.ndarray  # (..., K) bool


def extract_peaks(heatmap, *, max_pool_ks: int = 7, min_score: float = 0.1,
                  max_det: int = 15):
    """heatmap (H, W) -> (scores (K,), xs (K,), ys (K,), valid (K,)).

    NMS = a peak must equal its local max in a ks x ks window; then static
    top-k with a score threshold mask (reference extract_peak semantics).
    """
    H, W = heatmap.shape
    local_max = max_pool2d(
        heatmap[None, :, :, None], max_pool_ks, 1, max_pool_ks // 2
    )[0, :, :, 0]
    suppressed = heatmap - (local_max > heatmap).astype(heatmap.dtype) * 1e5
    k = min(max_det, H * W)
    scores, idx = jax.lax.top_k(suppressed.reshape(-1), k)
    xs = (idx % W).astype(jnp.int32)
    ys = (idx // W).astype(jnp.int32)
    return scores, xs, ys, scores > min_score


def det_inference(
    heatmaps,
    sizemaps,
    orimaps,
    *,
    pixels_per_meter: float = 4.0,
    max_pool_ks: int = 7,
    min_score: float = 0.1,
    max_det: int = 15,
    ego_xy=None,
    ego_exclusion_px: float = 2.0,
) -> Detections:
    """Decode per-class detections from dense head outputs.

    heatmaps (C, H, W) already sigmoided; sizemaps/orimaps (2, H, W).
    Returns a Detections with leading class axis (C, K).

    Filters (matching the reference's quirky predicate
    `if i==1 and w < 0.1*ppm or h < 0.2*ppm: continue`, which by Python
    precedence drops ANY class with h < 0.2*ppm — reproduced faithfully),
    plus the ego-proximity exclusion used by the agent
    (lav_agent.py:439-441).
    """
    C, H, W = heatmaps.shape

    def per_class(cls_idx, hm):
        scores, xs, ys, valid = extract_peaks(
            hm, max_pool_ks=max_pool_ks, min_score=min_score, max_det=max_det
        )
        w = sizemaps[0, ys, xs]
        h = sizemaps[1, ys, xs]
        cos = orimaps[0, ys, xs]
        sin = orimaps[1, ys, xs]
        drop = ((cls_idx == 1) & (w < 0.1 * pixels_per_meter)) | (
            h < 0.2 * pixels_per_meter
        )
        valid = valid & ~drop
        if ego_xy is not None:
            d2 = (xs.astype(hm.dtype) - ego_xy[0]) ** 2 + (
                ys.astype(hm.dtype) - ego_xy[1]
            ) ** 2
            valid = valid & (d2 > ego_exclusion_px ** 2)
        return Detections(scores, xs, ys, w, h, cos, sin, valid)

    dets = [per_class(i, heatmaps[i]) for i in range(C)]
    return Detections(*[jnp.stack(f) for f in zip(*dets)])

"""Static-shape PointPillars featurizer (the reference's hot spot, redesigned).

The reference voxelizer (/root/reference/lav/models/point_pillar.py:38-116)
is dynamic-shape: per-batch-item Python loops, `coords.unique`, and
`torch_scatter` CUDA kernels.  None of that maps to XLA.  This module uses
the TPU-native formulation:

  * points padded to a fixed capacity with a validity mask
  * pillar id = canvas_row * nx + canvas_col, invalid points -> dump slot
  * per-pillar mean (decoration) and max (pooling) via batched scatter ops
    over a dense (ny*nx + 1) segment space — shapes fully static
  * masked BatchNorm so padded points never contaminate statistics

Output is the dense (B, ny, nx, C) canvas consumed by the conv backbone;
empty pillars are exactly zero, matching the reference's zero-initialized
canvas (point_pillar.py:87-90).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from lav_tpu.nn import layers as L

import os

# inference knob: emit the pillar canvas 128 lanes wide (see the zero-init
# scatter fast path) so the downstream conv skips the 64->128 retile
PAD_CANVAS_LANES = os.environ.get("LAV_PAD_CANVAS_LANES", "1") == "1"

# fold the decoration into the first MLP layer (algebraic identity — see
# _fused_decoration_layer).  MEASURED SLOWER in the 16-ego agent tick
# (96.7-99.1 vs 92.4 ms): the wide per-point accumulator gather / segment-
# space embedding cost more than the narrow-fusion chain XLA builds for the
# materialized path.  Kept as a verified-equal knob; off by default.
# Env-settable (LAV_FUSED_DECORATION=1) so experiments don't mutate module
# globals (VERDICT r3 weak-6).
FUSED_DECORATION = os.environ.get("LAV_FUSED_DECORATION", "0") == "1"


def compute_pillar_ids(
    points,
    valid,
    *,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    pixels_per_meter: float,
    nx: int,
    ny: int,
):
    """Map points (..., P, D>=2) to canvas pillar ids.

    Returns (pid, keep, ix, iy):
      pid  (..., P) int32 in [0, ny*nx]; ny*nx is the dump slot
      keep (..., P) bool — in-range AND caller-valid
      ix, iy (..., P) int32 integer grid coords (pre canvas-flip)

    Canvas layout matches the reference scatter (point_pillar.py:87-90),
    whose padded coords are (batch, x_idx, y_idx):
        row = clamp(ny-1 - x_idx), col = clamp(y_idx)
    i.e. the FORWARD (x) axis runs up the rows (ego near the bottom) and the
    lateral (y) axis along the columns — the BEV-image orientation every
    downstream consumer assumes (heatmap targets lidar_dataset.py:108-114,
    ego pixel lav_agent.py:94, planner crops).  Round-1 had this transposed;
    caught by tests/test_oracle_torch.py::test_oracle_lidar_model.
    """
    x, y = points[..., 0], points[..., 1]
    keep = (
        valid
        & (x >= min_x)
        & (x < max_x)
        & (y >= min_y)
        & (y < max_y)
    )
    ix = jnp.floor((x - min_x) * pixels_per_meter).astype(jnp.int32)
    iy = jnp.floor((y - min_y) * pixels_per_meter).astype(jnp.int32)
    ix = jnp.clip(ix, 0, ny - 1)   # becomes the (flipped) row
    iy = jnp.clip(iy, 0, nx - 1)   # becomes the column
    row = ny - 1 - ix
    pid = jnp.where(keep, row * nx + iy, ny * nx)
    return pid, keep, ix, iy


def _segment_mean_gather(values, pid, keep, num_segments: int,
                         indices_sorted: bool = False):
    """Per-segment mean of `values` (P, D) over pid (P,), gathered back to
    points: returns (P, D).  Invalid points contribute nothing.

    One fused scatter-add of [values, 1] (TPU scatters are expensive —
    never issue two where one will do).

    `indices_sorted` is accepted for API compatibility but NO LONGER
    reaches the scatter/gather: XLA's TPU emitter MISCOMPILES a vmapped
    `indices_are_sorted=True` scatter at 128-wide update rows (drops most
    updates — max|err| 9.3 vs CPU at agent shapes, C<=64 exact; measured
    round 4, see bench.py numerics guard).  The round-3 "sorted fast
    path" speedup (13.4 -> 7.3 ms) was this miscompile being fast by
    dropping work.  Sorted layouts still pay off via
    `_segment_mean_sorted` (no scatter at all)."""
    v = jnp.where(keep[:, None], values, 0.0)
    ones = keep.astype(values.dtype)[:, None]
    packed = jnp.concatenate([v, ones], axis=-1)
    # pad the update rows to 128 lanes: XLA assigns a 4-channel scatter a
    # lanes-minor layout (updates become strided single-element writes,
    # 31 ms/tick on v5e) while >=64-wide scatters keep the natural row
    # layout and run ~12 ms.  width=64 was tried in-context (round 3) to
    # halve the pad copy: the full agent graph got +11 ms of 'other'
    # (serialized lowering) and +4.7 ms of gathers — keep 128.
    width = 128
    packed = jnp.pad(packed, ((0, 0), (0, width - packed.shape[-1])))
    acc = jnp.zeros((num_segments, width), values.dtype)
    acc = acc.at[pid].add(packed)
    means = acc[:, :values.shape[-1]] / jnp.maximum(
        acc[:, values.shape[-1]:values.shape[-1] + 1], 1.0
    )
    return means.at[pid].get()


def _segment_mean_sorted(values, pid, keep, block: int = 128):
    """Per-point segment mean over SORTED pid runs — no scatter, no gather.

    TPU scatters/gathers are ISSUE-bound (~7-16 ns per update/row at agent
    shapes, flag-insensitive for gathers), so the classic segment-mean
    (scatter-add + gather-back, `_segment_mean_gather`) pays ~12.8 ms/tick
    at 16x60k.  With pid sorted, equal ids form contiguous runs, and the
    per-point segment sum decomposes into bandwidth/MXU work only:

      * within each 128-point block: tot[i] = sum_j (pid_i == pid_j) v_j —
        ONE batched (128,128)@(128,D+1) matmul per block with the equality
        mask as the left operand (0/1 exact in bf16; f32 accumulation via
        preferred_element_type, BETTER than the bf16 scatter-add it
        replaces)
      * runs spanning block boundaries: only a block's FIRST and LAST runs
        can span, so cross-block contributions are two affine recurrences
        over the M ~ N/128 block sums (carry continues while blocks are
        uniform), solved with log-depth associative scans on (M, D+1)

    Invalid points (keep=False) contribute nothing; all-invalid runs get
    mean 0 (matches the dump-slot semantics of the scatter form).
    """
    N, D = values.shape
    dt = values.dtype
    pad = (-N) % block
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
        # padding forms its own run past every real id (keeps sortedness)
        pid = jnp.pad(pid, (0, pad),
                      constant_values=jnp.iinfo(pid.dtype).max)
        keep = jnp.pad(keep, (0, pad))
    M = pid.shape[0] // block
    u = jnp.concatenate(
        [jnp.where(keep[:, None], values, 0), keep.astype(dt)[:, None]], -1
    ).reshape(M, block, D + 1)
    pb = pid.reshape(M, block)
    eq = (pb[:, :, None] == pb[:, None, :]).astype(dt)
    W = jnp.einsum("mij,mjc->mic", eq, u,
                   preferred_element_type=jnp.float32)   # (M, block, D+1)

    first, last = pb[:, 0], pb[:, -1]
    f0 = jnp.zeros((1,), bool)
    cont = jnp.concatenate([f0, first[1:] == last[:-1]])   # run enters block m
    uniform = first == last                                 # one run covers block

    def affine_scan(a, b):
        """x[m] = a[m]*x[m-1] + b[m], x[-1] = 0 -> returns x (log-depth)."""
        def comb(l, r):
            al, bl = l
            ar, br = r
            return al * ar, bl * ar[:, None] + br
        return jax.lax.associative_scan(comb, (a, b))[1]

    z1 = jnp.zeros((1, D + 1), jnp.float32)
    # left carry into block m's first run: previous block's last-run sum,
    # plus ITS left carry when the previous block is a single run
    a_l = (cont & jnp.concatenate([f0, uniform[:-1]])).astype(jnp.float32)
    b_l = jnp.where(cont[:, None], jnp.concatenate([z1, W[:-1, -1]], 0), 0.0)
    lc = affine_scan(a_l, b_l)
    # right carry into block m's last run (same recurrence, reversed)
    cont_r = jnp.concatenate([cont[1:], f0])               # run exits block m
    a_r = (cont_r & jnp.concatenate([uniform[1:], f0])).astype(jnp.float32)
    b_r = jnp.where(cont_r[:, None], jnp.concatenate([W[1:, 0], z1], 0), 0.0)
    rc = affine_scan(a_r[::-1], b_r[::-1])[::-1]

    tot = (W
           + (pb == first[:, None])[..., None] * lc[:, None, :]
           + (pb == last[:, None])[..., None] * rc[:, None, :])
    mean = tot[..., :D] / jnp.maximum(tot[..., D:], 1.0)
    return mean.astype(dt).reshape(-1, D)[:N]


def sort_points_by_pid(pid, points):
    """Sort points (B, P, D) by pillar id along P; the payload rides the
    sort as extra operands (bf16 channel pairs bit-packed into uint32).

    Why: per-row gathers/scatters are ISSUE-bound on TPU (~13-16 ns/row)
    but multi-operand sort is not — at 16x60k agent shapes a 7-operand
    sort costs 2.65 ms and buys `indices_are_sorted` on every downstream
    segment op: canvas scatter-max 13.4 -> 7.3 ms, mean scatter-add
    12.4 -> ~9, mean gather-back 5.3 -> 2.0 (round-3 device traces).
    Every consumer of the per-point features is order-independent
    (scatter-max canvas, masked-BN statistics), so sorting is exact up to
    float summation order in the cluster means.
    Returns (pid_sorted, points_sorted); invalid points (pid == dump id)
    sort to the end of each row."""
    B, P, D = points.shape
    if points.dtype == jnp.bfloat16:
        pad = (-D) % 2
        pts = jnp.pad(points, ((0, 0), (0, 0), (0, pad))) if pad else points
        packed = jax.lax.bitcast_convert_type(
            pts.reshape(B, P, (D + pad) // 2, 2), jnp.uint32
        )
        ops = (pid,) + tuple(packed[..., i] for i in range(packed.shape[-1]))
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        packed_s = jnp.stack(out[1:], axis=-1)
        pts_s = jax.lax.bitcast_convert_type(
            packed_s, jnp.bfloat16
        ).reshape(B, P, D + pad)[..., :D]
        return out[0], pts_s
    ops = (pid,) + tuple(points[..., i] for i in range(D))
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    return out[0], jnp.stack(out[1:], axis=-1)


def decorate_points(points, pid, keep, ix, iy, *, min_x, min_y,
                    pixels_per_meter, nx, ny, indices_sorted: bool = False,
                    num_segments: int = 0):
    """Append the reference's 5 decoration channels to each point
    (point_pillar.py:55-68): xyz offset from the pillar's point-cluster
    mean (3) and xy offset from the pillar cell origin (2).

    QUIRK (load-bearing for checkpoint parity): the reference's decorate
    reads the padded coords (batch, x_idx, y_idx) with CROSSED columns —
    x_centers from y_idx + min_x, y_centers from x_idx + min_y
    (point_pillar.py:57-58).  The offsets are therefore not true cell
    offsets, but the released models trained with exactly these features;
    reproduce, don't fix.

    num_segments: override the segment-space size (callers that fold a
    batch axis into pid pass B * (ny*nx+1))."""
    num_segments = num_segments or (ny * nx + 1)
    xyz = points[..., :3]
    # sorted runs: block-matmul segmented mean (no scatter/gather — see
    # _segment_mean_sorted); LAV_SEG_MEAN=scatter forces the scatter form
    use_blocked = (indices_sorted
                   and os.environ.get("LAV_SEG_MEAN", "blocked") == "blocked")
    if use_blocked:
        mean = _segment_mean_sorted(xyz, pid, keep)
    else:
        mean = _segment_mean_gather(xyz, pid, keep, num_segments,
                                    indices_sorted=indices_sorted)
    cluster = xyz - mean
    x_center = iy.astype(points.dtype) / pixels_per_meter + min_x
    y_center = ix.astype(points.dtype) / pixels_per_meter + min_y
    xp = points[..., 0] - x_center
    yp = points[..., 1] - y_center
    return jnp.concatenate(
        [points, cluster, xp[..., None], yp[..., None]], axis=-1
    )


def _fused_decoration_layer(p0, points, pid, keep, ix, iy, *, min_x: float,
                            min_y: float, pixels_per_meter: float,
                            num_segments: int):
    """First point-MLP layer with the decoration folded in ALGEBRAICALLY.

    The decoration (decorate_points) is affine in (point, per-pillar xyz
    mean, cell center), so  dec @ W  decomposes exactly:

        h = dec @ W
          = [p, xyz - mean, px - cx, py - cy] @ [Wp; Wc; wx; wy]
          = p @ (Wp + pad3(Wc) + e0 wx + e1 wy)        (one matmul)
            - (acc @ pad128(Wc)) / cnt  gathered by pid (64-wide rows)
            - cx wx - cy wy                            (rank-1 broadcasts)

    This removes every narrow lane-padded intermediate of the materialized
    path — the (N,3) cluster array, the (N,D+5) concat, the 3-wide mean
    gather — which cost ~5-7 ms/tick in layout churn at 16 egos (the
    786k-row prep fusion + transposes).  The mean scatter-add itself is
    unchanged; its gather-back becomes 64-wide embedding rows.  Values and
    gradients are identical up to summation order (the reference wraps
    decoration in no_grad; here mean/centers are pure data, and d/dWc
    through the two Wc terms sums to cluster^T g exactly).

    QUIRK preserved: cell centers read CROSSED columns — cx from iy + min_x,
    cy from ix + min_y (reference point_pillar.py:57-58).

    points (N, D) already painted; returns h (N, F), the first-layer
    pre-BN activations.
    """
    D = points.shape[-1]
    dt = points.dtype
    W = jnp.asarray(p0["w"]).astype(dt)
    Wp, Wc, wx, wy = W[:D], W[D:D + 3], W[D + 3], W[D + 4]
    A = Wp.at[:3].add(Wc).at[0].add(wx).at[1].add(wy)

    xyz = jnp.where(keep[:, None], points[:, :3], 0.0)
    ones = keep.astype(dt)[:, None]
    packed = jnp.concatenate([xyz, ones], axis=-1)
    packed = jnp.pad(packed, ((0, 0), (0, 128 - packed.shape[-1])))
    acc = jnp.zeros((num_segments, 128), dt)
    acc = acc.at[pid].add(packed)

    # per-pillar mean embedding: (sum_xyz @ Wc) / cnt == mean @ Wc.  Gather
    # the 128-wide accumulator rows FIRST and do the matmul in point space —
    # N (786k at 16 egos) is smaller than the batch-folded segment space
    # (1.64M), and the (S, F) embedding never materializes.
    rows = acc[pid]                                   # (N, 128)
    Wc_pad = jnp.zeros((128, Wc.shape[-1]), dt).at[:3].set(Wc)
    cnt = jnp.maximum(rows[:, 3:4], 1.0)
    memb = (rows @ Wc_pad) / cnt                      # (N, F)

    cx = iy.astype(dt) / pixels_per_meter + min_x
    cy = ix.astype(dt) / pixels_per_meter + min_y
    h = points @ A - memb - cx[:, None] * wx - cy[:, None] * wy
    if "b" in p0:
        h = h + p0["b"].astype(dt)
    return h


def point_pillar_init(key, num_input: int, num_features: Sequence[int]):
    ks = jax.random.split(key, len(num_features))
    p = {}
    cin = num_input
    for i, c in enumerate(num_features):
        p[f"linear_{i}"] = L.linear_init(ks[i], cin, c)
        p[f"bn_{i}"] = L.batchnorm_init(c)
        cin = c
    return p


def point_pillar_apply(
    p,
    points,
    valid,
    *,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    pixels_per_meter: float,
    num_features: Sequence[int],
    train: bool = False,
    use_pallas: bool = False,
):
    """points: (B, P, D); valid: (B, P) bool.
    Returns (canvas (B, ny, nx, C), bn_state).

    use_pallas: route the pillar max-pool through the VMEM-resident Pallas
    kernel (inference-only; ~8x faster than XLA scatter on v5e for the v2
    agent's 49k-point sweeps)."""
    nx = int((max_x - min_x) * pixels_per_meter)
    ny = int((max_y - min_y) * pixels_per_meter)
    num_segments = ny * nx + 1

    geo = dict(min_x=min_x, max_x=max_x, min_y=min_y, max_y=max_y,
               pixels_per_meter=pixels_per_meter, nx=nx, ny=ny)
    pid, keep, ix, iy = compute_pillar_ids(points, valid, **geo)

    # SCATTER STRATEGY (all measured on v5e, 16 egos):
    #  * vmap-of-vmap scatters: CATASTROPHIC — XLA expands doubly-batched
    #    scatters into serialized while loops (~36 ms for a 4-channel add
    #    that costs ~0.05 ms singly-batched).  The agent step vmaps over
    #    egos around this function's batch axis, so the batch MUST be
    #    folded into the segment space (offset pillar ids, one flat
    #    scatter) rather than vmapped.
    #  * inference sorts the points by pillar id FIRST (payload rides the
    #    sort as bit-packed operands, see sort_points_by_pid): round-2's
    #    "sorting is slower" verdict only condemned argsort + row gathers;
    #    the multi-operand sort costs 2.65 ms and turns the cluster-mean
    #    scatter+gather into _segment_mean_sorted's block matmuls.
    #    (Round 3 also flagged the segment ops indices_are_sorted — that
    #    "fast path" is a TPU MISCOMPILE at 128-wide update rows under
    #    vmap: it drops most updates.  Never pass the flag to wide
    #    scatters; see _segment_mean_gather's docstring.)
    #    Training keeps the unsorted form (sort backward = a permutation
    #    gather; inference-only win).
    sorted_pts = not train and not use_pallas
    if sorted_pts:
        pid, points = sort_points_by_pid(pid, points)
        keep = pid < ny * nx
        # ix/iy (decoration cell centers) recomputed from the sorted
        # coords — same floor/clip formulas, values identical per point
        _, _, ix, iy = compute_pillar_ids(points, keep, **geo)
    Bq = points.shape[0]
    offs = (jnp.arange(Bq, dtype=pid.dtype) * num_segments)[:, None]
    pid_flat = (pid + offs).reshape(-1)

    state = {}
    if FUSED_DECORATION:
        # decoration folded into the first linear layer (identical values
        # and gradients; see _fused_decoration_layer)
        h = _fused_decoration_layer(
            p["linear_0"], points.reshape(-1, points.shape[-1]), pid_flat,
            keep.reshape(-1), ix.reshape(-1), iy.reshape(-1),
            min_x=min_x, min_y=min_y, pixels_per_meter=pixels_per_meter,
            num_segments=Bq * num_segments,
        )
        feat = h.reshape(Bq, points.shape[1], -1)
        feat, state["bn_0"] = L.batchnorm(p["bn_0"], feat, train, mask=keep)
        feat = jax.nn.relu(feat)
        start = 1
    else:
        # decoration is constant w.r.t. params (reference wraps it in
        # no_grad)
        # pid_flat = pid + b*(G+1) stays GLOBALLY sorted when each row is
        # (row b's max id G+b*(G+1) < row b+1's min id), so the mean
        # scatter/gather take the sorted path for any Bq
        dec = decorate_points(
            points.reshape(-1, points.shape[-1]), pid_flat, keep.reshape(-1),
            ix.reshape(-1), iy.reshape(-1),
            min_x=min_x, min_y=min_y, pixels_per_meter=pixels_per_meter,
            nx=nx, ny=ny, num_segments=Bq * num_segments,
            indices_sorted=sorted_pts,
        ).reshape(Bq, points.shape[1], -1)
        feat = jax.lax.stop_gradient(dec)
        start = 0

    # per-point MLP with batch-wide masked BN (reference flattens the whole
    # batch into one point list before BN1d, point_pillar.py:109-114)
    pad_last = (PAD_CANVAS_LANES and not train and not use_pallas
                and num_features[-1] < 128)
    for i in range(start, len(num_features)):
        pl_, pb = p[f"linear_{i}"], p[f"bn_{i}"]
        if pad_last and i == len(num_features) - 1:
            # emit the LAST layer 128 lanes wide by zero-padding its
            # output channels in the WEIGHTS (free on the MXU — the tile
            # is 128 lanes anyway) instead of jnp.pad-ing the (B, P, 64)
            # activations afterwards (a 245 MB pass at 16x60k).  The
            # extra lanes are exactly 0 through linear (zero w/b), BN
            # (zero scale/bias; var padded with 1 so rsqrt stays finite)
            # and ReLU — identical to padding the activations.
            padn = 128 - num_features[-1]
            pl_ = {"w": jnp.pad(pl_["w"], ((0, 0), (0, padn))),
                   "b": jnp.pad(pl_["b"], ((0, padn),))}
            pb = {"scale": jnp.pad(pb["scale"], (0, padn)),
                  "bias": jnp.pad(pb["bias"], (0, padn)),
                  "mean": jnp.pad(pb["mean"], (0, padn)),
                  "var": jnp.pad(pb["var"], (0, padn), constant_values=1.0)}
        feat = L.linear(pl_, feat)
        feat, st_bn = L.batchnorm(pb, feat, train, mask=keep)
        if pad_last and i == len(num_features) - 1:
            # state keeps the UNPADDED running stats (train=False here, so
            # they are just the stored ones)
            st_bn = {"mean": p[f"bn_{i}"]["mean"], "var": p[f"bn_{i}"]["var"]}
        state[f"bn_{i}"] = st_bn
        feat = jax.nn.relu(feat)

    if not train and not use_pallas:
        # INFERENCE fast path: the point MLP ends in ReLU, so features are
        # >= 0 and a ZERO-initialized scatter-max is exactly the reference
        # zero-canvas semantics (empty pillar == all-zero-feature pillar) —
        # without the -1e30 fill pass or the where-rewrite pass over the
        # 210 MB canvas (~5 ms/tick at 16 egos).
        C = feat.shape[-1]
        if PAD_CANVAS_LANES and C < 128:
            # fallback activation pad (only reachable when the MLP loop
            # didn't run its last layer here, e.g. FUSED_DECORATION with a
            # single layer — the weight-padded path above already emits
            # 128 lanes otherwise)
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, 128 - C)))
            C = 128
        # NO dump slot: the canvas is exactly (G, C) per item and invalid
        # points keep pid == G, which is OUT OF BOUNDS — XLA scatter
        # semantics drop OOB updates natively (mode='drop'), so there is
        # no dump row, no [:ny*nx] slice afterwards (which vmap over egos
        # turned into a strided multi-MB copy), and no -1e30 fill pass
        # over the padded features (dropped rows never land)
        G = ny * nx
        pidv = (pid + jnp.arange(Bq, dtype=pid.dtype)[:, None] * G).reshape(-1)
        pidv = jnp.where(keep.reshape(-1), pidv, Bq * G)
        canvas = jnp.zeros((Bq * G, C), feat.dtype)
        # indices_are_sorted here is SAFE *because this is mode="drop"*:
        # the TPU emitter miscompiles vmapped 128-wide flagged IN-BOUNDS
        # scatters (drops updates — see _segment_mean_gather's docstring),
        # but the drop-mode lowering is a different, verified-exact path
        # AND 2x faster flagged (7.3 vs 14.4 ms at 16x60k).  bench.py's
        # numerics guard re-verifies this exact form against CPU each run.
        canvas = canvas.at[pidv].max(
            feat.reshape(-1, C), mode="drop",
            indices_are_sorted=sorted_pts and Bq == 1,
        )
        return canvas.reshape(Bq, ny, nx, C), state

    neg = jnp.asarray(-1e30, feat.dtype)

    if use_pallas and not train:
        # mask padded points so they never win the kernel's max
        feat = jnp.where(keep[..., None], feat, neg)
        from lav_tpu.ops.pillar_pallas import pillar_scatter_max_pallas

        # static Python loop over the (small) batch — the agent step calls
        # this with B=1 and vmaps over egos; lax.map's closed_call around
        # pallas_call breaks the AOT compile path here
        per_item = [
            pillar_scatter_max_pallas(
                feat[b], pid[b], num_segments=num_segments
            )[: ny * nx].reshape(ny, nx, feat.shape[-1])
            for b in range(feat.shape[0])
        ]
        canvas = jnp.stack(per_item)
    else:
        # TRAIN: one flat scatter over the batch-folded segment space (see
        # the double-vmap note above).  -1e30 masking keeps the
        # empty-pillar -> 0 rewrite AND max-grad tie-breaking away from
        # the init value.  The OOB mode='drop' form was tried here
        # (round 3) to shed the dump row + slice temps: the distill step
        # REGRESSED ~25% across dtypes (the scatter-max VJP loses its
        # fast path with clamp/drop index handling) — the bs=32 HBM fit
        # comes from the scoped student-crop checkpoint instead
        # (models/planner.py), so keep the dump-slot form for training.
        feat = jnp.where(keep[..., None], feat, neg)
        C = feat.shape[-1]
        canvas = jnp.full((Bq * num_segments, C), neg, feat.dtype)
        canvas = canvas.at[pid_flat].max(feat.reshape(-1, C))
        canvas = jnp.where(canvas > neg, canvas, 0.0)
        canvas = canvas.reshape(Bq, num_segments, C)[:, : ny * nx]
        canvas = canvas.reshape(Bq, ny, nx, C)
    return canvas, state

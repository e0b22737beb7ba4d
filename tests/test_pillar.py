"""Pillar featurizer vs a direct numpy oracle (sorted fast path included)."""

import numpy as np
import jax
import jax.numpy as jnp

from lav_tpu.ops.pillar import point_pillar_init, point_pillar_apply

GEO = dict(min_x=-4.0, max_x=4.0, min_y=-4.0, max_y=4.0, pixels_per_meter=2)
NX = NY = 16


def _oracle(params, pts, valid, num_features):
    """Numpy transcription of the pillar pipeline (eval-mode BN)."""
    P, D = pts.shape
    keep = valid & (pts[:, 0] >= GEO["min_x"]) & (pts[:, 0] < GEO["max_x"]) \
        & (pts[:, 1] >= GEO["min_y"]) & (pts[:, 1] < GEO["max_y"])
    # reference convention (point_pillar.py:87-90): row = ny-1-x_idx,
    # col = y_idx — forward axis up the rows, lateral along the columns
    ix = np.clip(np.floor((pts[:, 0] - GEO["min_x"]) * 2).astype(int), 0, NY - 1)
    iy = np.clip(np.floor((pts[:, 1] - GEO["min_y"]) * 2).astype(int), 0, NX - 1)
    row, col = NY - 1 - ix, iy

    canvas = np.zeros((NY, NX, num_features[-1]), np.float32)
    for r in range(NY):
        for c in range(NX):
            sel = keep & (row == r) & (col == c)
            if not sel.any():
                continue
            group = pts[sel]
            mean = group[:, :3].mean(0)
            # crossed centers — reference decorate quirk (point_pillar.py:57)
            xc = iy[sel][:, None] / 2.0 + GEO["min_x"]
            yc = ix[sel][:, None] / 2.0 + GEO["min_y"]
            dec = np.concatenate(
                [group, group[:, :3] - mean, group[:, :1] - xc,
                 group[:, 1:2] - yc], -1)
            f = dec
            for i in range(len(num_features)):
                w = np.asarray(params[f"linear_{i}"]["w"])
                b = np.asarray(params[f"linear_{i}"]["b"])
                bn = params[f"bn_{i}"]
                f = f @ w + b
                f = (f - np.asarray(bn["mean"])) / np.sqrt(
                    np.asarray(bn["var"]) + 1e-5
                ) * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
                f = np.maximum(f, 0)
            canvas[r, c] = f.max(0)
    return canvas


def test_pillar_canvas_matches_oracle(rng):
    num_features = [8, 8]
    D = 4
    params = point_pillar_init(jax.random.key(3), D + 5, num_features)
    # randomize BN stats so eval-mode normalization is actually exercised
    for i in range(2):
        params[f"bn_{i}"]["mean"] = jnp.asarray(
            rng.normal(size=(8,)).astype(np.float32))
        params[f"bn_{i}"]["var"] = jnp.asarray(
            rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32))

    P = 200
    pts = rng.uniform(-6, 6, size=(P, D)).astype(np.float32)
    valid = rng.uniform(size=P) > 0.2

    canvas, _ = point_pillar_apply(
        params, jnp.asarray(pts)[None], jnp.asarray(valid)[None],
        num_features=num_features, train=False, **GEO,
    )
    ref = _oracle(params, pts, valid, num_features)
    # inference canvases are emitted 128 lanes wide (PAD_CANVAS_LANES);
    # the payload channels must match the oracle and the pad must be zero
    C = num_features[-1]
    np.testing.assert_allclose(np.asarray(canvas[0, :, :, :C]), ref,
                               atol=2e-4)
    assert not np.any(np.asarray(canvas[0, :, :, C:]))


def test_fused_decoration_matches_materialized(rng):
    """The algebraic fold of decorate_points into linear_0 must match the
    materialized path in values AND parameter gradients (the decoration is
    no_grad data, so d/dW is cluster^T g either way)."""
    import lav_tpu.ops.pillar as PP

    num_features = [8, 8]
    D = 9  # painted-ish width
    params = point_pillar_init(jax.random.key(5), D + 5, num_features)
    B, P = 2, 300
    pts = jnp.asarray(rng.uniform(-6, 6, size=(B, P, D)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(B, P)) > 0.3)

    def run(fused, train):
        old = PP.FUSED_DECORATION
        PP.FUSED_DECORATION = fused
        try:
            return point_pillar_apply(params, pts, valid,
                                      num_features=num_features,
                                      train=train, **GEO)
        finally:
            PP.FUSED_DECORATION = old

    for train in (False, True):
        a, _ = run(False, train)
        b, _ = run(True, train)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)

    def loss(p, fused):
        old = PP.FUSED_DECORATION
        PP.FUSED_DECORATION = fused
        try:
            canvas, _ = point_pillar_apply(p, pts, valid,
                                           num_features=num_features,
                                           train=True, **GEO)
        finally:
            PP.FUSED_DECORATION = old
        return jnp.sum(canvas ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-3, rtol=1e-3),
        g0, g1,
    )


def test_sort_points_by_pid_pairing(rng):
    """The payload must ride the sort EXACTLY (bf16 pair-bitcast path and
    f32 multi-operand path), keeping each point's channels attached to
    its pillar id — the sorted inference pipeline depends on it."""
    from lav_tpu.ops.pillar import sort_points_by_pid

    B, P = 3, 257
    for D, dtype in ((11, jnp.bfloat16), (12, jnp.bfloat16), (7, jnp.float32)):
        pts = jnp.asarray(
            np.random.default_rng(D).normal(size=(B, P, D)), dtype
        )
        pid = jnp.asarray(
            np.random.default_rng(D + 1).integers(0, 50, (B, P)), jnp.int32
        )
        pid_s, pts_s = sort_points_by_pid(pid, pts)
        pid_n, pts_n = np.asarray(pid_s), np.asarray(pts_s)
        assert pts_s.dtype == dtype and pts_s.shape == (B, P, D)
        for b in range(B):
            assert (np.diff(pid_n[b]) >= 0).all(), "pids not sorted"
            # same multiset of (pid, payload) rows, bit-exact
            pts_f = np.asarray(pts).astype(np.float64)
            orig = sorted(map(tuple, np.concatenate(
                [np.asarray(pid)[b][:, None].astype(np.float64), pts_f[b]],
                axis=1).tolist()))
            got = sorted(map(tuple, np.concatenate(
                [pid_n[b][:, None].astype(np.float64),
                 pts_n[b].astype(np.float64)], axis=1).tolist()))
            assert orig == got


def test_segment_mean_sorted_matches_scatter(rng):
    """The block-matmul segmented mean (sorted fast path, no scatter/gather)
    must match the scatter-add + gather-back form, including runs spanning
    many 128-point blocks, all-invalid runs, and non-multiple-of-128 N."""
    from lav_tpu.ops.pillar import (
        _segment_mean_gather, _segment_mean_sorted,
    )

    for N, S in ((1000, 7), (128 * 5, 2), (131, 131), (700, 1)):
        pid = np.sort(rng.integers(0, S, size=N)).astype(np.int32)
        vals = rng.normal(size=(N, 3)).astype(np.float32)
        keep = rng.uniform(size=N) > 0.3
        a = _segment_mean_gather(jnp.asarray(vals), jnp.asarray(pid),
                                 jnp.asarray(keep), S, indices_sorted=True)
        b = _segment_mean_sorted(jnp.asarray(vals), jnp.asarray(pid),
                                 jnp.asarray(keep))
        # gather form returns means[pid]; both are per-point segment means
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

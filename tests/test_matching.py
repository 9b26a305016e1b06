"""Unit tests for the matching tail: Sinkhorn, superpoint matching, LGR."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3et_tpu.core import se3
from se3et_tpu.nn import matching as M


def test_sinkhorn_doubly_stochastic():
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.normal(size=(2, 8, 10)).astype(np.float32))
    ot = M.LearnableLogOptimalTransport(num_iterations=100)
    params = ot.init(jax.random.PRNGKey(0), scores)
    out = ot.apply(params, scores)  # (2, 9, 11) log probs
    p = np.exp(np.asarray(out))
    # SuperGlue OT marginals: each real row/col carries unit mass, the dustbin
    # row/col absorbs the opposite side's total
    rowsums = p.sum(axis=2)
    colsums = p.sum(axis=1)
    np.testing.assert_allclose(rowsums[:, :8], 1.0, rtol=1e-3)
    np.testing.assert_allclose(colsums[:, :10], 1.0, rtol=1e-3)
    np.testing.assert_allclose(rowsums[:, 8], 10.0, rtol=1e-3)
    np.testing.assert_allclose(colsums[:, 10], 8.0, rtol=1e-3)
    np.testing.assert_allclose(p.sum(axis=(1, 2)), 18.0, rtol=1e-3)


def test_sinkhorn_masked():
    rng = np.random.RandomState(1)
    scores = jnp.asarray(rng.normal(size=(1, 6, 6)).astype(np.float32))
    row_masks = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], bool))
    col_masks = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0]], bool))
    ot = M.LearnableLogOptimalTransport(num_iterations=100)
    params = ot.init(jax.random.PRNGKey(0), scores, row_masks, col_masks)
    out = np.exp(np.asarray(ot.apply(params, scores, row_masks, col_masks)))
    # masked rows/cols carry ~zero mass
    assert out[0, 4:6, :].sum() < 1e-6
    assert out[0, :, 3:6].sum() < 1e-6 + out[0, :, 6].sum()


def test_superpoint_matching_identity():
    rng = np.random.RandomState(2)
    feats = rng.normal(size=(20, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    masks = np.ones(20, bool)
    ref_idx, src_idx, scores, valid = M.superpoint_matching(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(masks),
        jnp.asarray(masks), num_correspondences=20,
    )
    ref_idx, src_idx = np.asarray(ref_idx), np.asarray(src_idx)
    # identical features: top matches should be the diagonal
    diag = ref_idx == src_idx
    assert diag.mean() > 0.9


def test_superpoint_matching_respects_masks():
    rng = np.random.RandomState(3)
    feats = rng.normal(size=(10, 8)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    masks = np.ones(10, bool)
    masks[7:] = False
    ref_idx, src_idx, scores, valid = M.superpoint_matching(
        jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(masks),
        jnp.asarray(masks), num_correspondences=16,
    )
    sel = np.asarray(valid)
    assert np.asarray(ref_idx)[sel].max() < 7
    assert np.asarray(src_idx)[sel].max() < 7


def test_node_correspondences_overlap():
    # two identical patch grids => full overlap on the diagonal
    rng = np.random.RandomState(4)
    nodes = rng.uniform(-1, 1, size=(6, 3)).astype(np.float32)
    knn = nodes[:, None, :] + rng.uniform(-0.05, 0.05, size=(6, 8, 3)).astype(
        np.float32
    )
    masks = np.ones(6, bool)
    knn_masks = np.ones((6, 8), bool)
    overlap = M.node_correspondences(
        jnp.asarray(nodes), jnp.asarray(nodes), jnp.asarray(knn), jnp.asarray(knn),
        jnp.eye(4), 0.1, jnp.asarray(masks), jnp.asarray(masks),
        jnp.asarray(knn_masks), jnp.asarray(knn_masks), num_candidates=4,
    )
    overlap = np.asarray(overlap)
    np.testing.assert_allclose(np.diag(overlap), 1.0, atol=1e-5)


def test_lgr_recovers_transform():
    rng = np.random.RandomState(5)
    p, k = 12, 16
    src_knn = rng.uniform(-1, 1, size=(p, k, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    rot = np.asarray(se3.rodrigues_rotation(jnp.asarray(axis), jnp.asarray(0.7)))
    t = rng.normal(size=3).astype(np.float32) * 0.3
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = rot
    tf[:3, 3] = t
    ref_knn = (src_knn @ rot.T + t).astype(np.float32)
    masks = np.ones((p, k), bool)
    # perfect diagonal matching scores
    eye = np.full((p, k + 1, k + 1), -8.0, np.float32)
    for i in range(k):
        eye[:, i, i] = 0.0
    out = M.local_global_registration(
        jnp.asarray(ref_knn), jnp.asarray(src_knn), jnp.asarray(masks),
        jnp.asarray(masks), jnp.asarray(eye), k=3, acceptance_radius=0.1,
        correspondence_limit=64,
    )
    rre, rte = se3.isotropic_transform_error(
        jnp.asarray(tf), out["estimated_transform"]
    )
    assert float(rre) < 0.1 and float(rte) < 1e-3


def test_pallas_sinkhorn_matches_scan():
    """Fused Pallas Sinkhorn (interpret mode on CPU) == lax.scan reference."""
    from se3et_tpu.ops.pallas.sinkhorn import sinkhorn_pallas

    rng = np.random.RandomState(7)
    b, m, n = 8, 17, 17
    padded = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
    log_mu = jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
    log_nu = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    # emulate masked rows/cols CONSISTENTLY, as LearnableLogOptimalTransport
    # constructs them: masked scores AND masked marginals (the kernel's
    # fixed-shift formulation requires this invariant — see sinkhorn_pallas)
    padded = padded.at[:, -3:, :].set(-1e12)
    log_mu = log_mu.at[:, -3:].set(-1e12)
    padded = padded.at[:, :, -2:].set(-1e12)
    log_nu = log_nu.at[:, -2:].set(-1e12)

    def scan_ref(padded, log_mu, log_nu, iters=50):
        def body(carry, _):
            u, v = carry
            u = log_mu - jax.nn.logsumexp(padded + v[:, None, :], axis=2)
            v = log_nu - jax.nn.logsumexp(padded + u[:, :, None], axis=1)
            return (u, v), None
        (u, v), _ = jax.lax.scan(
            body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None, length=iters)
        return padded + u[:, :, None] + v[:, None, :]

    want = np.asarray(scan_ref(padded, log_mu, log_nu))
    got = np.asarray(sinkhorn_pallas(
        padded, log_mu, log_nu, num_iterations=50, tile=4, interpret=True))
    finite = want > -1e11
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4, atol=1e-4)


def test_point_matching_head():
    rng = np.random.RandomState(8)
    p, k = 6, 12
    ref_knn = jnp.asarray(rng.uniform(-1, 1, (p, k, 3)).astype(np.float32))
    src_knn = ref_knn + 0.001
    masks = jnp.asarray(np.ones((p, k), bool))
    eye = np.full((p, k + 1, k + 1), -8.0, np.float32)
    for i in range(k):
        eye[:, i, i] = 0.0
    out = M.point_matching(
        ref_knn, src_knn, masks, masks, jnp.asarray(eye), k=2,
        correspondence_limit=128,
    )
    valid = np.asarray(out["corr_valid"])
    rc = np.asarray(out["ref_corr_points"])[valid]
    sc = np.asarray(out["src_corr_points"])[valid]
    assert valid.sum() == p * k  # diagonal matches all extracted
    np.testing.assert_allclose(rc, sc - 0.001, atol=1e-5)


def test_global_topk_matches_lax():
    from se3et_tpu.ops.topk import global_topk

    rng = np.random.RandomState(9)
    for n, k in ((1000, 64), (4096, 256), (50, 50), (30, 40)):
        flat = jnp.asarray(rng.randn(n).astype(np.float32))
        want_v, _ = jax.lax.top_k(flat, min(k, n))
        got_v, got_i = global_topk(flat, k)
        # same value multiset (order differs by design: index order)
        np.testing.assert_allclose(
            np.sort(np.asarray(got_v))[::-1][: min(k, n)],
            np.asarray(want_v), rtol=1e-6, atol=1e-6,
        )
        # indices consistent with values
        np.testing.assert_allclose(
            np.asarray(flat)[np.asarray(got_i)[: min(k, n)]],
            np.asarray(got_v)[: min(k, n)], rtol=0, atol=0,
        )

    # ties at the k-th value: all strictly-greater included
    flat = jnp.asarray(np.concatenate([np.zeros(900), np.ones(10)]).astype(np.float32))
    got_v, got_i = global_topk(flat, 64)
    assert np.sum(np.asarray(got_v) == 1.0) == 10
    assert np.asarray(got_v).shape == (64,)


def test_global_topk_inf_masked():
    """-inf-masked inputs (Gumbel target sampling) must still select by value.

    Regression: lo0 previously clamped -inf to -3e38, leaving the final
    bisection band ~3e29 wide — every finite entry fell in the tie band and
    selection became lowest-index-first (only ~10/128 overlap with the true
    top-k on a masked-Gumbel input).
    """
    from se3et_tpu.ops.topk import global_topk

    rng = np.random.RandomState(3)
    n, k = 4096, 128
    vals = rng.gumbel(size=n).astype(np.float32)
    mask = rng.rand(n) < 0.25  # ~1024 eligible
    flat = jnp.asarray(np.where(mask, vals, -np.inf))
    want_v, want_i = jax.lax.top_k(flat, k)
    got_v, got_i = global_topk(flat, k)
    assert set(np.asarray(got_i).tolist()) == set(np.asarray(want_i).tolist())
    np.testing.assert_allclose(
        np.sort(np.asarray(got_v))[::-1], np.asarray(want_v), rtol=1e-6
    )

    # fewer eligible entries than k: unfilled slots are -inf
    flat2 = jnp.asarray(np.where(np.arange(n) < 40, vals, -np.inf))
    got_v2, got_i2 = global_topk(flat2, k)
    assert np.isfinite(np.asarray(got_v2)).sum() == 40
    assert set(np.asarray(got_i2)[:40].tolist()) == set(range(40))

    # tiny-magnitude distributions (post dual-normalization scores ~1e-6):
    # selection stays exact by value, not index
    tiny = jnp.asarray((rng.rand(2048).astype(np.float32)) * 1e-6)
    want_vt, want_it = jax.lax.top_k(tiny, 64)
    got_vt, got_it = global_topk(tiny, 64)
    assert set(np.asarray(got_it).tolist()) == set(np.asarray(want_it).tolist())


@pytest.mark.slow
def test_node_correspondences_shortlist_covers_kitti_geometry():
    """VERDICT r2 #9: the gt_candidates=48 nearest-node shortlist is argued
    exact because patch diameters are a few voxels; measure that claim at
    5-stage KITTI densities (voxel 0.3, radius x10 family, coarse cap 1000,
    patch_k 128) instead of inheriting it.  For every ref node, every src
    node with nonzero patch overlap must rank inside the shortlist."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.pipeline import build_pair_pyramid
    from se3et_tpu.experiments import make_cfg

    cfg = make_cfg("se3eti.kitti")
    mc = cfg.model
    assert cfg.pipeline.patch_k == mc.num_points_in_patch
    worst_rank = -1
    for seed in (5, 17):
        item = SyntheticPairDataset(
            num_pairs=1, num_points=cfg.data.point_limit, extent=20.0,
            seed=seed,
        )[0]
        data = build_pair_pyramid(
            item["ref_points"], item["src_points"], item["transform"],
            cfg.pipeline,
        )
        coarse = cfg.pipeline.num_stages - 1
        nodes = np.asarray(data[f"points_{coarse}"])
        node_masks = np.asarray(data["patch_node_masks"])
        knn_idx = np.asarray(data["node_knn_indices"])
        knn_masks = np.asarray(data["node_knn_masks"])
        fine = np.asarray(data["points_1"])
        tf = np.asarray(item["transform"])
        r = mc.ground_truth_matching_radius

        # aligned src geometry (sentinel index = Nf -> pad row, masked out)
        pad = np.zeros((1, 3), np.float32)
        ref_knn = np.concatenate([fine[0], pad])[knn_idx[0]]
        src_pts = fine[1] @ tf[:3, :3].T + tf[:3, 3]
        src_knn = np.concatenate([src_pts, pad])[knn_idx[1]]
        src_nodes = nodes[1] @ tf[:3, :3].T + tf[:3, 3]

        ref_valid = np.where(node_masks[0])[0]
        src_valid = node_masks[1]
        d_nodes = np.linalg.norm(
            nodes[0][:, None] - src_nodes[None, :], axis=-1
        )
        d_nodes[:, ~src_valid] = np.inf
        ref_rad = np.where(knn_masks[0],
                           np.linalg.norm(ref_knn - nodes[0][:, None], axis=-1),
                           0.0).max(1)
        src_rad = np.where(knn_masks[1],
                           np.linalg.norm(src_knn - src_nodes[:, None], axis=-1),
                           0.0).max(1)

        for i in ref_valid:
            cand = np.where(
                src_valid & (d_nodes[i] < ref_rad[i] + src_rad + r)
            )[0]
            if len(cand) == 0:
                continue
            d2 = np.sum(
                (ref_knn[i][None, :, None, :] - src_knn[cand][:, None, :, :])
                ** 2, axis=-1,
            )  # (C, K, K)
            pm = knn_masks[0][i][None, :, None] & knn_masks[1][cand][:, None, :]
            overlapping = cand[np.any((d2 < r * r) & pm, axis=(1, 2))]
            if len(overlapping) == 0:
                continue
            order = np.argsort(d_nodes[i])
            ranks = np.searchsorted(
                d_nodes[i][order], d_nodes[i][overlapping], side="left"
            )
            worst_rank = max(worst_rank, int(ranks.max()))
    # measured bound: every overlapping pair sits well inside the shortlist
    assert worst_rank >= 0, "generator produced no overlapping patches"
    assert worst_rank < mc.gt_candidates, (
        f"shortlist miss: overlapping src node at distance rank {worst_rank} "
        f">= gt_candidates={mc.gt_candidates}"
    )


def test_pallas_sinkhorn_tile_autofit_kitti_shape():
    """KITTI patch budget (129 x 129 blocks) must auto-halve the batch tile:
    tile=32 measured 17.0M scoped VMEM against the 16M chip limit (round 4).
    Interpret mode checks the halved-tile path stays value-correct."""
    from se3et_tpu.ops.pallas.sinkhorn import sinkhorn_pallas

    rng = np.random.RandomState(3)
    b, m, n = 8, 129, 129
    padded = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
    log_mu = jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
    log_nu = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

    def scan_ref(padded, log_mu, log_nu, iters=20):
        def body(carry, _):
            u, v = carry
            u = log_mu - jax.nn.logsumexp(padded + v[:, None, :], axis=2)
            v = log_nu - jax.nn.logsumexp(padded + u[:, :, None], axis=1)
            return (u, v), None
        (u, v), _ = jax.lax.scan(
            body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)), None,
            length=iters)
        return padded + u[:, :, None] + v[:, None, :]

    want = np.asarray(scan_ref(padded, log_mu, log_nu))
    # tile=32 exceeds the padded-footprint budget at this shape; the fit
    # loop must drop it (to <= 16) and still cover the whole batch
    got = np.asarray(sinkhorn_pallas(
        padded, log_mu, log_nu, num_iterations=20, tile=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sinkhorn_fused_batch_split_matches_scan(monkeypatch):
    """Oversized outputs (KITTI: (256, 129, 129) f32 = 17 MB > the 16 MB
    scoped-VMEM staging limit) are split across TWO pallas calls inside
    _sinkhorn_fused_grad — values must match the scan formulation exactly
    and the split must actually engage (round-5: lets KITTI serving stay on
    the default, measured-faster placement instead of the raised limit)."""
    from se3et_tpu.nn import matching

    calls = []
    from se3et_tpu.ops.pallas import sinkhorn as sink_mod

    real = sink_mod.sinkhorn_pallas

    def spy(padded, log_mu, log_nu, **kw):
        calls.append(padded.shape)
        kw["interpret"] = True
        return real(padded, log_mu, log_nu, **kw)

    monkeypatch.setattr(sink_mod, "sinkhorn_pallas", spy)
    monkeypatch.setattr(matching, "_fused_available", lambda: True)

    rng = np.random.RandomState(5)
    # small n keeps the interpret run fast; batch/out size forced over the
    # split threshold by monkeypatching it down
    b, m, n = 8, 33, 33
    monkeypatch.setattr(matching, "_SINKHORN_SPLIT_BYTES", 4 * b * m * n - 1,
                        raising=False)
    padded = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
    log_mu = jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
    log_nu = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

    got = np.asarray(
        matching._sinkhorn_fused_grad(padded, log_mu, log_nu, 15)
    )
    assert calls == [(4, m, n), (4, m, n)], calls  # split engaged
    want = np.asarray(matching._sinkhorn_scan(padded, log_mu, log_nu, 15))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

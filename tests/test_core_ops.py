"""Tests for SE(3) utilities, fixed-shape geometry ops, and the host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3et_tpu.core import se3
from se3et_tpu.ops import geometry
from se3et_tpu.data import host_ops, pipeline


def _random_transform(rng):
    axis = rng.normal(size=3)
    angle = rng.uniform(0, 2 * np.pi)
    r = np.asarray(se3.rodrigues_rotation(jnp.asarray(axis), jnp.asarray(angle)))
    t = rng.normal(size=3) * 0.5
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = r
    tf[:3, 3] = t
    return tf


def test_apply_and_inverse_transform():
    rng = np.random.RandomState(0)
    tf = _random_transform(rng)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    moved = se3.apply_transform(jnp.asarray(pts), jnp.asarray(tf))
    back = se3.apply_transform(moved, se3.inverse_transform(jnp.asarray(tf)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)


def test_procrustes_recovers_transform():
    rng = np.random.RandomState(1)
    tf = _random_transform(rng)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    ref = np.asarray(se3.apply_transform(jnp.asarray(src), jnp.asarray(tf)))
    est = se3.weighted_procrustes(jnp.asarray(src), jnp.asarray(ref))
    rre, rte = se3.isotropic_transform_error(jnp.asarray(tf), est)
    assert float(rre) < 1e-2 and float(rte) < 1e-4


def test_procrustes_weighted_ignores_outliers():
    rng = np.random.RandomState(2)
    tf = _random_transform(rng)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    ref = np.array(se3.apply_transform(jnp.asarray(src), jnp.asarray(tf)))
    ref[80:] += rng.normal(size=(20, 3)) * 5  # corrupt
    w = np.ones(100, np.float32)
    w[80:] = 0.0
    est = se3.weighted_procrustes(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w))
    rre, rte = se3.isotropic_transform_error(jnp.asarray(tf), est)
    assert float(rre) < 1e-2 and float(rte) < 1e-3


def test_procrustes_batched():
    rng = np.random.RandomState(3)
    tfs = np.stack([_random_transform(rng) for _ in range(4)])
    src = rng.normal(size=(4, 30, 3)).astype(np.float32)
    ref = np.asarray(se3.apply_transform(jnp.asarray(src), jnp.asarray(tfs)))
    est = se3.weighted_procrustes(jnp.asarray(src), jnp.asarray(ref))
    rre, rte = se3.isotropic_transform_error(jnp.asarray(tfs), est)
    # fp32 3x3 SVD + arccos-near-1 noise floor is ~0.05 degrees
    assert np.max(np.asarray(rre)) < 0.1


def test_gather_with_sentinel():
    vals = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([[0, 3, 4], [2, 1, 0]])  # 3 and 4 out of range (N=4? no: N=4 rows)
    out = geometry.gather_with_sentinel(vals, idx)
    np.testing.assert_allclose(out[0, 1], vals[3])
    np.testing.assert_allclose(out[0, 2], jnp.zeros(3))  # sentinel 4 -> pad


def test_point_to_node_partition_matches_bruteforce():
    rng = np.random.RandomState(4)
    pts = rng.uniform(size=(60, 3)).astype(np.float32)
    nodes = rng.uniform(size=(8, 3)).astype(np.float32)
    p2n, node_masks, knn_idx, knn_masks = geometry.point_to_node_partition(
        jnp.asarray(pts), jnp.asarray(nodes), point_limit=16
    )
    p2n = np.asarray(p2n)
    d = np.linalg.norm(pts[:, None] - nodes[None], axis=-1)
    np.testing.assert_array_equal(p2n, d.argmin(axis=1))
    knn_idx, knn_masks = np.asarray(knn_idx), np.asarray(knn_masks)
    for m in range(8):
        members = set(np.nonzero(p2n == m)[0].tolist())
        got = set(knn_idx[m][knn_masks[m]].tolist())
        assert got.issubset(members)
        assert len(got) == min(len(members), 16)
    # sentinel fill
    assert np.all(knn_idx[~knn_masks] == 60)


def test_point_to_node_partition_respects_masks():
    rng = np.random.RandomState(5)
    pts = rng.uniform(size=(40, 3)).astype(np.float32)
    nodes = rng.uniform(size=(6, 3)).astype(np.float32)
    pmask = np.ones(40, bool)
    pmask[30:] = False
    nmask = np.ones(6, bool)
    nmask[5:] = False
    _, node_masks, knn_idx, knn_masks = geometry.point_to_node_partition(
        jnp.asarray(pts), jnp.asarray(nodes), 16, jnp.asarray(pmask), jnp.asarray(nmask)
    )
    assert not bool(np.asarray(node_masks)[5])
    # padded points never appear in any patch
    got = np.asarray(knn_idx)[np.asarray(knn_masks)]
    assert got.max(initial=0) < 30


def test_grid_subsample_closest_to_centroid():
    # two voxels; the kept point must be the one nearest the voxel centroid
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [0.22, 0.1, 0.1], [1.1, 0.1, 0.1]],
        dtype=np.float32,
    )
    sub, _ = host_ops.grid_subsample_single(pts, voxel_size=1.0)
    assert sub.shape == (2, 3)
    # centroid of voxel 0 is x~0.2067 -> closest is 0.22
    assert np.any(np.all(np.isclose(sub, pts[2]), axis=1))
    assert np.any(np.all(np.isclose(sub, pts[3]), axis=1))


def test_radius_search_sorted_and_padded():
    s = np.array([[0.0, 0, 0], [0.5, 0, 0], [2.0, 0, 0]], dtype=np.float32)
    q = np.array([[0.0, 0, 0]], dtype=np.float32)
    idx = host_ops.radius_search_single(q, s, radius=1.0, limit=4)
    assert idx.shape == (1, 4)
    assert idx[0, 0] == 0 and idx[0, 1] == 1  # distance-sorted
    assert idx[0, 2] == 3 and idx[0, 3] == 3  # sentinel = len(s)


def test_normal_estimation_plane():
    rng = np.random.RandomState(6)
    xy = rng.uniform(-1, 1, size=(200, 2))
    pts = np.concatenate([xy, np.zeros((200, 1))], axis=1).astype(np.float32)
    normals = host_ops.estimate_normals(pts)
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)


def _toy_cfg(**kw):
    defaults = dict(
        num_stages=3,
        voxel_size=0.1,
        search_radius=0.25,
        neighbor_limits=(16, 16, 16),
        stage_caps=(512, 256, 128),
        coarse_point_cap=100,
    )
    defaults.update(kw)
    return pipeline.PyramidConfig(**defaults)


def test_pair_pyramid_shapes_and_masks():
    rng = np.random.RandomState(7)
    ref = rng.uniform(size=(400, 3)).astype(np.float32)
    src = rng.uniform(size=(350, 3)).astype(np.float32)
    cfg = _toy_cfg()
    out = pipeline.build_pair_pyramid(ref, src, np.eye(4, dtype=np.float32), cfg)
    for s, cap in enumerate(cfg.stage_caps):
        assert out[f"points_{s}"].shape == (2, cap, 3)
        assert out[f"masks_{s}"].shape == (2, cap)
        assert out[f"neighbors_{s}"].shape == (2, cap, cfg.neighbor_limits[s])
        # neighbor indices in range or sentinel
        nb = out[f"neighbors_{s}"]
        assert nb.max() <= cap
        # padded rows have all-sentinel neighbors
        masks = out[f"masks_{s}"]
        assert np.all(nb[~masks] == cap)
    assert out["features"].shape == (2, cfg.stage_caps[0], 1)
    # stage counts decrease
    n0 = out["masks_0"].sum(axis=1)
    n2 = out["masks_2"].sum(axis=1)
    assert np.all(n2 < n0)


def test_pyramid_neighbor_semantics():
    rng = np.random.RandomState(8)
    ref = rng.uniform(size=(300, 3)).astype(np.float32)
    src = rng.uniform(size=(300, 3)).astype(np.float32)
    cfg = _toy_cfg()
    out = pipeline.build_pair_pyramid(ref, src, np.eye(4, dtype=np.float32), cfg)
    # verify neighbors_0 for the ref cloud against brute force
    pts = out["points_0"][0]
    mask = out["masks_0"][0]
    nb = out["neighbors_0"][0]
    valid = np.nonzero(mask)[0]
    d = np.linalg.norm(pts[valid][:, None] - pts[valid][None], axis=-1)
    for i in valid[:20]:
        got = nb[i][nb[i] < cfg.stage_caps[0]]
        expect = valid[d[i] <= cfg.search_radius]
        expect = expect[np.argsort(d[i][d[i] <= cfg.search_radius], kind="stable")]
        expect = expect[: cfg.neighbor_limits[0]]
        assert set(got.tolist()) == set(expect.tolist())


def test_calibrate_neighbor_limits():
    rng = np.random.RandomState(9)
    pairs = [
        (
            rng.uniform(size=(200, 3)).astype(np.float32),
            rng.uniform(size=(200, 3)).astype(np.float32),
        )
    ]
    cfg = _toy_cfg()
    limits = pipeline.calibrate_neighbor_limits(pairs, cfg, sample_threshold=10)
    assert len(limits) == 3
    assert all(1 <= l <= 200 for l in limits)


def test_horn_matches_svd_procrustes():
    rng = np.random.RandomState(11)
    tfs = np.stack([_random_transform(rng) for _ in range(8)])
    src = rng.normal(size=(8, 50, 3)).astype(np.float32)
    ref = np.array(se3.apply_transform(jnp.asarray(src), jnp.asarray(tfs)))
    ref += rng.normal(scale=0.01, size=ref.shape).astype(np.float32)  # noise
    w = rng.uniform(0.1, 1.0, size=(8, 50)).astype(np.float32)
    est_h = se3.weighted_procrustes(
        jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w), method="horn")
    est_s = se3.weighted_procrustes(
        jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w), method="svd")
    np.testing.assert_allclose(np.asarray(est_h), np.asarray(est_s), atol=2e-4)
    # proper rotations
    r = np.asarray(est_h)[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", r, r), np.tile(np.eye(3), (8, 1, 1)), atol=1e-4
    )
    assert np.all(np.linalg.det(r) > 0.99)


def test_anisotropic_transform_error():
    rng = np.random.RandomState(12)
    tf = _random_transform(rng)
    r_mse, r_mae, t_mse, t_mae = se3.anisotropic_transform_error(
        jnp.asarray(tf), jnp.asarray(tf)
    )
    assert float(r_mae) < 1e-4 and float(t_mae) < 1e-6
    est = tf.copy()
    est[:3, 3] += np.array([0.3, 0.0, 0.0])
    _, _, t_mse2, t_mae2 = se3.anisotropic_transform_error(
        jnp.asarray(tf), jnp.asarray(est)
    )
    # relative translation error appears in the local frame; magnitude preserved
    np.testing.assert_allclose(float(t_mse2) * 3, 0.09, atol=1e-5)


def test_modified_chamfer_distance():
    rng = np.random.RandomState(13)
    tf = _random_transform(rng)
    raw = rng.uniform(-1, 1, size=(80, 3)).astype(np.float32)  # ref-frame raw cloud
    ref = raw[:50]
    src = np.array(
        se3.apply_transform(jnp.asarray(raw[20:]), se3.inverse_transform(jnp.asarray(tf)))
    )
    # perfect estimate: both chamfer terms ~0
    d = se3.modified_chamfer_distance(
        jnp.asarray(raw), jnp.asarray(ref), jnp.asarray(src),
        jnp.asarray(tf), jnp.asarray(tf),
    )
    assert float(d) < 1e-3
    # a wrong estimate must score worse
    bad = tf.copy(); bad[:3, 3] += 0.5
    d_bad = se3.modified_chamfer_distance(
        jnp.asarray(raw), jnp.asarray(ref), jnp.asarray(src),
        jnp.asarray(tf), jnp.asarray(bad),
    )
    assert float(d_bad) > float(d) + 0.1


def test_host_point_to_node_matches_device():
    """Host-side pipeline p2n precompute == the device op (exact sets)."""
    from se3et_tpu.data import host_ops

    rng = np.random.RandomState(11)
    pts = rng.uniform(size=(500, 3)).astype(np.float32)
    nodes = rng.uniform(size=(40, 3)).astype(np.float32)
    k = 24
    d_p2n, d_nm, d_ki, d_km = geometry.point_to_node_partition(
        jnp.asarray(pts), jnp.asarray(nodes), point_limit=k
    )
    h_p2n, h_nm, h_ki, h_km = host_ops.point_to_node_partition_host(
        pts, nodes, k, cell_hint=0.2
    )
    np.testing.assert_array_equal(h_p2n, np.asarray(d_p2n))
    np.testing.assert_array_equal(h_nm, np.asarray(d_nm))
    np.testing.assert_array_equal(h_km, np.asarray(d_km))
    # same PATCH SETS (tie-break order may differ at equal distances)
    for m in range(40):
        want = set(np.asarray(d_ki)[m][np.asarray(d_km)[m]].tolist())
        got = set(h_ki[m][h_km[m]].tolist())
        assert got == want, m


def test_knn_interpolate_matches_reference_semantics():
    """knn_interpolate: inverse-sq-distance weights over the first k ordered
    neighbors, sentinel-masked (kpconv/functional.py:25-52); k=1 degenerates
    to nearest_upsample."""
    import jax.numpy as jnp

    from se3et_tpu.nn.epn import knn_interpolate, nearest_upsample

    rng = np.random.RandomState(0)
    m, n, c = 6, 4, 3
    s_pts = rng.uniform(-1, 1, (1, m, 3)).astype(np.float32)
    q_pts = rng.uniform(-1, 1, (1, n, 3)).astype(np.float32)
    s_f = rng.randn(1, m, c).astype(np.float32)
    d = np.linalg.norm(q_pts[0][:, None] - s_pts[0][None], axis=-1)
    order = np.argsort(d, axis=1).astype(np.int32)
    nbr = order[:, :3][None]
    # sentinel one slot of one query
    nbr = nbr.copy()
    nbr[0, 2, 2] = m

    got = np.asarray(knn_interpolate(
        jnp.asarray(s_f), jnp.asarray(q_pts), jnp.asarray(s_pts),
        jnp.asarray(nbr), k=3,
    ))
    for i in range(n):
        idx = nbr[0, i]
        valid = idx < m
        sq = np.sum((q_pts[0, i] - s_pts[0, np.clip(idx, 0, m - 1)]) ** 2, -1)
        w = valid / (sq + 1e-8)
        w = w / (w.sum() + 1e-8)
        want = (s_f[0, np.clip(idx, 0, m - 1)] * w[:, None]).sum(0)
        np.testing.assert_allclose(got[0, i], want, atol=1e-6)

    k1 = np.asarray(knn_interpolate(
        jnp.asarray(s_f), jnp.asarray(q_pts), jnp.asarray(s_pts),
        jnp.asarray(nbr), k=1,
    ))
    nu = np.asarray(nearest_upsample(jnp.asarray(s_f), jnp.asarray(nbr)))
    np.testing.assert_allclose(k1, nu, atol=1e-6)

"""Host-side correspondence extractor family vs hand-computed cases
(reference ``modules/registration/matching.py:11-430``)."""

import numpy as np

from se3et_tpu.ops import correspondence as C


def _log(p):
    return np.log(np.maximum(p, 1e-12))


def test_extract_from_scores_max_and_mutual():
    p = np.array([
        [0.7, 0.2, 0.1],
        [0.1, 0.6, 0.3],
        [0.1, 0.5, 0.4],
    ])
    # row-max selection: (0,0), (1,1), (2,1)
    r, s = C.extract_correspondences_from_scores(_log(p))
    assert set(zip(r, s)) == {(0, 0), (1, 1), (2, 1)}
    # mutual: col-max of col1 is row 1 -> (2,1) dropped
    r, s = C.extract_correspondences_from_scores(_log(p), mutual=True)
    assert set(zip(r, s)) == {(0, 0), (1, 1)}
    # bilateral (or): adds col-maxes (0,0),(1,1),(2,2)
    r, s = C.extract_correspondences_from_scores(_log(p), bilateral=True)
    assert set(zip(r, s)) == {(0, 0), (1, 1), (2, 1), (2, 2)}
    # threshold kills scores <= 0.65
    r, s, sc = C.extract_correspondences_from_scores(
        _log(p), threshold=0.65, return_score=True
    )
    assert set(zip(r, s)) == {(0, 0)}
    np.testing.assert_allclose(sc, [0.7], atol=1e-6)


def test_extract_from_scores_dustbin():
    p = np.array([
        [0.9, 0.05, 0.05],
        [0.05, 0.05, 0.9],  # row max in dustbin column
        [0.4, 0.3, 0.3],
    ])
    r, s = C.extract_correspondences_from_scores(_log(p), has_dustbin=True)
    # dustbin row/col removed AFTER masking: (1,2) and the dustbin row's
    # (2,0) both fall outside the cropped matrix
    assert set(zip(r, s)) == {(0, 0)}


def test_extract_threshold_and_topk():
    p = np.array([[0.5, 0.3], [0.1, 0.8]])
    r, s = C.extract_correspondences_from_scores_threshold(_log(p), 0.25)
    assert set(zip(r, s)) == {(0, 0), (0, 1), (1, 1)}

    scores = np.array([[5.0, 1.0, 3.0], [2.0, 4.0, 0.0]])
    r, s, sc = C.extract_correspondences_from_scores_topk(
        scores, 3, return_score=True
    )
    assert list(zip(r, s)) == [(0, 0), (1, 1), (0, 2)]
    np.testing.assert_allclose(sc, [5.0, 4.0, 3.0])
    # dustbin: last row/col entries dropped from the top-k
    r, s = C.extract_correspondences_from_scores_topk(
        scores, 3, has_dustbin=True
    )
    assert list(zip(r, s)) == [(0, 0)]


def test_extract_from_feats_matches_nn():
    rng = np.random.RandomState(0)
    ref = rng.randn(6, 4)
    src = rng.randn(5, 4)
    r, s, d = C.extract_correspondences_from_feats(ref, src, return_feat_dist=True)
    d2 = ((ref[:, None] - src[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(s, np.argmin(d2, axis=1))
    np.testing.assert_allclose(d, d2[np.arange(6), s], atol=1e-9)
    # mutual keeps only cross-consistent pairs
    rm, sm = C.extract_correspondences_from_feats(ref, src, mutual=True)
    for i, j in zip(rm, sm):
        assert np.argmin(d2[i]) == j and np.argmin(d2[:, j]) == i


def test_dense_to_node_correspondences():
    # nodes at 0 and 10 on x; points split around them
    ref_nodes = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    src_nodes = ref_nodes.copy()
    ref_points = np.array([[0.1, 0, 0], [0.2, 0, 0], [9.9, 0, 0]])
    src_points = np.array([[0.0, 0, 0], [10.1, 0, 0], [10.2, 0, 0]])
    corr = np.array([[0, 0], [1, 0], [2, 1]])
    node_corr, counts, scores = C.dense_correspondences_to_node_correspondences(
        ref_points, src_points, ref_nodes, src_nodes, corr, return_score=True
    )
    assert node_corr.tolist() == [[0, 0], [1, 1]]
    assert counts.tolist() == [2, 1]
    # patch sizes: ref [2,1], src [1,2] -> scores [ (2/2+2/1)/2=1.5? no:
    # count/ref_size + count/src_size over 2: (2/2 + 2/1)/2 = 1.5 and
    # (1/1 + 1/2)/2 = 0.75
    np.testing.assert_allclose(scores, [1.5, 0.75])


def test_node_to_dense_roundtrip_and_ratios():
    rng = np.random.RandomState(1)
    # two patches of 4 points each, identical clouds -> all pairs within
    # radius of themselves
    pts = rng.uniform(-1, 1, (8, 3))
    knn_idx = np.array([[0, 1, 2, 3], [4, 5, 6, 7]])
    knn_pts = pts[knn_idx]
    masks = np.ones((2, 4), bool)
    node_corr = np.array([[0, 0], [1, 1]])
    corr = C.node_correspondences_to_dense_correspondences(
        knn_pts, knn_pts, knn_idx, knn_idx, node_corr, np.eye(4), 1e-3,
        masks, masks,
    )
    assert set(map(tuple, corr)) == {(i, i) for i in range(8)}

    ref_ov, src_ov = C.get_node_overlap_ratios(
        pts, pts, knn_pts, knn_pts, knn_idx, knn_idx, node_corr, np.eye(4),
        1e-3, masks, masks,
    )
    np.testing.assert_allclose(ref_ov, 1.0, atol=1e-4)
    occ_r, occ_s = C.get_node_occlusion_ratios(
        pts, pts, knn_pts, knn_pts, knn_idx, knn_idx, node_corr, np.eye(4),
        1e-3, masks, masks,
    )
    np.testing.assert_allclose(occ_r, 0.0, atol=1e-4)
    np.testing.assert_allclose(occ_s, 0.0, atol=1e-4)

r"""Host-side correspondence extraction & analysis utilities.

Parity surface for the reference's score→correspondence extractor family and
patch overlap/occlusion helpers (``geotransformer/modules/registration/
matching.py:11-168`` extractors, ``:176-229`` dense→node, ``:319-360``
node→dense, ``:363-430`` overlap/occlusion ratios).

Design note (TPU-native): these produce *variable-length* index lists
(``nonzero``/``unique`` outputs), which cannot live under ``jit``'s
static-shape contract.  The serving model uses the static-shape device
equivalents in ``se3et_tpu/nn/matching.py`` (masked top-k / LGR); this module
is the offline analysis surface — it operates on score matrices or features
already fetched to host, so plain numpy is the right tool, not a kernel.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Score-matrix extractors (reference matching.py:11-132)
# ---------------------------------------------------------------------------

def extract_correspondences_from_scores(
    score_mat: np.ndarray,
    mutual: bool = False,
    bilateral: bool = False,
    has_dustbin: bool = False,
    threshold: float = 0.0,
    return_score: bool = False,
):
    """Row-max (optionally mutual/bilateral) selection from log-probabilities.

    ``score_mat``: (N, M) or (N+1, M+1) log matching probabilities.
    Returns (ref_idx, src_idx[, scores]).  Reference ``matching.py:11-68``.
    """
    score_mat = np.exp(np.asarray(score_mat))
    n, m = score_mat.shape

    ref_max_idx = np.argmax(score_mat, axis=1)
    ref_sel = np.zeros_like(score_mat)
    ref_sel[np.arange(n), ref_max_idx] = score_mat[np.arange(n), ref_max_idx]
    ref_masks = ref_sel > threshold

    if mutual or bilateral:
        src_max_idx = np.argmax(score_mat, axis=0)
        src_sel = np.zeros_like(score_mat)
        src_sel[src_max_idx, np.arange(m)] = score_mat[src_max_idx, np.arange(m)]
        src_masks = src_sel > threshold
        masks = (ref_masks & src_masks) if mutual else (ref_masks | src_masks)
    else:
        masks = ref_masks

    if has_dustbin:
        masks = masks[:-1, :-1]
    ref_idx, src_idx = np.nonzero(masks)
    if return_score:
        return ref_idx, src_idx, score_mat[ref_idx, src_idx]
    return ref_idx, src_idx


def extract_correspondences_from_scores_threshold(
    scores_mat: np.ndarray,
    threshold: float,
    has_dustbin: bool = False,
    return_score: bool = False,
):
    """All pairs above a probability threshold (``matching.py:71-99``)."""
    scores_mat = np.exp(np.asarray(scores_mat))
    if has_dustbin:
        scores_mat = scores_mat[:-1, :-1]
    ref_idx, src_idx = np.nonzero(scores_mat > threshold)
    if return_score:
        return ref_idx, src_idx, scores_mat[ref_idx, src_idx]
    return ref_idx, src_idx


def extract_correspondences_from_scores_topk(
    scores_mat: np.ndarray,
    k: int,
    has_dustbin: bool = False,
    largest: bool = True,
    return_score: bool = False,
):
    """Global top-k flat selection (``matching.py:102-132``)."""
    scores_mat = np.asarray(scores_mat)
    flat = scores_mat.reshape(-1)
    order = np.argsort(-flat if largest else flat, kind="stable")[:k]
    ref_idx = order // scores_mat.shape[1]
    src_idx = order % scores_mat.shape[1]
    if has_dustbin:
        keep = (ref_idx != scores_mat.shape[0] - 1) & (
            src_idx != scores_mat.shape[1] - 1
        )
        ref_idx, src_idx = ref_idx[keep], src_idx[keep]
    if return_score:
        return ref_idx, src_idx, scores_mat[ref_idx, src_idx]
    return ref_idx, src_idx


def extract_correspondences_from_feats(
    ref_feats: np.ndarray,
    src_feats: np.ndarray,
    mutual: bool = False,
    bilateral: bool = False,
    return_feat_dist: bool = False,
):
    """Nearest-neighbor selection in feature space (``matching.py:135-168``)."""
    ref_feats = np.asarray(ref_feats)
    src_feats = np.asarray(src_feats)
    d2 = (
        np.sum(ref_feats**2, axis=1)[:, None]
        + np.sum(src_feats**2, axis=1)[None, :]
        - 2.0 * ref_feats @ src_feats.T
    )
    # -d2 as "log prob": exp is monotonic so max selection is identical; use
    # threshold 0 on exp(-d2) > 0 (always true) = pure argmax selection
    ref_idx, src_idx = extract_correspondences_from_scores(
        -d2, mutual=mutual, bilateral=bilateral, has_dustbin=False
    )
    if return_feat_dist:
        return ref_idx, src_idx, d2[ref_idx, src_idx]
    return ref_idx, src_idx


# ---------------------------------------------------------------------------
# Dense <-> node correspondence converters (matching.py:176-229, 319-360)
# ---------------------------------------------------------------------------

def dense_correspondences_to_node_correspondences(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    ref_nodes: np.ndarray,
    src_nodes: np.ndarray,
    corr_indices: np.ndarray,
    return_score: bool = False,
):
    """Lift point correspondences to patch correspondences with count /
    proxy-overlap scores (``matching.py:176-229``)."""
    ref_points, src_points = np.asarray(ref_points), np.asarray(src_points)
    ref_nodes, src_nodes = np.asarray(ref_nodes), np.asarray(src_nodes)
    corr_indices = np.asarray(corr_indices)

    def p2n(points, nodes):
        d2 = (
            np.sum(points**2, 1)[:, None]
            + np.sum(nodes**2, 1)[None, :]
            - 2.0 * points @ nodes.T
        )
        idx = np.argmin(d2, axis=1)
        counts = np.bincount(idx, minlength=nodes.shape[0])
        return idx, counts

    ref_p2n, ref_sizes = p2n(ref_points, ref_nodes)
    src_p2n, src_sizes = p2n(src_points, src_nodes)

    ref_node_idx = ref_p2n[corr_indices[:, 0]]
    src_node_idx = src_p2n[corr_indices[:, 1]]
    flat = ref_node_idx * src_nodes.shape[0] + src_node_idx
    uniq, counts = np.unique(flat, return_counts=True)
    ref_u = uniq // src_nodes.shape[0]
    src_u = uniq % src_nodes.shape[0]
    node_corr = np.stack([ref_u, src_u], axis=1)
    if return_score:
        scores = 0.5 * (
            counts / ref_sizes[ref_u] + counts / src_sizes[src_u]
        )
        return node_corr, counts, scores
    return node_corr, counts


def node_correspondences_to_dense_correspondences(
    ref_knn_points: np.ndarray,
    src_knn_points: np.ndarray,
    ref_knn_indices: np.ndarray,
    src_knn_indices: np.ndarray,
    node_corr_indices: np.ndarray,
    transform: np.ndarray,
    matching_radius: float,
    ref_knn_masks: np.ndarray | None = None,
    src_knn_masks: np.ndarray | None = None,
    return_distance: bool = False,
):
    """Expand patch correspondences to all point pairs within
    ``matching_radius`` (``matching.py:319-360``)."""
    ref_knn_points = np.asarray(ref_knn_points)
    src_knn_points = np.asarray(src_knn_points)
    node_corr_indices = np.asarray(node_corr_indices)
    transform = np.asarray(transform)
    if ref_knn_masks is None:
        ref_knn_masks = np.ones(ref_knn_indices.shape, bool)
    if src_knn_masks is None:
        src_knn_masks = np.ones(src_knn_indices.shape, bool)

    src_knn_points = src_knn_points @ transform[:3, :3].T + transform[:3, 3]
    ri, si = node_corr_indices[:, 0], node_corr_indices[:, 1]
    rp = ref_knn_points[ri]  # (P, K, 3)
    sp = src_knn_points[si]  # (P, K, 3)
    dist = np.linalg.norm(rp[:, :, None, :] - sp[:, None, :, :], axis=-1)
    corr = (dist < matching_radius) & (
        np.asarray(ref_knn_masks)[ri][:, :, None]
        & np.asarray(src_knn_masks)[si][:, None, :]
    )
    b, r, c = np.nonzero(corr)
    corr_indices = np.stack(
        [np.asarray(ref_knn_indices)[ri][b, r],
         np.asarray(src_knn_indices)[si][b, c]], axis=1
    )
    if return_distance:
        return corr_indices, dist[b, r, c]
    return corr_indices


def get_node_overlap_ratios(
    ref_points,
    src_points,
    ref_knn_points,
    src_knn_points,
    ref_knn_indices,
    src_knn_indices,
    node_corr_indices,
    transform,
    matching_radius,
    ref_knn_masks,
    src_knn_masks,
    eps: float = 1e-5,
):
    """Per-patch fraction of points participating in any gt dense
    correspondence (``matching.py:363-407``)."""
    corr_indices = node_correspondences_to_dense_correspondences(
        ref_knn_points, src_knn_points, ref_knn_indices, src_knn_indices,
        node_corr_indices, transform, matching_radius,
        ref_knn_masks=ref_knn_masks, src_knn_masks=src_knn_masks,
    )
    ref_overlap = np.zeros(np.asarray(ref_points).shape[0] + 1)
    src_overlap = np.zeros(np.asarray(src_points).shape[0] + 1)
    ref_overlap[np.unique(corr_indices[:, 0])] = 1.0
    src_overlap[np.unique(corr_indices[:, 1])] = 1.0
    ref_knn_masks = np.asarray(ref_knn_masks)
    src_knn_masks = np.asarray(src_knn_masks)
    ref_ratios = (ref_overlap[np.asarray(ref_knn_indices)] * ref_knn_masks).sum(
        1
    ) / (ref_knn_masks.sum(1) + eps)
    src_ratios = (src_overlap[np.asarray(src_knn_indices)] * src_knn_masks).sum(
        1
    ) / (src_knn_masks.sum(1) + eps)
    return ref_ratios, src_ratios


def get_node_occlusion_ratios(
    ref_points,
    src_points,
    ref_knn_points,
    src_knn_points,
    ref_knn_indices,
    src_knn_indices,
    node_corr_indices,
    transform,
    matching_radius,
    ref_knn_masks,
    src_knn_masks,
    eps: float = 1e-5,
):
    """1 - overlap ratio per patch (``matching.py:410-430``)."""
    ref_ratios, src_ratios = get_node_overlap_ratios(
        ref_points, src_points, ref_knn_points, src_knn_points,
        ref_knn_indices, src_knn_indices, node_corr_indices, transform,
        matching_radius, ref_knn_masks, src_knn_masks, eps=eps,
    )
    return 1.0 - ref_ratios, 1.0 - src_ratios

r"""Benchmark evaluation protocols (numpy, host-side).

Ports of ``geotransformer/datasets/registration/threedmatch/utils.py`` (the
official 3DMatch gt.log/gt.info covariance-weighted RMSE protocol) and of
``geotransformer/utils/registration.py`` (correspondence metrics) — the
machinery behind ``eval.py --benchmark={3DMatch,3DLoMatch} --method=...``.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np


# ------------------------------------------------------------------ log files


def read_log_file(file_name):
    """Parse est.log/gt.log: blocks of 5 lines (pair header + 4x4 transform).

    Reference: ``threedmatch/utils.py:65-82``.
    """
    with open(file_name) as f:
        lines = [line.strip() for line in f.readlines()]
    pairs = []
    for i in range(len(lines) // 5):
        head = lines[i * 5].split()
        transform = np.array(
            [lines[i * 5 + j].split() for j in range(1, 5)], dtype=np.float32
        )
        pairs.append(
            dict(
                test_pair=[int(head[0]), int(head[1])],
                num_fragments=int(head[2]),
                transform=transform,
            )
        )
    return pairs


def read_info_file(file_name):
    """Parse gt.info: blocks of 7 lines (pair header + 6x6 covariance).

    Reference: ``threedmatch/utils.py:85-101``.
    """
    with open(file_name) as f:
        lines = [line.strip() for line in f.readlines()]
    pairs = []
    for i in range(len(lines) // 7):
        head = lines[i * 7].split()
        cov = np.array(
            [lines[i * 7 + j].split() for j in range(1, 7)], dtype=np.float32
        )
        pairs.append(
            dict(
                test_pair=[int(head[0]), int(head[1])],
                num_fragments=int(head[2]),
                covariance=cov,
            )
        )
    return pairs


def write_log_file(file_name, test_pairs):
    os.makedirs(osp.dirname(file_name), exist_ok=True)
    lines = []
    for pair in test_pairs:
        i0, i1 = pair["test_pair"]
        lines.append(f"{i0}\t{i1}\t{pair['num_fragments']}\n")
        for row in np.asarray(pair["transform"]).tolist():
            lines.append("\t".join(str(x) for x in row) + "\n")
    with open(file_name, "w") as f:
        f.writelines(lines)


# ---------------------------------------------------------------- transforms


def _rotation_to_quaternion(r):
    """Rotation matrix -> quaternion (w, x, y, z), Shepperd's method."""
    t = np.trace(r)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (r[2, 1] - r[1, 2]) / s
        y = (r[0, 2] - r[2, 0]) / s
        z = (r[1, 0] - r[0, 1]) / s
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        w = (r[2, 1] - r[1, 2]) / s
        x = 0.25 * s
        y = (r[0, 1] + r[1, 0]) / s
        z = (r[0, 2] + r[2, 0]) / s
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        w = (r[0, 2] - r[2, 0]) / s
        x = (r[0, 1] + r[1, 0]) / s
        y = 0.25 * s
        z = (r[1, 2] + r[2, 1]) / s
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        w = (r[1, 0] - r[0, 1]) / s
        x = (r[0, 2] + r[2, 0]) / s
        y = (r[1, 2] + r[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def compute_transform_error(transform, covariance, estimated_transform):
    """Covariance-weighted squared RMSE of the relative transform.

    Reference: ``threedmatch/utils.py:131-137`` (quaternion vector part + t).
    """
    rel = np.linalg.inv(transform) @ estimated_transform
    r, t = rel[:3, :3], rel[:3, 3]
    q = _rotation_to_quaternion(r)
    er = np.concatenate([t, q[1:]], 0)
    return float(er.reshape(1, 6) @ covariance @ er.reshape(6, 1) / covariance[0, 0])


def compute_registration_error(gt, est):
    """(RRE deg, RTE m)."""
    cos = np.clip(0.5 * (np.trace(gt[:3, :3].T @ est[:3, :3]) - 1.0), -1, 1)
    rre = float(np.degrees(np.arccos(cos)))
    rte = float(np.linalg.norm(gt[:3, 3] - est[:3, 3]))
    return rre, rte


# ---------------------------------------------------- correspondence metrics


def compute_inlier_ratio(ref_corr, src_corr, transform, positive_radius=0.1):
    """Fraction of correspondences within radius after gt alignment
    (``utils/registration.py:141-146``)."""
    aligned = src_corr @ transform[:3, :3].T + transform[:3, 3]
    residual = np.linalg.norm(ref_corr - aligned, axis=1)
    return float(np.mean(residual < positive_radius)) if len(residual) else 0.0


def compute_sparse_precision(ref_corr_indices, src_corr_indices,
                             gt_corr_indices):
    """Coarse node-correspondence precision (PIR): fraction of *distinct*
    predicted node pairs that are in the gt pair set
    (``utils/registration.py:253-281`` evaluate_sparse_correspondences —
    the reference dedupes via 0/1 indicator matrices)."""
    pred = {(int(r), int(s))
            for r, s in zip(ref_corr_indices, src_corr_indices)}
    gt = {(int(r), int(s)) for r, s in np.asarray(gt_corr_indices)}
    if not pred:
        return 0.0
    return len(pred & gt) / len(pred)


def compute_overlap(ref_points, src_points, transform, positive_radius=0.1):
    """Fraction of ref points with an aligned src point within radius."""
    from scipy.spatial import cKDTree

    aligned = src_points @ transform[:3, :3].T + transform[:3, 3]
    tree = cKDTree(aligned)
    d, _ = tree.query(ref_points, k=1)
    return float(np.mean(d < positive_radius))


# ---------------------------------------------------------- scene evaluation


def evaluate_registration_one_scene(
    gt_log_file, gt_info_file, result_file, positive_threshold=0.2
):
    """Official 3DMatch per-scene recall (``threedmatch/utils.py:139-196``)."""
    gt_logs = read_log_file(gt_log_file)
    gt_infos = read_info_file(gt_info_file)
    result_logs = read_log_file(result_file)

    num_fragments = gt_logs[0]["num_fragments"]
    gt_indices = -np.ones((num_fragments, num_fragments), dtype=np.int32)
    num_gt_pairs = 0
    for i, log in enumerate(gt_logs):
        i0, i1 = log["test_pair"]
        if i1 > i0 + 1:  # non-consecutive pairs only
            gt_indices[i0, i1] = i
            num_gt_pairs += 1

    num_pos = num_pred = 0
    rres, rtes = [], []
    for res in result_logs:
        i0, i1 = res["test_pair"]
        if gt_indices[i0, i1] == -1:
            continue
        num_pred += 1
        gi = gt_indices[i0, i1]
        err = compute_transform_error(
            gt_logs[gi]["transform"], gt_infos[gi]["covariance"], res["transform"]
        )
        if err <= positive_threshold**2:
            num_pos += 1
            rre, rte = compute_registration_error(
                gt_logs[gi]["transform"], res["transform"]
            )
            rres.append(rre)
            rtes.append(rte)

    return {
        "precision": num_pos / num_pred if num_pred else 0.0,
        "recall": num_pos / num_gt_pairs if num_gt_pairs else 0.0,
        "mean_rre": float(np.mean(rres)) if rres else 0.0,
        "mean_rte": float(np.mean(rtes)) if rtes else 0.0,
        "median_rre": float(np.median(rres)) if rres else 0.0,
        "median_rte": float(np.median(rtes)) if rtes else 0.0,
        "num_pos_pairs": num_pos,
        "num_pred_pairs": num_pred,
        "num_gt_pairs": num_gt_pairs,
    }


# ------------------------------------------------------------------- RANSAC


def registration_ransac_from_correspondences(
    ref_corr,
    src_corr,
    distance_threshold=0.05,
    num_points=3,
    num_iterations=50000,
    seed=0,
):
    """Correspondence-based RANSAC rigid registration (numpy).

    Replaces the open3d RANSAC path (``utils/open3d.py:169-198``) used by
    ``eval.py --method=ransac``.  Vectorized block scoring with the standard
    confidence-based early exit (Open3D's C++ RANSAC semantics: stop once
    P(all-inlier sample seen) >= 0.999) — at typical post-matching inlier
    ratios this terminates after one block instead of 50k hypotheses
    (measured: 11 s -> ~0.1 s/pair on the eval box).
    """
    n = len(ref_corr)
    if n < num_points:
        return np.eye(4, dtype=np.float32)
    rng = np.random.RandomState(seed)
    block = 512
    confidence = 0.999

    best_count, best_r, best_t = -1, np.eye(3), np.zeros(3)
    done = 0
    while done < num_iterations:
        nb = min(block, num_iterations - done)
        samples = rng.randint(0, n, size=(nb, num_points))
        src_s = src_corr[samples]  # (H, P, 3)
        ref_s = ref_corr[samples]
        src_c = src_s - src_s.mean(axis=1, keepdims=True)
        ref_c = ref_s - ref_s.mean(axis=1, keepdims=True)
        h = np.einsum("hpi,hpj->hij", src_c, ref_c)
        u, _, vt = np.linalg.svd(h)
        det = np.linalg.det(np.einsum("hij,hkj->hik", vt.transpose(0, 2, 1), u))
        d = np.stack([np.ones_like(det), np.ones_like(det), np.sign(det)], -1)
        r = np.einsum("hji,hj,hkj->hik", vt, d, u)  # V diag U^T
        t = ref_s.mean(axis=1) - np.einsum("hij,hj->hi", r, src_s.mean(axis=1))

        aligned = np.einsum("hij,nj->hni", r, src_corr) + t[:, None, :]
        res = np.linalg.norm(aligned - ref_corr[None], axis=-1)
        counts = np.sum(res < distance_threshold, axis=1)
        i = int(np.argmax(counts))
        if counts[i] > best_count:
            best_count = int(counts[i])
            best_r, best_t = r[i], t[i]
        done += nb
        # early exit: enough hypotheses drawn that an all-inlier sample was
        # seen with high probability given the best inlier ratio so far
        w = best_count / n
        p_in = w**num_points
        if p_in > 0 and (1.0 - (1.0 - p_in) ** done) >= confidence:
            break

    # refine on inliers with full Procrustes
    aligned = src_corr @ best_r.T + best_t
    inliers = np.linalg.norm(aligned - ref_corr, axis=1) < distance_threshold
    if inliers.sum() >= 3:
        src_in, ref_in = src_corr[inliers], ref_corr[inliers]
        sc, rc = src_in - src_in.mean(0), ref_in - ref_in.mean(0)
        hm = sc.T @ rc
        u2, _, vt2 = np.linalg.svd(hm)
        d2 = np.diag([1.0, 1.0, np.sign(np.linalg.det(vt2.T @ u2.T))])
        rr = vt2.T @ d2 @ u2.T
        tt = ref_in.mean(0) - rr @ src_in.mean(0)
    else:
        rr, tt = best_r, best_t
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = rr
    out[:3, 3] = tt
    return out

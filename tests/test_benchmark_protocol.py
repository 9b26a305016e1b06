"""Tests for the 3DMatch benchmark protocol + RANSAC + eval roundtrip."""

import os
import os.path as osp

import numpy as np

from se3et_tpu.eval import benchmark as B


def _random_transform(rng, angle=0.5):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = r
    tf[:3, 3] = rng.normal(size=3) * 0.3
    return tf


def test_log_file_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pairs = [
        dict(test_pair=[0, 2], num_fragments=5, transform=_random_transform(rng)),
        dict(test_pair=[1, 4], num_fragments=5, transform=_random_transform(rng)),
    ]
    path = str(tmp_path / "est.log")
    B.write_log_file(path, pairs)
    back = B.read_log_file(path)
    assert len(back) == 2
    for a, b in zip(pairs, back):
        assert a["test_pair"] == b["test_pair"]
        np.testing.assert_allclose(a["transform"], b["transform"], atol=1e-5)


def test_quaternion_conversion():
    rng = np.random.RandomState(1)
    for _ in range(10):
        tf = _random_transform(rng, angle=rng.uniform(0, 3))
        q = B._rotation_to_quaternion(tf[:3, :3])
        # reconstruct rotation from quaternion
        w, x, y, z = q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(r, tf[:3, :3], atol=1e-5)


def test_transform_error_zero_for_exact():
    rng = np.random.RandomState(2)
    tf = _random_transform(rng)
    cov = np.eye(6, dtype=np.float32) * 2.0
    err = B.compute_transform_error(tf, cov, tf)
    assert err < 1e-8


def test_scene_recall_protocol(tmp_path):
    """Full gt.log/gt.info/est.log scene evaluation with known outcomes."""
    rng = np.random.RandomState(3)
    num_frag = 6
    gt_logs, gt_infos, est_logs = [], [], []
    for (i0, i1) in [(0, 2), (0, 3), (1, 4), (2, 5)]:
        tf = _random_transform(rng)
        gt_logs.append(dict(test_pair=[i0, i1], num_fragments=num_frag, transform=tf))
        gt_infos.append(
            dict(test_pair=[i0, i1], num_fragments=num_frag,
                 covariance=np.eye(6, dtype=np.float32) * 100.0)
        )
        # first two pairs estimated perfectly, last two badly off
        est = tf if len(est_logs) < 2 else _random_transform(rng, angle=2.0)
        est_logs.append(dict(test_pair=[i0, i1], num_fragments=num_frag, transform=est))

    gt_log = str(tmp_path / "gt.log")
    gt_info = str(tmp_path / "gt.info")
    est_log = str(tmp_path / "est.log")
    # write gt.log (read_log_file format) and gt.info
    B.write_log_file(gt_log, gt_logs)
    with open(gt_info, "w") as f:
        for info in gt_infos:
            i0, i1 = info["test_pair"]
            f.write(f"{i0}\t{i1}\t{num_frag}\n")
            for row in info["covariance"]:
                f.write("\t".join(str(x) for x in row) + "\n")
    B.write_log_file(est_log, est_logs)

    result = B.evaluate_registration_one_scene(gt_log, gt_info, est_log)
    assert result["num_gt_pairs"] == 4
    assert result["num_pos_pairs"] == 2
    assert abs(result["recall"] - 0.5) < 1e-6


def test_ransac_recovers_transform():
    rng = np.random.RandomState(4)
    tf = _random_transform(rng)
    src = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    ref = (src @ tf[:3, :3].T + tf[:3, 3]).astype(np.float32)
    # 40% outliers
    ref[120:] += rng.normal(scale=1.0, size=(80, 3))
    est = B.registration_ransac_from_correspondences(
        ref, src, distance_threshold=0.05, num_points=3, num_iterations=2000
    )
    rre, rte = B.compute_registration_error(tf, est)
    assert rre < 1.0 and rte < 0.05

"""Compute KITTI pair overlap statistics.

Port of the reference's offline overlap analysis
(``geotransformer/datasets/registration/kitti/calculate_overlap.py:108-241``):
for each registration pair, transform src by the gt transform and measure the
symmetric fraction of points with a neighbor in the other cloud within a
distance threshold (0.3 m for KITTI, 0.05 m for 3DMatch-scale data).

Usage::

    python scripts/calculate_kitti_overlap.py --experiment se3eti.kitti \
        --subset train --threshold 0.3 [--max_pairs N]
"""

import argparse
import sys
import os.path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from se3et_tpu.experiments import make_cfg  # noqa: E402
from se3et_tpu.experiments.runner import build_dataset  # noqa: E402


def overlapping_rate(ref_points, src_points, threshold):
    """Symmetric overlap: mean of per-cloud fractions of points whose nearest
    neighbor in the other cloud is within ``threshold``
    (``calculate_overlap.py:108-138``)."""
    from scipy.spatial import cKDTree

    ref_tree = cKDTree(ref_points)
    src_tree = cKDTree(src_points)
    d_ref_to_src, _ = ref_tree.query(src_points, distance_upper_bound=threshold)
    d_src_to_ref, _ = src_tree.query(ref_points, distance_upper_bound=threshold)
    rate_src = np.mean(d_ref_to_src <= threshold)
    rate_ref = np.mean(d_src_to_ref <= threshold)
    return 0.5 * (rate_src + rate_ref)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", default="se3eti.kitti")
    parser.add_argument("--subset", default="train")
    parser.add_argument("--threshold", type=float, default=0.3)
    parser.add_argument("--max_pairs", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = make_cfg(args.experiment)
    ds = build_dataset(cfg, args.subset, training=args.subset == "train")

    overlaps = []
    n = len(ds) if args.max_pairs is None else min(len(ds), args.max_pairs)
    for i in range(n):
        item = ds[i]
        tf = item["transform"]
        src = item["src_points"] @ tf[:3, :3].T + tf[:3, 3]
        ov = overlapping_rate(item["ref_points"], src, args.threshold)
        overlaps.append(ov)
        print(f"[{i + 1}/{n}] overlap {ov:.4f}")

    overlaps = np.asarray(overlaps)
    print(f"avg_overlap {overlaps.mean():.4f}")
    print(f"std_overlap {overlaps.std():.4f}")
    return overlaps


if __name__ == "__main__":
    main()

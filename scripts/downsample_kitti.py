"""KITTI odometry preprocessing: voxel-downsample raw velodyne scans to .npy.

Port of ``data/Kitti/downsample_pcd.py`` (voxel 0.3 m) without the open3d
dependency — uses the framework's grid subsampler (closest-to-centroid, the
same semantics the training pipeline uses).

Usage:
    python scripts/downsample_kitti.py --input data/Kitti/sequences \
        --output data/Kitti/downsampled --voxel 0.3
"""

import argparse
import os
import os.path as osp
import struct
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from se3et_tpu.data import host_ops  # noqa: E402


def read_velodyne_bin(path):
    data = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return data[:, :3]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--voxel", type=float, default=0.3)
    args = parser.parse_args()

    for seq in sorted(os.listdir(args.input)):
        vel_dir = osp.join(args.input, seq, "velodyne")
        if not osp.isdir(vel_dir):
            continue
        out_dir = osp.join(args.output, seq)
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(vel_dir)):
            if not fname.endswith(".bin"):
                continue
            pts = read_velodyne_bin(osp.join(vel_dir, fname))
            sub, _ = host_ops.grid_subsample_single(pts, args.voxel)
            np.save(osp.join(out_dir, fname.replace(".bin", ".npy")), sub)
        print(f"sequence {seq}: done")


if __name__ == "__main__":
    main()

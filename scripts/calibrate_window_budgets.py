"""Calibrate per-set window-segment budgets for the fused conv kernels.

For each conv neighbor set of a pipeline config, sweep the segment budget and
report the drop rate over a few production-scale synthetic pairs; pick the
smallest budget whose drop rate is <= the tolerance (default 0.5%), preferring
even counts (window width W = nseg * 64 lands on a 128-lane boundary — the
one-hot operand's minor dim pads to 128 inside the kernel).

Usage:
    python scripts/calibrate_window_budgets.py [--exp se3ete.3dmatch]
        [--pairs 4] [--tol 0.005]
"""

import argparse
import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")

from se3et_tpu.data import pipeline as pipe
from se3et_tpu.data.datasets import SyntheticPairDataset
from se3et_tpu.experiments import make_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--max_nseg", type=int, default=40)
    args = ap.parse_args()

    cfg = make_cfg(args.exp)
    pcfg = cfg.pipeline
    # mirror runner.build_dataset's synthetic-fallback scene scale — KITTI's
    # voxel 0.3 m / radius 1.275 m assumes LiDAR-scale extents
    scale = {"threedmatch": 2.0, "kitti_test": 2.0, "modelnet": 0.8}.get(
        cfg.data.dataset, 20.0
    )
    items = [
        SyntheticPairDataset(
            num_pairs=1, num_points=cfg.data.point_limit, extent=scale,
            seed=100 + i,
        )[0]
        for i in range(args.pairs)
    ]

    # one wide pass to collect the raw neighbor matrices per set
    wide = dataclasses.replace(
        pcfg,
        window_segments=args.max_nseg,
        window_segments_by_set=(),
        patch_k=0,
    )
    raw_sets: dict[str, list[tuple[np.ndarray, int]]] = {}

    orig_build = pipe.build_window_maps

    def capture(neighbors, cap_s, max_segs, stats_key=None):
        if stats_key is not None:
            raw_sets.setdefault(stats_key, []).append((neighbors.copy(), cap_s))
        return orig_build(neighbors, cap_s, max_segs, stats_key=stats_key)

    pipe.build_window_maps = capture
    try:
        for it in items:
            pipe.build_pair_pyramid(
                it["ref_points"], it["src_points"], it["transform"], wide
            )
    finally:
        pipe.build_window_maps = orig_build

    chosen = {}
    for key in sorted(raw_sets):
        rows = raw_sets[key]
        budget = None
        rate_at = {}
        step = max(128 // pipe.WINDOW_SSEG, 1)  # keep W on a 128-lane boundary
        for nseg in range(step, args.max_nseg + 1, step):
            dropped = total = 0
            for nbr, cap_s in rows:
                pipe.WINDOW_DROP_STATS.clear()
                orig_build(nbr, cap_s, nseg, stats_key="t")
                d, t = pipe.WINDOW_DROP_STATS["t"]
                dropped += d
                total += t
            rate = dropped / max(total, 1)
            rate_at[nseg] = rate
            if rate <= args.tol:
                budget = nseg
                break
        print(f"{key}: budget={budget}  " + "  ".join(
            f"{n}:{r:.4%}" for n, r in rate_at.items()
        ))
        chosen[key] = budget

    print("\nwindow_segments_by_set=(")
    for key, b in sorted(chosen.items()):
        print(f'    ("{key}", {b}),')
    print(")")


if __name__ == "__main__":
    main()

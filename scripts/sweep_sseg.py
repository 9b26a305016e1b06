"""Host-side sweep: per-set window width W at matched drop tolerance for
different segment granularities (sseg = source rows per window segment).

Kernel gather/influence/maxpool cost is linear in W = nseg * sseg; the
segment one-hot matmul cost is linear in nseg (slots) and independent of
sseg otherwise.  Finer segments capture Morton-local neighbors with fewer
wasted rows — each halving has cut W 15-35% so far (BENCH.md).  This prints,
per conv set, the smallest budget meeting the drop tolerance for each sseg
and the resulting W, so the per-set winner can be chosen without chip time.

Usage: python scripts/sweep_sseg.py [--exp se3ete.3dmatch] [--pairs 4]
        [--tol 0.005] [--ssegs 8,16,32]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from se3et_tpu.data import pipeline as pipe
from se3et_tpu.data.datasets import SyntheticPairDataset
from se3et_tpu.experiments import make_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--ssegs", default="8,16,32")
    ap.add_argument("--max_w", type=int, default=2048)
    args = ap.parse_args()
    ssegs = [int(s) for s in args.ssegs.split(",")]

    cfg = make_cfg(args.exp)
    pcfg = cfg.pipeline
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
        pcfg, window_segments=8, window_segments_by_set=(), patch_k=0
    )
    raw_sets = {}
    orig_build = pipe.build_window_maps

    def capture(neighbors, cap_s, max_segs, stats_key=None, sseg=None):
        if stats_key is not None:
            raw_sets.setdefault(stats_key, []).append(
                (neighbors.copy(), cap_s)
            )
        return orig_build(neighbors, cap_s, max_segs, stats_key=stats_key,
                          sseg=sseg)

    pipe.build_window_maps = capture
    try:
        for it in items:
            pipe.build_pair_pyramid(
                it["ref_points"], it["src_points"], it["transform"], wide
            )
    finally:
        pipe.build_window_maps = orig_build

    print(f"{'set':18s} " + "  ".join(f"sseg={s:<3d} (budget -> W)" for s in ssegs))
    for key in sorted(raw_sets):
        rows = raw_sets[key]
        cells = []
        for sseg in ssegs:
            step = max(128 // sseg, 1)  # W stays on a 128-lane boundary
            budget = None
            rate = None
            for nseg in range(step, args.max_w // sseg + 1, step):
                dropped = total = 0
                for nbr, cap_s in rows:
                    pipe.WINDOW_DROP_STATS.clear()
                    orig_build(nbr, cap_s, nseg, stats_key="t", sseg=sseg)
                    d, t = pipe.WINDOW_DROP_STATS["t"]
                    dropped += d
                    total += t
                rate = dropped / max(total, 1)
                if rate <= args.tol:
                    budget = nseg
                    break
            w = budget * sseg if budget else -1
            cells.append(f"{budget if budget else '--':>6} -> W={w:<5d} "
                         f"(drop {rate:.3%})")
        print(f"{key:18s} " + "  ".join(cells))


if __name__ == "__main__":
    main()

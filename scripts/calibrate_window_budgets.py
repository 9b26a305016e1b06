"""Calibrate per-set window-segment budgets for the fused conv kernels.

For each conv neighbor set of a pipeline config, sweep the segment budget and
report the drop rate over a few production-scale synthetic pairs; pick the
smallest budget whose drop rate is <= the tolerance (default 0.5%).  Budgets
step by 128 // sseg so the window width W = budget * sseg lands on a
128-lane boundary (the one-hot operand's minor dim pads to 128 inside the
kernel).  Honors the config's per-set segment granularity
(``window_sseg_by_set``); use scripts/sweep_sseg.py to pick that first.

Usage:
    python scripts/calibrate_window_budgets.py [--exp se3ete.3dmatch]
        [--pairs 4] [--tol 0.005]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from se3et_tpu.data import pipeline as pipe
from se3et_tpu.data.datasets import SyntheticPairDataset
from se3et_tpu.experiments import make_cfg


def collect_raw_sets(exp: str, pairs: int, max_nseg: int = 40):
    """One wide pyramid pass per synthetic pair, capturing each conv set's
    raw (neighbors, cap_s) inputs (shared with sweep_sseg.py)."""
    cfg = make_cfg(exp)
    pcfg = cfg.pipeline
    from se3et_tpu.experiments.runner import synthetic_extent

    scale = synthetic_extent(cfg.data.dataset)
    items = [
        SyntheticPairDataset(
            num_pairs=1, num_points=cfg.data.point_limit, extent=scale,
            seed=100 + i,
        )[0]
        for i in range(pairs)
    ]
    wide = dataclasses.replace(
        pcfg, window_segments=max_nseg, window_segments_by_set=(), patch_k=0
    )
    raw_sets: dict = {}
    with pipe.capture_window_map_inputs(raw_sets):
        for it in items:
            pipe.build_pair_pyramid(
                it["ref_points"], it["src_points"], it["transform"], wide
            )
    return cfg, raw_sets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--max_nseg", type=int, default=40)
    args = ap.parse_args()

    cfg, raw_sets = collect_raw_sets(args.exp, args.pairs, args.max_nseg)
    chosen = {}
    for key in sorted(raw_sets):
        sseg = cfg.pipeline.sseg_for(key)
        budget, rate_at = pipe.min_window_budget(
            raw_sets[key], sseg, args.tol, max_w=args.max_nseg * 16
        )
        print(f"{key} (sseg={sseg}): budget={budget}  " + "  ".join(
            f"{n}:{r:.4%}" for n, r in rate_at.items()
        ))
        chosen[key] = budget

    print("\nwindow_segments_by_set=(")
    for key, b in sorted(chosen.items()):
        print(f'    ("{key}", {b}),')
    print(")")


if __name__ == "__main__":
    main()

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
import sys

import os.path as _osp
sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))
sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))

from se3et_tpu.data import pipeline as pipe

from calibrate_window_budgets import collect_raw_sets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--ssegs", default="8,16,32")
    ap.add_argument("--max_w", type=int, default=2048)
    args = ap.parse_args()
    ssegs = [int(s) for s in args.ssegs.split(",")]

    _, raw_sets = collect_raw_sets(args.exp, args.pairs)

    print(f"{'set':18s} "
          + "  ".join(f"sseg={s:<3d} (budget -> W)" for s in ssegs))
    for key in sorted(raw_sets):
        cells = []
        for sseg in ssegs:
            budget, rate_at = pipe.min_window_budget(
                raw_sets[key], sseg, args.tol, max_w=args.max_w
            )
            rate = rate_at[budget] if budget else max(rate_at.values())
            w = budget * sseg if budget else -1
            cells.append(f"{budget if budget else '--':>6} -> W={w:<5d} "
                         f"(drop {rate:.3%})")
        print(f"{key:18s} " + "  ".join(cells))


if __name__ == "__main__":
    main()

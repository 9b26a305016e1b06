"""Calibrate per-set neighbor-H caps for the windowed conv kernels.

Conv/maxpool kernel cost is linear in the padded neighbor count H, but the
calibrated ``neighbor_limits`` are tail-quantile worst cases — typical valid
counts are 2-6x lower.  Neighbors are distance-sorted, so a (sentinel-
compacted) truncation drops the farthest = minimum-influence entries.  This
script measures, per conv neighbor set, the INFLUENCE MASS dropped at each
candidate cap (multiples of 8) and picks the smallest cap under the
tolerance (default 0.5%, matching the window-budget discipline).

Usage:
    python scripts/calibrate_h_caps.py [--exp se3ete.3dmatch] [--pairs 4]
        [--tol 0.005]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from se3et_tpu.data import influence as infl_lib
from se3et_tpu.data import pipeline as pipe
from se3et_tpu.data.datasets import SyntheticPairDataset
from se3et_tpu.experiments import make_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--tol", type=float, default=0.005)
    args = ap.parse_args()

    cfg = make_cfg(args.exp)
    pcfg = cfg.pipeline
    m = cfg.model
    scale = {"threedmatch": 2.0, "kitti_test": 2.0, "modelnet": 0.8}.get(
        cfg.data.dataset, 20.0
    )
    # radius/sigma schedule mirrors data/influence.py precompute_influence
    r0, s0 = m.init_radius, m.init_sigma
    mode = m.epn.kp_influence if m.backbone == "e2pn" else "linear"

    def set_schedule(key):
        st = int(key.split("_")[1])
        if key.startswith("neighbors"):
            mult = 1 if st == 0 else 2 ** (st - 1) * 2
            return st, st, r0 * mult, s0 * mult
        mult = 2 ** st
        return st + 1, st, r0 * mult, s0 * mult

    # accumulate per-set sorted influence masses across pairs
    masses: dict[str, list] = {}
    for i in range(args.pairs):
        item = SyntheticPairDataset(
            num_pairs=1, num_points=cfg.data.point_limit, extent=scale,
            seed=300 + i,
        )[0]
        data = pipe.build_pair_pyramid(
            item["ref_points"], item["src_points"], item["transform"],
            # measure on UNCAPPED pyramids
            __import__("dataclasses").replace(pcfg, neighbor_h_caps_by_set=()),
        )
        for key in sorted(data):
            if not (key.startswith("neighbors_") or key.startswith("subsampling_")):
                continue
            if "segs" in key or "local" in key:
                continue
            st_q, st_s, radius, sigma = set_schedule(key)
            q = np.asarray(data[f"points_{st_q}"], np.float32)
            sup = np.asarray(data[f"points_{st_s}"], np.float32)
            nbr = np.asarray(data[key])
            kp = infl_lib._kernel_points_for(m, radius)
            w = infl_lib._influence_np(q, sup, nbr, kp, sigma, mode).astype(
                np.float32
            )  # (B, Nq, Hpad, K), zero at invalid
            w = w[:, :, : nbr.shape[2]]
            # compact like the pipeline: valid (nonzero-influence-capable)
            # entries pushed left, distance order preserved
            sent = sup.shape[1]
            valid = nbr < sent
            order = np.argsort(~valid, axis=2, kind="stable")
            w = np.take_along_axis(w, order[..., None], axis=2)
            per_h = w.sum(axis=(0, 1, 3))  # (H,) mass per column after compact
            masses.setdefault(key, []).append(per_h)

    chosen = {}
    for key in sorted(masses):
        per_h = np.sum(masses[key], axis=0)
        total = per_h.sum()
        h_full = len(per_h)
        budget = None
        rate_at = {}
        for hcap in range(8, h_full + 1, 8):
            rate = per_h[hcap:].sum() / max(total, 1e-12)
            rate_at[hcap] = rate
            if budget is None and rate <= args.tol:
                budget = hcap
        if budget is None:
            budget = h_full
        print(f"{key}: H_full={h_full} cap={budget}  " + "  ".join(
            f"{h}:{r:.4%}" for h, r in rate_at.items()
        ))
        chosen[key] = budget

    print("\nneighbor_h_caps_by_set=(")
    for key, b in sorted(chosen.items()):
        print(f'    ("{key}", {b}),')
    print(")")


if __name__ == "__main__":
    main()

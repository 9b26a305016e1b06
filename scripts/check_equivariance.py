"""Equivariance check harness (port of ``experiments/debug/check_equivariant.py``).

Builds a single E2PN conv (or the full backbone with ``--full``), feeds a point
cloud and its rotated copy for every anchor-group rotation, and reports the
per-anchor cosine similarity after the predicted trace permutation — expected
~1.0 under the exact steerability constraint.

Usage:
    python scripts/check_equivariance.py [--kanchor 6] [--quotient 4] [--full]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kanchor", type=int, default=6)
    parser.add_argument("--quotient", type=int, default=4)
    parser.add_argument("--num_kernel_points", type=int, default=15)
    parser.add_argument("--steerability", default="exact",
                        choices=["exact", "relaxed"])
    parser.add_argument("--full", action="store_true", help="check the full backbone")
    parser.add_argument("--num_points", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from se3et_tpu.data import host_ops
    from se3et_tpu.nn import epn

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(args.num_points, 3)).astype(np.float32)
    nbrs = host_ops.radius_search_single(pts, pts, 0.3, limit=16).astype(np.int32)

    cfg = epn.EPNConfig(
        kanchor=args.kanchor, quotient_factor=args.quotient,
        num_kernel_points=args.num_kernel_points, steerability=args.steerability,
    )
    sp = cfg.space
    conv = epn.KPConvInterSO3(8, 16, radius=0.3, sigma=0.24, config=cfg)
    feats = rng.normal(size=(1, pts.shape[0], args.kanchor, 8)).astype(np.float32)
    params = conv.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(pts[None]),
        jnp.asarray(pts[None]), jnp.asarray(nbrs[None]),
    )

    def run(f, p):
        return np.asarray(
            conv.apply(params, jnp.asarray(f), jnp.asarray(p[None]),
                       jnp.asarray(p[None]), jnp.asarray(nbrs[None]))
        )[0]

    base = run(feats, pts)
    worst = 1.0
    for g in range(sp.num_rotations):
        rot = sp.rotations[g].astype(np.float64)
        perm = sp.trace_idx_rot[g]
        out_r = run(feats[:, :, perm], (pts @ rot.T).astype(np.float32))
        expect = base[:, perm]
        cos = np.sum(out_r * expect) / (
            np.linalg.norm(out_r) * np.linalg.norm(expect) + 1e-12
        )
        worst = min(worst, cos)
        print(f"rotation {g:3d}: cosine similarity {cos:.6f}")
    print(f"\nworst-case cosine similarity: {worst:.6f} "
          f"({'EXACT equivariance' if worst > 0.999 else 'approximate'})")


if __name__ == "__main__":
    main()

"""In-graph section attribution via prefix timing.

Each per-section jit carries the axon relay's per-dispatch bias (~0.6-12 ms,
varies with relay load), which inflated the round-2/3 section tables.  This
harness times PREFIXES of the full serving graph (via
``SE3ETModel.__call__(stop_after=...)``) — every prefix pays the same single
dispatch, so consecutive DIFFERENCES are unbiased in-graph section costs.

Usage: python scripts/profile_prefix.py [--exp se3ete.3dmatch] [--reps 30]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--backbone", action="store_true",
                    help="stage-level prefixes inside the backbone instead")
    ap.add_argument("--no_fused", action="store_true",
                    help="backbone mode: XLA row-gather path instead of the "
                    "windowed kernels")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"),
    )

    import __graft_entry__ as graft
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn.init_util import jit_init
    from se3et_tpu.nn.model import SE3ETModel
    from se3et_tpu.utils.jitopt import serving_jit_options

    cfg = make_cfg(args.exp)
    model = SE3ETModel(cfg.model)
    # the dataset family's synthetic scene extent (single source of truth
    # in experiments.runner; wrong-scale pairs skew window drops)
    from se3et_tpu.experiments.runner import synthetic_extent

    extent = synthetic_extent(cfg.data.dataset)
    data = graft._example_pair(
        cfg.pipeline, num_points=cfg.data.point_limit, seed=0,
        model_cfg=cfg.model, extent=extent,
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    rngs = {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)}
    params = jit_init(model, rngs, data, train=False, with_registration=False)

    if args.backbone:
        _backbone_prefixes(model, params, data, args.reps,
                           fused=not args.no_fused)
        return

    stages = ["backbone", "transformer", "matching", "sinkhorn", ""]
    labels = ["backbone", "transformer+embedding", "superpoint match+gather",
              "sinkhorn", "LGR"]

    def run_prefix(stop):
        # reduce to ONE scalar in-graph: fetching a multi-MB output over the
        # ~100 MB/s relay would otherwise dominate the measurement
        fn = jax.jit(
            lambda p, d: sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(model.apply(
                    p, d, train=False, with_registration=(stop == ""),
                    with_gt=False, stop_after=stop,
                ))
                if jnp.issubdtype(leaf.dtype, jnp.floating)
            ),
            compiler_options=serving_jit_options(cfg.model),
        )
        float(fn(params, data))
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(params, data)
        float(out)
        return (time.time() - t0) / args.reps * 1000.0

    times = []
    for stop in stages:
        t = run_prefix(stop)
        times.append(t)
        print(f"prefix through {stop or 'FULL':24s} {t:8.2f} ms", flush=True)

    print("\nin-graph section costs (prefix deltas, dispatch bias cancelled):")
    prev = 0.0
    for label, t in zip(labels, times):
        print(f"  {label:28s} {t - prev:8.2f} ms")
        prev = t
    print(f"  full graph                   {times[-1]:8.2f} ms")


def _backbone_prefixes(model, params, data, reps, fused=True):
    import jax
    import jax.numpy as jnp

    from se3et_tpu.utils.jitopt import train_jit_options

    cuts = [0, 1, 2, 3, -1]
    labels = ["stage 0 (+lift)", "stage 1", "stage 2", "stage 3",
              "inv-pool + decoder"]

    def run(cut):
        # call the backbone submodule directly with the model's param tree
        bb = jax.jit(
            lambda p, d: sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(
                    model.bind(p).backbone_net(
                        d["features"], d, fused=fused, stop_stage=cut
                    )
                )
            ),
            compiler_options=train_jit_options(),
        )
        float(bb(params, data))
        t0 = time.time()
        for _ in range(reps):
            out = bb(params, data)
        float(out)
        return (time.time() - t0) / reps * 1000.0

    times = [run(c) for c in cuts]
    for label, t in zip(labels, times):
        print(f"prefix through {label:24s} {t:8.2f} ms", flush=True)
    print("\nin-graph backbone stage costs (prefix deltas):")
    prev = 0.0
    for label, t in zip(labels, times):
        print(f"  {label:28s} {t - prev:8.2f} ms")
        prev = t


if __name__ == "__main__":
    main()

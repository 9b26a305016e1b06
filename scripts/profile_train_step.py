"""Production-shape train-step characterization on the real chip.

Jits ``make_train_step`` for a registered experiment at its registered
pipeline shapes (se3ete.3dmatch: point_limit 20000) over a production-scale
synthetic pair, runs a few steps, and reports ms/step + peak HBM.  This is
the round-2 OOM characterization harness (BENCH.md "Production-shape
training characterization"), now with the per-stage backbone remat knob
(``ModelConfig.backbone_remat``) to A/B.

Usage:
    python scripts/profile_train_step.py [--exp se3ete.3dmatch] [--steps 4]
        [--no_remat] [--point_limit N]
"""

import argparse
import dataclasses
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="se3ete.3dmatch")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--point_limit", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"),
    )

    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.pipeline import build_pair_pyramid
    from se3et_tpu.engine.steps import make_train_step
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn.init_util import jit_init
    from se3et_tpu.nn.model import SE3ETModel
    from se3et_tpu.utils.memory import device_mem_usage

    cfg = make_cfg(args.exp)
    mcfg = dataclasses.replace(cfg.model, backbone_remat=not args.no_remat)
    n_pts = args.point_limit or cfg.data.point_limit
    print(f"{args.exp}: point_limit={n_pts} remat={mcfg.backbone_remat}",
          flush=True)

    datas = []
    for seed in range(2):
        item = SyntheticPairDataset(num_pairs=1, num_points=n_pts,
                                    seed=seed)[0]
        d = build_pair_pyramid(item["ref_points"], item["src_points"],
                               item["transform"], cfg.pipeline)
        datas.append({k: jnp.asarray(v) for k, v in d.items()})

    model = SE3ETModel(mcfg)
    rngs = {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)}
    params = jit_init(model, rngs, datas[0], train=True,
                      with_registration=False)
    tx = optax.adamw(1e-4, weight_decay=1e-6)
    opt_state = tx.init(params)
    from se3et_tpu.utils.jitopt import train_jit_options

    step = jax.jit(make_train_step(model, cfg.loss, tx),
                   donate_argnums=(0, 1), compiler_options=train_jit_options())

    rng = jax.random.PRNGKey(7)
    print("compiling + first step...", flush=True)
    t0 = time.time()
    params, opt_state, losses = step(params, opt_state, datas[0], rng)
    # the axon relay does not honor block_until_ready — sync via a scalar fetch
    first_loss = float(losses["loss"])
    print(f"first step (incl. compile): {time.time() - t0:.1f}s "
          f"loss={first_loss:.4f}", flush=True)

    times = []
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        params, opt_state, losses = step(
            params, opt_state, datas[i % len(datas)], sub
        )
        loss_val = float(losses["loss"])  # sync
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1] * 1000:.1f} ms loss={loss_val:.4f}",
              flush=True)
    assert np.isfinite(loss_val)
    print(f"steady-state: {np.median(times) * 1000:.1f} ms/step; "
          f"peak HBM {device_mem_usage():.2f} GiB", flush=True)


if __name__ == "__main__":
    main()

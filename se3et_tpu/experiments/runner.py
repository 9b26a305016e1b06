r"""Shared experiment entry points: trainval / test / eval / demo.

The reference ships four CLI scripts per experiment directory
(``trainval.py``, ``test.py``, ``eval.py``, ``demo.py`` — e.g.
``experiments/se3ete.3dmatch/``); here each directory's scripts are thin
wrappers over these functions, keyed by experiment name.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import os.path as osp

import numpy as np

from se3et_tpu.data import datasets as ds_lib
from se3et_tpu.data import influence as influence_lib
from se3et_tpu.data import pipeline as pipe_lib
from se3et_tpu.engine.tester import Tester, evaluate_benchmark
from se3et_tpu.engine.trainer import Trainer
from se3et_tpu.experiments.configs import ExperimentConfig
from se3et_tpu.utils.summary import get_logger


def synthetic_extent(dataset: str) -> float:
    """Scene extent for the synthetic fallback generator, per dataset family.

    3DMatch rooms span ~3-4 m (extent 2.0); ModelNet objects are unit-scale;
    raw KITTI frames are LiDAR-scale (extent 20), but the ``kitti_test``
    variant scales points by 0.1 (``kitti_test/dataset.py:87-111``) so its
    synthetic analog matches the scaled extent.  SINGLE source of truth —
    bench.py, the profilers, and the window-budget calibration scripts all
    build pairs through this map so drop rates match serving.
    """
    return {"threedmatch": 2.0, "kitti_test": 2.0, "modelnet": 0.8}.get(
        dataset, 20.0
    )


def build_dataset(cfg: ExperimentConfig, subset: str, training: bool):
    d = cfg.data
    if d.dataset == "threedmatch":
        meta = osp.join(d.dataset_root, "metadata", f"{subset}.pkl")
        if osp.isfile(meta):
            return ds_lib.ThreeDMatchPairDataset(
                d.dataset_root, subset,
                point_limit=d.point_limit if training else d.test_point_limit,
                use_augmentation=training and d.use_augmentation,
                augmentation_noise=d.augmentation_noise,
                augmentation_rotation=d.augmentation_rotation,
                rotated=d.rotated, z_rotated=d.z_rotated,
            )
    elif d.dataset in ("kitti", "kitti_test"):
        meta = osp.join(d.dataset_root, "metadata", f"{subset}.pkl")
        if osp.isfile(meta):
            cls = (
                ds_lib.OdometryKittiPairTestDataset
                if d.dataset == "kitti_test"
                else ds_lib.OdometryKittiPairDataset
            )
            # the KITTI .evalrot experiments stress equivariance by applying
            # the full training augmentation (rotation/scale/shift) to the
            # test split too (geotransformer.kitti.evalrot/dataset.py:87-92)
            augment = (training and d.use_augmentation) or (
                not training and d.rotated
            )
            return cls(
                d.dataset_root, subset,
                point_limit=d.point_limit if training else d.test_point_limit,
                use_augmentation=augment,
                augmentation_noise=d.augmentation_noise,
            )
    elif d.dataset == "modelnet":
        meta = osp.join(d.dataset_root, f"{subset}.pkl")
        if osp.isfile(meta):
            return ds_lib.ModelNetPairDataset(
                d.dataset_root, subset,
                num_points=d.point_limit or 1024,
                deterministic=not training,
            )
    logger = get_logger()
    logger.warning(
        f"dataset {d.dataset}/{subset} not found under {d.dataset_root}; "
        "falling back to the synthetic pair generator"
    )
    scale = synthetic_extent(d.dataset)
    return ds_lib.SyntheticPairDataset(
        num_pairs=32 if training else 8,
        num_points=min(d.point_limit or 6000, 6000),
        extent=scale,
        seed=0 if training else 1,
    )


def with_calibrated_limits(cfg: ExperimentConfig, max_pairs: int = 8):
    """Replace the pipeline's neighbor widths with calibrated ones.

    Mirrors the reference flow where every train/test loader first runs
    ``calibrate_neighbors_stack_mode`` over the train set
    (``dataset.py:21-27``, ``utils/data.py:212-252``).  The result is cached
    under ``output_dir`` so calibration runs once per experiment.
    """
    import dataclasses
    import json

    cache = osp.join(cfg.output_dir, "neighbor_limits.json")
    if osp.isfile(cache):
        with open(cache) as f:
            limits = tuple(json.load(f))
    else:
        train_ds = build_dataset(cfg, cfg.data.train_subset, training=True)
        sample = (
            (train_ds[i]["ref_points"], train_ds[i]["src_points"])
            for i in range(min(len(train_ds), max_pairs))
        )
        limits = pipe_lib.calibrate_neighbor_limits(sample, cfg.pipeline)
        os.makedirs(cfg.output_dir, exist_ok=True)
        with open(cache, "w") as f:
            json.dump(list(limits), f)
        get_logger().info(f"calibrated neighbor limits: {limits}")
    return dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, neighbor_limits=limits)
    )


def pyramid_loader(dataset, cfg: ExperimentConfig, with_meta=False, workers=4):
    """Generator of padded pyramid dicts, built in a worker pool and prefetched."""

    def build(i):
        item = dataset[i]
        data = pipe_lib.build_pair_pyramid(
            item["ref_points"], item["src_points"], item["transform"], cfg.pipeline
        )
        # geometry-only host precompute: conv influence weights (like the
        # p2n partition) — zero device cost, fp32-exact
        influence_lib.precompute_influence(data, cfg.model)
        meta = {k: v for k, v in item.items()
                if k not in ("ref_points", "src_points", "transform")}
        return (data, meta) if with_meta else data

    indices = list(range(len(dataset)))
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        futures = [ex.submit(build, i) for i in indices[: 2 * workers]]
        next_submit = len(futures)
        for i in range(len(indices)):
            yield futures[i].result()
            futures[i] = None
            if next_submit < len(indices):
                futures.append(ex.submit(build, indices[next_submit]))
                next_submit += 1


def run_trainval(cfg: ExperimentConfig, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--max_steps_per_epoch", type=int, default=None)
    parser.add_argument("--no_calibrate", action="store_true",
                        help="skip neighbor-limit calibration")
    args = parser.parse_args(argv)

    if not args.no_calibrate:
        cfg = with_calibrated_limits(cfg)
    optim = cfg.optim
    if args.max_epoch is not None:
        import dataclasses

        optim = dataclasses.replace(optim, max_epoch=args.max_epoch)

    train_ds = build_dataset(cfg, cfg.data.train_subset, training=True)
    val_ds = build_dataset(cfg, cfg.data.val_subset, training=False)

    trainer = Trainer(
        cfg.model, cfg.loss, cfg.eval, optim, cfg.output_dir, seed=cfg.seed,
        batch_size=cfg.data.batch_size,
    )
    steps = len(train_ds)
    if args.max_steps_per_epoch:
        steps = min(steps, args.max_steps_per_epoch)

    example = next(pyramid_loader(train_ds, cfg))
    trainer.initialize(example, steps_per_epoch=steps)

    def train_loader():
        gen = pyramid_loader(train_ds, cfg)
        for i, data in enumerate(gen):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            yield data

    def val_loader():
        gen = pyramid_loader(val_ds, cfg)
        for i, data in enumerate(gen):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            yield data

    trainer.run(train_loader, val_loader, resume=args.resume)
    return trainer


def _load_params(cfg: ExperimentConfig, snapshot: str | None):
    """Restore params from a snapshot dir, or fresh-init if none exists."""
    import jax
    import jax.numpy as jnp

    from se3et_tpu.nn.model import SE3ETModel

    ds = build_dataset(cfg, cfg.data.val_subset, training=False)
    example = next(pyramid_loader(ds, cfg))
    model = SE3ETModel(cfg.model)
    rngs = {
        "params": jax.random.PRNGKey(cfg.seed),
        "targets": jax.random.PRNGKey(cfg.seed + 1),
    }
    from se3et_tpu.nn.init_util import jit_init

    data = {k: jnp.asarray(v) for k, v in example.items()}
    params = jit_init(model, rngs, data, train=False, with_registration=False)
    if snapshot:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # restore without a target (raw pytree), then pick the params subtree
        state = ckptr.restore(osp.abspath(snapshot))
        if isinstance(state, dict) and "params" in state:
            state = state["params"]
        params = jax.tree_util.tree_map(jnp.asarray, state)
    return params


def apply_cfg_overrides(cfg: ExperimentConfig, overrides: dict) -> ExperimentConfig:
    """Apply dotted-key overrides (e.g. ``{"model.fine_topk": 2}``) to the
    frozen config tree — a working realization of the reference's latent
    ``--cfg_file``/``merge_from_file`` flag (``base_tester.py:31-33``)."""
    import dataclasses

    for key, value in overrides.items():
        parts = key.split(".")
        node_path = []
        node = cfg
        for p in parts[:-1]:
            node_path.append((node, p))
            node = getattr(node, p)
        node = dataclasses.replace(node, **{parts[-1]: value})
        for parent, name in reversed(node_path):
            node = dataclasses.replace(parent, **{name: node})
        cfg = node
    return cfg


def _resolve_snapshot(cfg: ExperimentConfig, args) -> str | None:
    """--snapshot | --test_epoch | --test_iter resolution
    (``base_tester.py:43-50``)."""
    if getattr(args, "snapshot", None):
        return args.snapshot
    snap_dir = osp.join(cfg.output_dir, "snapshots")
    if getattr(args, "test_epoch", None) is not None:
        return osp.join(snap_dir, f"epoch-{args.test_epoch}")
    if getattr(args, "test_iter", None) is not None:
        return osp.join(snap_dir, f"iter-{args.test_iter}")
    latest = osp.join(snap_dir, "latest")
    return latest if osp.isdir(latest) else None


def run_test(cfg: ExperimentConfig, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--snapshot", type=str, default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--test_iter", type=int, default=None)
    parser.add_argument("--cfg_file", type=str, default=None,
                        help="JSON file of dotted config overrides")
    parser.add_argument("--benchmark", type=str, default=None)
    parser.add_argument("--max_pairs", type=int, default=None)
    parser.add_argument("--no_calibrate", action="store_true",
                        help="skip neighbor-limit calibration")
    args = parser.parse_args(argv)

    if args.cfg_file:
        import json

        with open(args.cfg_file) as f:
            cfg = apply_cfg_overrides(cfg, json.load(f))
    if not args.no_calibrate:
        # the reference test loader recalibrates on the train set
        # (dataset.py:75-81); the cached limits keep train/test consistent
        cfg = with_calibrated_limits(cfg)
    benchmark = args.benchmark or cfg.data.benchmarks[0]
    params = _load_params(cfg, _resolve_snapshot(cfg, args))
    tester = Tester(cfg.model, cfg.eval, cfg.output_dir)
    tester.build(params)
    test_ds = build_dataset(cfg, benchmark, training=False)

    def loader():
        gen = pyramid_loader(test_ds, cfg, with_meta=True)
        for i, item in enumerate(gen):
            if args.max_pairs and i >= args.max_pairs:
                break
            yield item

    return tester.run(loader(), benchmark=benchmark)


def run_eval(cfg: ExperimentConfig, argv=None, pairwise: bool = False):
    """Offline eval over feature dumps (reference ``eval.py``; with
    ``pairwise=True``, the ``eval_dgr.py`` RRE/RTE-acceptance protocol)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", type=str, default=None)
    parser.add_argument("--method", type=str, default="lgr",
                        choices=["lgr", "ransac", "svd"])
    parser.add_argument("--num_corr", type=int, default=None,
                        help="keep only the top-N scoring correspondences")
    parser.add_argument("--test_epoch", type=int, default=None,
                        help="accepted for reference-CLI parity (dumps are "
                        "per-benchmark, not per-epoch)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    benchmark = args.benchmark or cfg.data.benchmarks[0]
    gt_root = osp.join(cfg.data.dataset_root, "metadata", "benchmarks", benchmark)
    result = evaluate_benchmark(
        osp.join(cfg.output_dir, "features"), benchmark, method=args.method,
        acceptance_radius=cfg.eval.acceptance_radius,
        rmse_threshold=cfg.eval.rmse_threshold,
        rre_threshold=cfg.eval.rre_threshold,
        rte_threshold=cfg.eval.rte_threshold,
        kitti_registration=cfg.eval.kitti_registration,
        gt_root=gt_root if osp.isdir(gt_root) else None,
        ransac_kwargs=dict(
            distance_threshold=cfg.eval.ransac_distance_threshold,
            num_points=cfg.eval.ransac_num_points,
            num_iterations=cfg.eval.ransac_num_iterations,
        ),
        num_corr=args.num_corr,
        pairwise_registration=pairwise,
    )
    logger = get_logger()
    for scene, vals in result.items():
        logger.info(f"{scene}: " + ", ".join(f"{k}={v:.4f}" for k, v in vals.items()))
    return result


def run_eval_dgr(cfg: ExperimentConfig, argv=None):
    """Reference ``eval_dgr.py``: same dumps, per-pair RRE/RTE acceptance."""
    return run_eval(cfg, argv, pairwise=True)


def run_demo(cfg: ExperimentConfig, argv=None):
    """Single-pair demo incl. the rotated-src equivariance check (``demo.py``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--snapshot", type=str, default=None)
    parser.add_argument("--src_file", type=str, default=None)
    parser.add_argument("--ref_file", type=str, default=None)
    parser.add_argument("--gt_file", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None,
                        help="where to write the demo PLYs "
                        "(default <output_dir>/demo)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from se3et_tpu.core import se3
    from se3et_tpu.nn import loss as loss_lib
    from se3et_tpu.nn.model import SE3ETModel

    if not args.src_file:
        # look for a shipped demo pair (reference format: data/demo/{src,ref,gt}.npy)
        for root in (osp.join(osp.dirname(cfg.data.dataset_root), "demo"),):
            if osp.isfile(osp.join(root, "src.npy")):
                args.src_file = osp.join(root, "src.npy")
                args.ref_file = osp.join(root, "ref.npy")
                args.gt_file = osp.join(root, "gt.npy")
                break
    if args.src_file and args.ref_file:
        src = np.load(args.src_file).astype(np.float32)
        ref = np.load(args.ref_file).astype(np.float32)
        gt = (
            np.load(args.gt_file).astype(np.float32)
            if args.gt_file
            else np.eye(4, dtype=np.float32)
        )
    else:
        item = ds_lib.SyntheticPairDataset(num_pairs=1, seed=7)[0]
        ref, src, gt = item["ref_points"], item["src_points"], item["transform"]

    params = _load_params(cfg, args.snapshot)
    logger = get_logger()

    from se3et_tpu.engine.tester import make_failsafe_forward

    def build_forward(model_cfg):
        from se3et_tpu.utils.jitopt import serving_jit_options

        model = SE3ETModel(model_cfg)
        return jax.jit(
            lambda p, data: model.apply(
                p, data, train=False, with_registration=True
            ),
            compiler_options=serving_jit_options(model_cfg),
        )

    forward = make_failsafe_forward(cfg.model, build_forward, logger=logger)

    from se3et_tpu.utils import pointcloud_io as pc_io

    out_dir = args.out_dir or osp.join(cfg.output_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)
    for tag, rot in (("original", np.eye(3)),
                     ("rotated src", np.asarray(
                         ds_lib.random_sample_rotation_v2(np.random.RandomState(3))))):
        src_r = (src @ rot.T).astype(np.float32)
        gt_r = gt.copy()
        gt_r[:3, :3] = gt[:3, :3] @ rot.T
        data = pipe_lib.build_pair_pyramid(ref, src_r, gt_r, cfg.pipeline)
        influence_lib.precompute_influence(data, cfg.model)
        out = forward(params, {k: jnp.asarray(v) for k, v in data.items()})
        rre, rte = se3.isotropic_transform_error(
            jnp.asarray(gt_r), out["estimated_transform"]
        )
        logger.info(f"demo [{tag}]: RRE {float(rre):.3f} deg, RTE {float(rte):.3f} m")
        if tag == "original":
            # visual artifacts (reference demo.py:103-156 renders these live;
            # headless here, so write PLYs): raw pair, registered pair with
            # the ESTIMATED transform applied to src, and correspondences
            est = np.asarray(out["estimated_transform"])
            cv = np.asarray(out["corr_valid"])
            src_reg = src_r @ est[:3, :3].T + est[:3, 3]
            red = np.tile([[220, 60, 60]], (len(ref), 1)).astype(np.uint8)
            blue = np.tile([[60, 100, 220]], (len(src_r), 1)).astype(np.uint8)
            pc_io.write_ply(osp.join(out_dir, "pair_raw.ply"),
                            np.concatenate([ref, src_r]),
                            np.concatenate([red, blue]))
            pc_io.write_ply(osp.join(out_dir, "pair_registered.ply"),
                            np.concatenate([ref, src_reg]),
                            np.concatenate([red, blue]))
            pc_io.write_correspondence_ply(
                osp.join(out_dir, "correspondences.ply"),
                np.asarray(out["ref_corr_points"])[cv],
                np.asarray(out["src_corr_points"])[cv],
            )
            logger.info(f"demo artifacts written to {out_dir}")
    return float(rre), float(rte)

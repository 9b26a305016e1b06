"""Experiment registry + KITTI evaluation protocol tests."""

import os
import os.path as osp
import pickle

import numpy as np

from se3et_tpu.experiments import EXPERIMENTS, make_cfg

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# every experiment dir the reference ships except debug/ (covered by
# scripts/check_equivariance.py)
REFERENCE_EXPERIMENTS = [
    "geotransformer.3dmatch",
    "geotransformer.3dmatch.evalrot",
    "geotransformer.kitti",
    "geotransformer.kitti.evalrot",
    "geotransformer.kitti.generalization_test",
    "geotransformer.kitti.test",
    "se3ete.3dmatch",
    "se3ete.3dmatch.evalrot",
    "se3ete2.3dmatch",
    "se3ete2.3dmatch.evalrot",
    "se3eti.3dmatch",
    "se3eti.3dmatch.evalrot",
    "se3eti.kitti",
    "se3eti.kitti.evalrot",
    "se3eti2.3dmatch",
    "se3eti2.3dmatch.evalkitti",
    "se3eti2.3dmatch.evalrot",
]


def test_all_reference_experiments_resolve():
    for name in REFERENCE_EXPERIMENTS:
        cfg = make_cfg(name)
        assert cfg.name == name
    assert set(REFERENCE_EXPERIMENTS) <= set(EXPERIMENTS)


def test_all_experiment_dirs_have_cli_scripts():
    """Every dir mirrors the reference's script surface, including the shell
    wrappers and eval_dgr.py exactly where the reference ships them."""
    ref_root = "/root/reference/experiments"
    for name in REFERENCE_EXPERIMENTS:
        d = osp.join(REPO, "experiments", name)
        assert osp.isdir(d), name
        for script in ("config.py", "trainval.py", "test.py", "eval.py", "demo.py"):
            assert osp.isfile(osp.join(d, script)), f"{name}/{script}"
        ref_dir = osp.join(ref_root, name)
        if osp.isdir(ref_dir):
            for script in ("eval.sh", "eval_all.sh", "eval_dgr.py",
                           "find_failure_case.sh"):
                if osp.isfile(osp.join(ref_dir, script)):
                    assert osp.isfile(osp.join(d, script)), f"{name}/{script}"


def test_geotransformer_kitti_config_matches_reference():
    """Spot-check against geotransformer.kitti/config.py values."""
    cfg = make_cfg("geotransformer.kitti")
    m = cfg.model
    assert m.backbone == "kpconv" and m.num_stages == 5
    assert m.init_radius == 4.25 * 0.3 and m.init_sigma == 2.0 * 0.3
    assert m.gt_input_dim == 2048 and m.gt_hidden_dim == 128
    assert m.sigma_d == 4.8 and m.num_points_in_patch == 128
    assert m.fine_topk == 2 and m.acceptance_radius == 0.6
    assert cfg.eval.kitti_registration
    assert cfg.eval.rre_threshold == 5.0 and cfg.eval.rte_threshold == 2.0
    assert cfg.optim.max_epoch == 160 and cfg.optim.lr_decay_steps == 4
    assert cfg.loss.log_scale == 40.0 and cfg.loss.fine_positive_radius == 0.6


def test_geotransformer_kitti_scaled_configs():
    """geotransformer.kitti.{test,generalization_test}: 3DMatch-shaped model
    over x0.1 KITTI (config.py diffs vs the KITTI base)."""
    t = make_cfg("geotransformer.kitti.test")
    g = make_cfg("geotransformer.kitti.generalization_test")
    for cfg in (t, g):
        assert cfg.model.num_stages == 4 and cfg.model.backbone == "kpconv"
        assert cfg.model.init_radius == 2.5 * 0.025
        assert cfg.model.gt_input_dim == 1024 and cfg.model.sigma_d == 0.2
        assert cfg.data.dataset == "kitti_test"
        assert cfg.data.point_limit == 10000
        assert cfg.eval.rte_threshold == 0.2 and cfg.eval.kitti_registration
    assert t.eval.acceptance_radius == 1.0
    assert g.eval.acceptance_radius == 0.1
    assert g.eval.ransac_distance_threshold == 0.03


def _write_fake_dump(path, rre_deg, rte, n=50, seed=0):
    """A feature dump whose stored transform errs from gt by (rre, rte)."""
    rng = np.random.RandomState(seed)
    gt = np.eye(4, dtype=np.float32)
    angle = np.radians(rre_deg)
    c, s = np.cos(angle), np.sin(angle)
    est = np.array(
        [[c, -s, 0, rte], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    pts = rng.randn(n, 3).astype(np.float32)
    np.savez_compressed(
        path,
        ref_points=pts, src_points=pts,
        ref_corr_points=pts, src_corr_points=pts,
        corr_scores=np.ones(n, np.float32),
        gt_transform=gt, estimated_transform=est,
        ref_frame=0, src_frame=1, num_fragments=2,
    )


def test_kitti_eval_protocol(tmp_path):
    """RR = (RRE<5 deg AND RTE<2 m), pair-averaged with no scene grouping
    (se3eti.kitti/eval.py:120-140)."""
    from se3et_tpu.engine.tester import evaluate_benchmark

    root = tmp_path / "features" / "test"
    # two "scenes" (sequences) with different pair counts: pair-averaging
    # must weight by pairs, not scenes
    os.makedirs(root / "08")
    os.makedirs(root / "09")
    _write_fake_dump(root / "08" / "0_1.npz", rre_deg=1.0, rte=0.5)   # ok
    _write_fake_dump(root / "08" / "1_2.npz", rre_deg=10.0, rte=0.5)  # rre fail
    _write_fake_dump(root / "08" / "2_3.npz", rre_deg=1.0, rte=3.0)   # rte fail
    _write_fake_dump(root / "09" / "0_1.npz", rre_deg=0.0, rte=0.0)   # ok

    result = evaluate_benchmark(
        str(tmp_path / "features"), "test", method="lgr",
        acceptance_radius=1.0, rre_threshold=5.0, rte_threshold=2.0,
        kitti_registration=True,
    )
    assert result["overall"]["RR"] == 0.5  # 2 of 4 pairs, not mean of scenes
    assert result["08"]["RR"] == 1.0 / 3.0
    assert "RMSE" not in result["overall"]


def test_kitti_test_dataset_scaling(tmp_path):
    """OdometryKittiPairTestDataset: 30 m near-range filter + x0.1 scaling of
    points and gt translation (kitti_test/dataset.py:87-111)."""
    from se3et_tpu.data.datasets import OdometryKittiPairTestDataset

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "metadata")
    os.makedirs(tmp_path / "clouds")
    near = rng.uniform(-20, 20, size=(300, 3))
    far = rng.uniform(40, 60, size=(100, 3))
    cloud = np.concatenate([near, far], 0).astype(np.float32)
    np.save(tmp_path / "clouds" / "a.npy", cloud)
    np.save(tmp_path / "clouds" / "b.npy", cloud)
    tf = np.eye(4)
    tf[:3, 3] = [10.0, 0.0, 0.0]
    meta = [dict(seq_id="08", frame0=0, frame1=1, pcd0="clouds/a.npy",
                 pcd1="clouds/b.npy", transform=tf)]
    with open(tmp_path / "metadata" / "test.pkl", "wb") as f:
        pickle.dump(meta, f)

    ds = OdometryKittiPairTestDataset(str(tmp_path), "test", point_limit=200)
    item = ds[0]
    # subsampled to the limit, far returns dropped, scaled by 0.1
    assert item["ref_points"].shape == (200, 3)
    assert np.linalg.norm(item["ref_points"], axis=1).max() < 30 * 0.1 * np.sqrt(3)
    np.testing.assert_allclose(item["transform"][:3, 3], [1.0, 0.0, 0.0], atol=1e-6)


def test_neighbor_limit_calibration_cached(tmp_path, monkeypatch):
    """with_calibrated_limits: computes widths from the train set once,
    caches under output_dir (utils/data.py:212-252 semantics)."""
    import dataclasses
    import json

    from se3et_tpu.data.pipeline import PyramidConfig
    from se3et_tpu.engine.trainer import OptimConfig
    from se3et_tpu.experiments import configs as cfg_lib
    from se3et_tpu.experiments import runner
    from se3et_tpu.nn import loss as loss_lib
    from se3et_tpu.nn.model import ModelConfig

    cfg = cfg_lib.ExperimentConfig(
        name="tiny.calib", seed=0,
        data=cfg_lib.DataConfig(dataset="synthetic", dataset_root=str(tmp_path),
                                point_limit=500, benchmarks=("test",)),
        pipeline=PyramidConfig(
            num_stages=3, voxel_size=0.1, search_radius=0.25,
            neighbor_limits=(10, 10, 10), stage_caps=(512, 256, 96),
            coarse_point_cap=96,
        ),
        model=ModelConfig(), loss=loss_lib.LossConfig(),
        eval=loss_lib.EvalConfig(), optim=OptimConfig(),
    )
    outdir = str(tmp_path / "output")
    monkeypatch.setattr(cfg_lib.ExperimentConfig, "output_dir",
                        property(lambda self: outdir))
    cal = runner.with_calibrated_limits(cfg, max_pairs=2)
    limits = cal.pipeline.neighbor_limits
    assert len(limits) == 3 and all(x >= 1 for x in limits)
    with open(osp.join(outdir, "neighbor_limits.json")) as f:
        assert tuple(json.load(f)) == limits
    # second call hits the cache (poison the dataset to prove no recompute)
    cal2 = runner.with_calibrated_limits(
        dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, dataset="kitti"))
    )
    assert cal2.pipeline.neighbor_limits == limits


def test_real_dataset_auto_activation(tmp_path):
    """build_dataset switches from the synthetic fallback to the real
    3DMatch/KITTI loaders as soon as metadata appears on disk (VERDICT
    standing item: real-data activation must work unattended)."""
    import dataclasses

    import numpy as np

    from se3et_tpu.data import datasets as ds_lib
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.experiments.runner import build_dataset

    cfg = make_cfg("se3ete.3dmatch")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset_root=str(tmp_path))
    )
    # no metadata on disk -> synthetic fallback
    ds = build_dataset(cfg, "train", training=True)
    assert isinstance(ds, ds_lib.SyntheticPairDataset)

    # drop minimal metadata + clouds -> the real loader activates and loads
    os.makedirs(tmp_path / "metadata")
    os.makedirs(tmp_path / "data")
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    np.save(tmp_path / "data" / "frag0.npy", pts)
    np.save(tmp_path / "data" / "frag1.npy", pts)
    meta = [dict(overlap=0.6, pcd0="frag0.npy", pcd1="frag1.npy",
                 scene_name="scene1", frag_id0=0, frag_id1=1,
                 rotation=np.eye(3), translation=np.zeros(3))]
    with open(tmp_path / "metadata" / "train.pkl", "wb") as f:
        pickle.dump(meta, f)
    ds = build_dataset(cfg, "train", training=False)
    assert isinstance(ds, ds_lib.ThreeDMatchPairDataset)
    item = ds[0]
    assert item["ref_points"].shape[1] == 3
    assert item["transform"].shape == (4, 4)

    # KITTI family: metadata presence activates the odometry loader
    kcfg = make_cfg("se3eti.kitti")
    kcfg = dataclasses.replace(
        kcfg, data=dataclasses.replace(kcfg.data, dataset_root=str(tmp_path))
    )
    ds = build_dataset(kcfg, "train", training=True)
    assert isinstance(ds, ds_lib.OdometryKittiPairDataset)

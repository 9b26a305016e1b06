"""Integration test of the experiment API: trainval -> test -> eval roundtrip.

Exercises the same CLI surface the reference exposes per experiment
(`trainval.py`, `test.py --benchmark`, `eval.py --method`), on a tiny
synthetic-config experiment, entirely on CPU.
"""

import dataclasses
import os.path as osp

import numpy as np
import pytest

from se3et_tpu.data.pipeline import PyramidConfig
from se3et_tpu.engine.trainer import OptimConfig
from se3et_tpu.experiments import configs as cfg_lib
from se3et_tpu.experiments import runner
from se3et_tpu.nn import loss as loss_lib
from se3et_tpu.nn.epn import EPNConfig
from se3et_tpu.nn.model import ModelConfig


def _tiny_experiment(tmp_path):
    model = ModelConfig(
        backbone="e2pn", num_stages=2, init_dim=8, output_dim=16,
        init_radius=0.25, init_sigma=0.2, group_norm=4,
        epn=EPNConfig(kanchor=6, quotient_factor=4),
        gt_input_dim=16, gt_hidden_dim=16, gt_output_dim=16, num_heads=2,
        blocks=("self_eq", "cross"),
        ground_truth_matching_radius=0.1, num_points_in_patch=8,
        num_sinkhorn_iterations=5, num_targets=8, num_correspondences=16,
        gt_candidates=8, correspondence_limit=64, acceptance_radius=0.15,
    )
    cfg = cfg_lib.ExperimentConfig(
        name="tiny.synthetic",
        seed=1,
        data=cfg_lib.DataConfig(
            dataset="synthetic", dataset_root=str(tmp_path), point_limit=400,
            benchmarks=("test",),
        ),
        pipeline=PyramidConfig(
            num_stages=2, voxel_size=0.1, search_radius=0.25,
            neighbor_limits=(10, 10), stage_caps=(320, 96),
            coarse_point_cap=96,
        ),
        model=model,
        loss=loss_lib.LossConfig(fine_positive_radius=0.1, kanchor=6),
        eval=loss_lib.EvalConfig(acceptance_radius=0.15),
        optim=OptimConfig(max_epoch=1),
    )
    return cfg, str(tmp_path / "output")


@pytest.mark.slow
def test_trainval_test_eval_roundtrip(tmp_path, monkeypatch):
    cfg, outdir = _tiny_experiment(tmp_path)
    monkeypatch.setattr(
        cfg_lib.ExperimentConfig, "output_dir",
        property(lambda self: outdir),
    )

    trainer = runner.run_trainval(cfg, ["--max_epoch", "1", "--max_steps_per_epoch", "2"])
    assert trainer.epoch == 1
    assert osp.isdir(osp.join(outdir, "snapshots", "latest"))

    summary = runner.run_test(
        cfg, ["--snapshot", osp.join(outdir, "snapshots", "latest"), "--max_pairs", "2"]
    )
    assert "RR" in summary and np.isfinite(summary["RRE"])

    result = runner.run_eval(cfg, ["--benchmark", "test", "--method", "svd"])
    assert "overall" in result
    assert np.isfinite(result["overall"]["RRE"])
    # offline coarse metrics (reference eval.py:139-149, 244-253)
    for key in ("PIR", "PMR>0", "PMR>=0.1", "PMR>=0.3", "PMR>=0.5"):
        assert key in result["overall"], key
        assert 0.0 <= result["overall"][key] <= 1.0

    result_ransac = runner.run_eval(
        cfg, ["--benchmark", "test", "--method", "ransac", "--num_corr", "8"]
    )
    assert np.isfinite(result_ransac["overall"]["RRE"])

    # eval_dgr protocol: pairwise RRE/RTE acceptance over the same dumps
    result_dgr = runner.run_eval_dgr(cfg, ["--benchmark", "test", "--method", "svd"])
    assert "RR" in result_dgr["overall"]
    assert "RMSE" not in result_dgr["overall"]

    # demo writes registered-pair + correspondence artifacts
    runner.run_demo(cfg, ["--snapshot", osp.join(outdir, "snapshots", "latest")])
    for f in ("pair_raw.ply", "pair_registered.ply", "correspondences.ply"):
        assert osp.isfile(osp.join(outdir, "demo", f)), f

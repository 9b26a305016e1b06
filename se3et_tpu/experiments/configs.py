r"""Experiment configuration registry.

Replaces the reference's 18 copy-pasted per-experiment ``config.py`` trees
(``experiments/<name>/config.py``) with a single registry of composed
dataclasses.  Every reference experiment name resolves here; the per-directory
``config.py`` under ``experiments/`` simply re-exports ``make_cfg`` for its
name, preserving the reference CLI/API layout.

Values mirror the reference configs exactly where they exist (cited per
builder); TPU-specific additions are the static shape buckets
(``PyramidConfig.stage_caps``) and the fixed LGR correspondence budget (the
reference's ``correspondence_limit=None`` means "unbounded", realized here as a
generous fixed cap).
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from typing import Optional

from se3et_tpu.data.pipeline import PyramidConfig
from se3et_tpu.engine.trainer import OptimConfig
from se3et_tpu.nn import loss as loss_lib
from se3et_tpu.nn.epn import EPNConfig
from se3et_tpu.nn.model import ModelConfig

REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "threedmatch"  # 'threedmatch' | 'kitti' | 'modelnet' | 'synthetic'
    dataset_root: str = osp.join(REPO_ROOT, "data", "3DMatch")
    train_subset: str = "train"
    val_subset: str = "val"
    benchmarks: tuple[str, ...] = ("3DMatch", "3DLoMatch")
    point_limit: Optional[int] = 20000
    test_point_limit: Optional[int] = None
    # pairs per train step on ONE device (vmapped; reference train.batch_size,
    # configs/cfg 'train.batch_size=1').  Multi-device DP shards pairs across
    # chips independently of this.
    batch_size: int = 1
    use_augmentation: bool = True
    augmentation_noise: float = 0.005
    augmentation_rotation: float = 1.0
    rotated: bool = False
    z_rotated: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    seed: int
    data: DataConfig
    pipeline: PyramidConfig
    model: ModelConfig
    loss: loss_lib.LossConfig
    eval: loss_lib.EvalConfig
    optim: OptimConfig

    @property
    def output_dir(self) -> str:
        return osp.join(REPO_ROOT, "output", self.name)


SE3ET_E_BLOCKS = (
    "self_eq", "cross_a_soft", "self_eq", "cross_r_soft",
    "self", "cross", "self", "cross", "self", "cross",
)
SE3ET_I_BLOCKS = ("self_eq", "cross", "self_eq", "cross", "self_eq", "cross")
GEO_BLOCKS = ("self", "cross", "self", "cross", "self", "cross")


def _threedmatch_pipeline(point_cap: int) -> PyramidConfig:
    # init_voxel_size 0.025, base_radius 2.5 (se3ete.3dmatch/config.py:79-84)
    return PyramidConfig(
        num_stages=4,
        voxel_size=0.025,
        search_radius=0.0625,
        neighbor_limits=(38, 36, 36, 38),  # reference demo.py:53 calibration
        stage_caps=(point_cap, point_cap // 2, point_cap // 8, 1024),
        # lane-aligned coarse stage (was 1000): N=M=1024 lets the flash RPE
        # self-attention, embedding, and Sinkhorn kernels tile at 128/256
        # without ragged tails, and keeps 24 more real nodes
        coarse_point_cap=1024,
        input_dim=1,
        # fused-conv window budgets per neighbor set (64-query blocks, 16-row segments): the
        # kernel cost scales with window width while drops are set-dependent
        # (coarser stages fragment more across Morton segments).  Calibrated
        # by scripts/calibrate_window_budgets.py at production scale
        # (<= 0.5% drops per set; cumulative W cuts: 128 -> 64-row segments
        # 20-42%, 64 -> 32 ~15%, 32 -> 16 a further 17-25% — see BENCH.md).
        window_segments_by_set=(
            ("neighbors_0", 32), ("subsampling_0", 48),
            ("neighbors_1", 96), ("subsampling_1", 160),
            ("neighbors_2", 96), ("subsampling_2", 128),
            ("neighbors_3", 24),
        ),
        # per-set granularity (scripts/sweep_sseg.py + chip A/B, round 5):
        # 8-row segments on the stage-0 sets (W 384 -> 256 / 512 -> 384),
        # 4-row on the stage-1/2 sets (W 512 -> 384, 768 -> 640, 512 -> 384,
        # 640 -> 512 at the same <= 0.5% drops).  Fine granularity is
        # affordable because segment_window_gather's row-gather path costs
        # no FLOPs in the slot count (one-hot FLOPs quadruple at sseg=4):
        # measured 66.9 vs 67.7 ms end-to-end (BENCH.md round 5).
        window_sseg_by_set=(
            ("neighbors_0", 8), ("subsampling_0", 8),
            ("neighbors_1", 4), ("subsampling_1", 4),
            ("neighbors_2", 4), ("subsampling_2", 4),
        ),
        patch_k=64,  # = num_points_in_patch (host-side p2n precompute)
        # per-set neighbor-H caps: conv/influence cost is linear in the padded
        # H, but the calibrated neighbor_limits are tail-quantile worst cases.
        # Truncating the distance-sorted rows drops only the farthest =
        # lowest-influence entries; caps chosen by scripts/calibrate_h_caps.py
        # at <= 0.5% dropped influence mass per set (3DMatch-scale synthetic).
        neighbor_h_caps_by_set=(
            ("neighbors_0", 24), ("subsampling_0", 24),
            ("neighbors_1", 32), ("subsampling_1", 32),
        ),
    )


def _kitti_pipeline(point_cap: int) -> PyramidConfig:
    # init_voxel_size 0.3, base_radius 4.25, 5 stages (se3eti.kitti/config.py)
    return PyramidConfig(
        num_stages=5,
        voxel_size=0.3,
        search_radius=1.275,
        neighbor_limits=(38, 36, 36, 38, 36),
        stage_caps=(point_cap, point_cap // 2, point_cap // 4, point_cap // 8, 1024),
        coarse_point_cap=1024,
        input_dim=1,
        # fused-conv window budgets (64-query blocks, 16-row segments), calibrated by
        # scripts/calibrate_window_budgets.py on the LiDAR-scale (extent 20)
        # synthetic generator at <= 0.5% drops per set; re-measure when real
        # KITTI appears (pipeline logs drop stats automatically).
        window_segments_by_set=(
            ("neighbors_0", 48), ("subsampling_0", 96),
            ("neighbors_1", 96), ("subsampling_1", 128),
            ("neighbors_2", 96), ("subsampling_2", 160),
            ("neighbors_3", 24), ("subsampling_3", 32),
            ("neighbors_4", 16),
        ),
        # per-set granularity (sweep_sseg.py --exp se3eti.kitti, round 5):
        # 8-row on neighbors_0 (512 -> 384); 4-row on subsampling_0
        # (512 -> 384), neighbors_1/2 (512 -> 384), subsampling_1
        # (640 -> 512), subsampling_2 (768 -> 640) — all <= 0.5% drops.
        # Affordable under the per-shape row-gather (windowed_conv).
        window_sseg_by_set=(
            ("neighbors_0", 8), ("subsampling_0", 4),
            ("neighbors_1", 4), ("neighbors_2", 4),
            ("subsampling_1", 4), ("subsampling_2", 4),
        ),
        patch_k=128,  # = num_points_in_patch (host-side p2n precompute)
        # LiDAR rows run near-full (scripts/calibrate_h_caps.py: <= 0.5%
        # influence mass only at full H for every other set).
        neighbor_h_caps_by_set=(("subsampling_0", 32),),
    )


def _se3et_3dmatch(
    name: str,
    blocks,
    point_limit: int,
    init_dim: int = 64,
    output_dim: int = 256,
    hidden: int = 256,
    group_norm: int = 32,
    n_level_equiv: int = 0,
    attn_r_positive: str = "sq",
    attn_r_positive_rot_supervise: str = "sigmoid",
    rotated: bool = False,
    dataset: str = "threedmatch",
    steerability: str = "exact",
) -> ExperimentConfig:
    epn = EPNConfig(
        kanchor=6, quotient_factor=4, num_kernel_points=15, steerability=steerability
    )
    model = ModelConfig(
        compute_dtype="bfloat16",
        backbone="e2pn",
        num_stages=4,
        init_dim=init_dim,
        output_dim=output_dim,
        kernel_size=15,
        init_radius=0.0625,
        init_sigma=0.05,
        group_norm=group_norm,
        epn=epn,
        gt_input_dim=init_dim * 16,
        gt_hidden_dim=hidden,
        gt_output_dim=hidden,
        num_heads=4,
        blocks=tuple(blocks),
        sigma_d=0.2,
        sigma_a=15.0,
        angle_k=3,
        n_level_equiv=n_level_equiv,
        attn_r_positive=attn_r_positive,
        attn_r_positive_rot_supervise=attn_r_positive_rot_supervise,
        ground_truth_matching_radius=0.05,
        num_points_in_patch=64,
        num_sinkhorn_iterations=100,
        num_targets=128,
        overlap_threshold=0.1,
        num_correspondences=256,
        fine_topk=3,
        acceptance_radius=0.1,
        confidence_threshold=0.05,
        correspondence_threshold=3,
        correspondence_limit=2048,
        num_refinement_steps=5,
    )
    return ExperimentConfig(
        name=name,
        seed=7351,
        data=DataConfig(
            dataset=dataset, point_limit=point_limit, rotated=rotated
        ),
        pipeline=_threedmatch_pipeline(min(point_limit, 24576)),
        model=model,
        loss=loss_lib.LossConfig(
            positive_margin=0.1, negative_margin=1.4, positive_optimal=0.1,
            negative_optimal=1.4, log_scale=24.0, positive_overlap=0.1,
            fine_positive_radius=0.05, kanchor=6,
        ),
        eval=loss_lib.EvalConfig(
            acceptance_overlap=0.0, acceptance_radius=0.1, rmse_threshold=0.2,
            rre_threshold=15.0, rte_threshold=0.3,
        ),
        optim=OptimConfig(
            lr=1e-4, lr_decay=0.95, lr_decay_steps=1, weight_decay=1e-6,
            max_epoch=40,
        ),
    )


def _geotransformer_3dmatch(name: str, rotated: bool = False) -> ExperimentConfig:
    model = ModelConfig(
        compute_dtype="bfloat16",
        backbone="kpconv",
        num_stages=4,
        init_dim=64,
        output_dim=256,
        kernel_size=15,
        init_radius=0.0625,
        init_sigma=0.05,
        group_norm=32,
        epn=EPNConfig(kanchor=1, quotient_factor=1),
        gt_input_dim=1024,
        gt_hidden_dim=256,
        gt_output_dim=256,
        num_heads=4,
        blocks=GEO_BLOCKS,
        sigma_d=0.2,
        sigma_a=15.0,
        angle_k=3,
        ground_truth_matching_radius=0.05,
        num_points_in_patch=64,
        num_sinkhorn_iterations=100,
        num_targets=128,
        num_correspondences=256,
        fine_topk=3,
        acceptance_radius=0.1,
        correspondence_limit=2048,
    )
    return ExperimentConfig(
        name=name,
        seed=7351,
        data=DataConfig(point_limit=30000, rotated=rotated),
        pipeline=_threedmatch_pipeline(24576),
        model=model,
        loss=loss_lib.LossConfig(fine_positive_radius=0.05, kanchor=1),
        eval=loss_lib.EvalConfig(),
        optim=OptimConfig(max_epoch=40),
    )


def _se3et_kitti(name: str, rotated: bool = False) -> ExperimentConfig:
    epn = EPNConfig(kanchor=6, quotient_factor=4, num_kernel_points=15)
    model = ModelConfig(
        compute_dtype="bfloat16",
        backbone="e2pn",
        num_stages=5,
        init_dim=64,
        output_dim=256,
        kernel_size=15,
        init_radius=1.275,  # base_radius 4.25 * voxel 0.3
        init_sigma=0.6,  # base_sigma 2.0 * voxel 0.3
        group_norm=32,
        epn=epn,
        gt_input_dim=2048,
        gt_hidden_dim=128,
        gt_output_dim=256,
        num_heads=4,
        blocks=SE3ET_I_BLOCKS,
        sigma_d=4.8,
        sigma_a=15.0,
        angle_k=3,
        attn_r_positive="softplus",
        attn_r_positive_rot_supervise="minus",
        ground_truth_matching_radius=0.6,
        num_points_in_patch=128,
        num_sinkhorn_iterations=100,
        num_targets=128,
        num_correspondences=256,
        fine_topk=2,
        acceptance_radius=0.6,
        correspondence_limit=2048,
    )
    return ExperimentConfig(
        name=name,
        seed=7351,
        data=DataConfig(
            dataset="kitti",
            dataset_root=osp.join(REPO_ROOT, "data", "Kitti"),
            benchmarks=("test",),
            point_limit=10000,
            augmentation_noise=0.01,
            rotated=rotated,
        ),
        pipeline=_kitti_pipeline(10240),
        model=model,
        loss=loss_lib.LossConfig(
            log_scale=40.0, fine_positive_radius=0.6, kanchor=6
        ),
        eval=loss_lib.EvalConfig(
            acceptance_radius=1.0, rre_threshold=5.0, rte_threshold=2.0,
            kitti_registration=True,
            ransac_distance_threshold=0.3, ransac_num_points=4,
        ),
        optim=OptimConfig(lr=1e-4, lr_decay=0.95, lr_decay_steps=4, max_epoch=160),
    )


def _geotransformer_kitti(name: str, rotated: bool = False) -> ExperimentConfig:
    """GeoTransformer baseline on KITTI (``geotransformer.kitti/config.py``):
    5-stage KPConv-FPN, voxel 0.3, transformer 2048/128/256, sigma_d 4.8."""
    model = ModelConfig(
        compute_dtype="bfloat16",
        backbone="kpconv",
        num_stages=5,
        init_dim=64,
        output_dim=256,
        kernel_size=15,
        init_radius=1.275,  # base_radius 4.25 * voxel 0.3 (config.py:81-83)
        init_sigma=0.6,
        group_norm=32,
        epn=EPNConfig(kanchor=1, quotient_factor=1),
        gt_input_dim=2048,
        gt_hidden_dim=128,
        gt_output_dim=256,
        num_heads=4,
        blocks=GEO_BLOCKS,
        sigma_d=4.8,
        sigma_a=15.0,
        angle_k=3,
        ground_truth_matching_radius=0.6,
        num_points_in_patch=128,
        num_sinkhorn_iterations=100,
        num_targets=128,
        num_correspondences=256,
        fine_topk=2,
        acceptance_radius=0.6,
        correspondence_limit=2048,
    )
    return ExperimentConfig(
        name=name,
        seed=7351,
        data=DataConfig(
            dataset="kitti",
            dataset_root=osp.join(REPO_ROOT, "data", "Kitti"),
            benchmarks=("test",),
            point_limit=30000,
            augmentation_noise=0.01,
            rotated=rotated,
        ),
        pipeline=_kitti_pipeline(24576),
        model=model,
        loss=loss_lib.LossConfig(
            log_scale=40.0, fine_positive_radius=0.6, kanchor=1
        ),
        eval=loss_lib.EvalConfig(
            acceptance_radius=1.0, rre_threshold=5.0, rte_threshold=2.0,
            kitti_registration=True,
            ransac_distance_threshold=0.3, ransac_num_points=4,
        ),
        optim=OptimConfig(lr=1e-4, lr_decay=0.95, lr_decay_steps=4, max_epoch=160),
    )


def _geotransformer_kitti_scaled(name: str, generalization: bool) -> ExperimentConfig:
    """3DMatch-shaped GeoTransformer evaluated on x0.1-scaled KITTI
    (``geotransformer.kitti.test/config.py`` and
    ``geotransformer.kitti.generalization_test/config.py``): 4-stage backbone
    at voxel 0.025 over ``OdometryKittiPairTestDataset``."""
    model = ModelConfig(
        compute_dtype="bfloat16",
        backbone="kpconv",
        num_stages=4,
        init_dim=64,
        output_dim=256,
        kernel_size=15,
        init_radius=0.0625,  # base_radius 2.5 * voxel 0.025
        init_sigma=0.05,
        group_norm=32,
        epn=EPNConfig(kanchor=1, quotient_factor=1),
        gt_input_dim=1024,
        gt_hidden_dim=256,
        gt_output_dim=256,
        num_heads=4,
        blocks=GEO_BLOCKS,
        sigma_d=0.2,
        sigma_a=15.0,
        angle_k=3,
        ground_truth_matching_radius=0.05,
        num_points_in_patch=64,
        num_sinkhorn_iterations=100,
        num_targets=128,
        num_correspondences=256,
        # fine_matching section is unchanged from the KITTI base config in the
        # reference (topk 2, acceptance 0.6)
        fine_topk=2,
        acceptance_radius=0.6,
        correspondence_limit=2048,
    )
    return ExperimentConfig(
        name=name,
        seed=7351,
        data=DataConfig(
            dataset="kitti_test",
            dataset_root=osp.join(REPO_ROOT, "data", "Kitti"),
            benchmarks=("test",),
            point_limit=10000,
            test_point_limit=10000,
            augmentation_noise=0.005 if generalization else 0.01,
        ),
        pipeline=_threedmatch_pipeline(10240),
        model=model,
        loss=loss_lib.LossConfig(
            log_scale=40.0, fine_positive_radius=0.6, kanchor=1
        ),
        eval=loss_lib.EvalConfig(
            acceptance_radius=0.1 if generalization else 1.0,
            rmse_threshold=0.2,
            rre_threshold=5.0,
            rte_threshold=0.2,
            kitti_registration=True,
            ransac_distance_threshold=0.03 if generalization else 0.3,
            ransac_num_points=4,
        ),
        optim=OptimConfig(lr=1e-4, lr_decay=0.95, lr_decay_steps=1, max_epoch=40),
    )


def _build_registry():
    reg = {}
    reg["se3ete.3dmatch"] = lambda: _se3et_3dmatch(
        "se3ete.3dmatch", SE3ET_E_BLOCKS, 20000, n_level_equiv=2
    )
    reg["se3ete.3dmatch.evalrot"] = lambda: _se3et_3dmatch(
        "se3ete.3dmatch.evalrot", SE3ET_E_BLOCKS, 20000, n_level_equiv=2, rotated=True
    )
    reg["se3eti.3dmatch"] = lambda: _se3et_3dmatch(
        "se3eti.3dmatch", SE3ET_I_BLOCKS, 10000,
        attn_r_positive="softplus", attn_r_positive_rot_supervise="minus",
    )
    reg["se3eti.3dmatch.evalrot"] = lambda: _se3et_3dmatch(
        "se3eti.3dmatch.evalrot", SE3ET_I_BLOCKS, 10000,
        attn_r_positive="softplus", attn_r_positive_rot_supervise="minus",
        rotated=True,
    )
    reg["se3ete2.3dmatch"] = lambda: _se3et_3dmatch(
        "se3ete2.3dmatch", SE3ET_E_BLOCKS, 30000, init_dim=32, output_dim=128,
        hidden=128, group_norm=16, n_level_equiv=2,
    )
    reg["se3ete2.3dmatch.evalrot"] = lambda: _se3et_3dmatch(
        "se3ete2.3dmatch.evalrot", SE3ET_E_BLOCKS, 30000, init_dim=32,
        output_dim=128, hidden=128, group_norm=16, n_level_equiv=2, rotated=True,
    )
    reg["se3eti2.3dmatch"] = lambda: _se3et_3dmatch(
        "se3eti2.3dmatch", SE3ET_I_BLOCKS, 30000, init_dim=32, output_dim=128,
        hidden=128, group_norm=16,
        attn_r_positive="softplus", attn_r_positive_rot_supervise="minus",
    )
    reg["se3eti2.3dmatch.evalrot"] = lambda: _se3et_3dmatch(
        "se3eti2.3dmatch.evalrot", SE3ET_I_BLOCKS, 30000, init_dim=32,
        output_dim=128, hidden=128, group_norm=16,
        attn_r_positive="softplus", attn_r_positive_rot_supervise="minus",
        rotated=True,
    )
    reg["se3eti2.3dmatch.evalkitti"] = lambda: dataclasses.replace(
        reg["se3eti2.3dmatch"](),
        name="se3eti2.3dmatch.evalkitti",
        data=DataConfig(
            dataset="kitti",
            dataset_root=osp.join(REPO_ROOT, "data", "Kitti"),
            benchmarks=("test",),
            point_limit=30000,
        ),
    )
    reg["se3eti.kitti"] = lambda: _se3et_kitti("se3eti.kitti")
    reg["se3eti.kitti.evalrot"] = lambda: _se3et_kitti(
        "se3eti.kitti.evalrot", rotated=True
    )
    reg["geotransformer.3dmatch"] = lambda: _geotransformer_3dmatch(
        "geotransformer.3dmatch"
    )
    reg["geotransformer.3dmatch.evalrot"] = lambda: _geotransformer_3dmatch(
        "geotransformer.3dmatch.evalrot", rotated=True
    )
    reg["geotransformer.kitti"] = lambda: _geotransformer_kitti(
        "geotransformer.kitti"
    )
    reg["geotransformer.kitti.evalrot"] = lambda: _geotransformer_kitti(
        "geotransformer.kitti.evalrot", rotated=True
    )
    reg["geotransformer.kitti.test"] = lambda: _geotransformer_kitti_scaled(
        "geotransformer.kitti.test", generalization=False
    )
    reg["geotransformer.kitti.generalization_test"] = (
        lambda: _geotransformer_kitti_scaled(
            "geotransformer.kitti.generalization_test", generalization=True
        )
    )
    return reg


EXPERIMENTS = _build_registry()


def make_cfg(name: str) -> ExperimentConfig:
    """Resolve an experiment name to its full config (reference ``make_cfg``)."""
    if name not in EXPERIMENTS:
        raise KeyError(
            f"unknown experiment {name!r}; available: {sorted(EXPERIMENTS)}"
        )
    return EXPERIMENTS[name]()

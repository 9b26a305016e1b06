r"""The SE3ET registration model: backbone + transformer + matching tail.

TPU-native port of ``experiments/se3ete.3dmatch/model.py`` (GeoTransformer class)
generalized over the experiment family:

* ``backbone='e2pn'`` with kanchor>1 -> SE3ET-{E,I,E2,I2} (block list decides)
* ``backbone='kpconv'`` (kanchor=1)  -> GeoTransformer baseline

Input is the padded two-cloud pyramid dict from
:mod:`se3et_tpu.data.pipeline` (cloud axis: 0 = ref, 1 = src).  The entire
forward — including ground-truth overlap generation, Sinkhorn and LGR — is one
jittable function with static shapes; no host synchronization anywhere
(the reference's ``.item()`` reads, ``torch.nonzero`` and CPU SVD are all
replaced by masked fixed-budget ops, cf. SURVEY §7.1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from se3et_tpu.nn import matching as matching_lib
from se3et_tpu.nn.epn import E2PNBackbone, EPNConfig
from se3et_tpu.nn.kpconv import KPConvFPN
from se3et_tpu.nn.matching import LearnableLogOptimalTransport
from se3et_tpu.nn.transformer import GeometricTransformer
from se3et_tpu.ops import geometry

@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Experiment model hyper-parameters (cf. per-experiment ``config.py``)."""

    # activation dtype for feature math: 'float32' | 'bfloat16'
    compute_dtype: str = "float32"
    # use the bf16 compute dtype in TRAINING too (default off: the backward
    # pass through the deep conv stack loses the gradient signal in bf16 —
    # measured round 1, re-validated with loss scaling in BENCH.md round 2;
    # combine with make_train_step(loss_scale=...) to experiment)
    bf16_train: bool = False
    # backbone
    backbone: str = "e2pn"  # 'e2pn' | 'kpconv'
    num_stages: int = 4
    input_dim: int = 1
    # input features are the constant 1 (true for every shipped experiment and
    # dataset; set False if custom per-point features are fed) — lets the
    # first conv skip its neighbor gather
    ones_features: bool = True
    init_dim: int = 64
    output_dim: int = 256
    kernel_size: int = 15
    init_radius: float = 0.0625
    init_sigma: float = 0.05
    group_norm: int = 32
    # GroupNorm statistics across the ref+src pair (the reference's stacked
    # semantics) instead of per cloud — ablation knob, see BENCH.md
    gn_joint_stats: bool = False
    # per-stage jax.checkpoint in the backbone (see E2PNBackbone.remat).
    # With the row-chunked geometric embedding the production se3ete.3dmatch
    # train step fits 16 GB HBM without remat and runs ~16% faster (measured
    # 1035 vs 1205 ms/step, BENCH.md round 3), so the default is off; flip on
    # for larger-than-registered shapes.  Training only; inference untouched.
    backbone_remat: bool = False
    # training route for the backbone convs AND max-pool skips: fused
    # windowed kernels with custom-VJP backwards (K-first scatter-transpose
    # matmul for the conv; one-hot-transpose tie-split for the max-pool)
    # instead of the XLA gather forward + serialized scatter-add backward.
    # Skips whose backward footprint exceeds VMEM fall back to XLA
    # (windowed_max_pool_bwd_fits).
    train_fused_conv: bool = True
    # training route for the geometric embedding: the fused Chebyshev kernel
    # with the basis-space custom VJP (ops/pallas/embedding.py) instead of
    # the row-chunked XLA sinusoids.  Numerics: bf16 embedding + <1e-5
    # Chebyshev fit error (same as the serving path) vs the XLA f32 path.
    train_fused_embedding: bool = True
    # training route for the RPE self-attention layers: the flash kernel with
    # its two-pass flash backward (ops/pallas/rpe_attention.py) instead of
    # materialized (B, A, H, N, M) scores.  Cross attention stays XLA in
    # training (the EQ-cross flash kernels are forward-only).
    train_fused_attention: bool = True
    # escape hatch: disable the flash RPE self-attention on the SERVING path
    # (falls back to the XLA formulation + materialized embedding SH term)
    serve_fused_attention: bool = True
    # serving route for the geometric embedding INSIDE the flash self
    # layers: the (B, N, M, C) tensor never exists — tiles are recomputed
    # in-kernel from raw coordinates (rpe_self_attention_femb).  Requires
    # serve_fused_attention; falls back to the materialized embedding when
    # shapes disqualify the flash route.  Default OFF: measured 79.0 ms vs
    # 68.2 ms materialized at the round-4 production shape — the bn=16
    # tile recompute (small matmuls + per-tile Chebyshev/atan2 VPU work +
    # 4x the K/V re-fetch sweeps) costs more than the deleted ~1 GB write
    # + reads save.  Kept as an opt-in (and a failsafe-ladder rung) for
    # shapes where the embedding tensor dominates HBM.
    serve_femb: bool = False
    # escape hatches for the remaining serving Pallas kernels: the windowed
    # conv/max-pool/influence kernels and the Chebyshev geometric-embedding
    # kernel.  engine.tester.make_failsafe_forward walks these knobs if the
    # first compile fails to lower on an unseen Mosaic version, so
    # test.py/eval.py degrade to the XLA paths instead of dying
    # (VERDICT r3 #5).
    serve_fused_conv: bool = True
    serve_fused_embedding: bool = True
    # escape hatch for the fused Sinkhorn iteration kernel
    # (ops/pallas/sinkhorn.py) — the rung the round-4 KITTI field failure
    # actually needed: a (256,129,129) output that exceeds the scoped-VMEM
    # limit kills the kernel compile, and no other ladder rung touches it.
    # Falls back to the lax.scan formulation (bit-identical log-probs).
    serve_fused_sinkhorn: bool = True
    epn: EPNConfig = EPNConfig()
    # transformer
    gt_input_dim: int = 1024
    gt_hidden_dim: int = 256
    gt_output_dim: int = 256
    num_heads: int = 4
    blocks: Sequence[str] = (
        "self_eq", "cross_a_soft", "self_eq", "cross_r_soft",
        "self", "cross", "self", "cross", "self", "cross",
    )
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    supervise_rotation: bool = False
    # align src anchors to ref by the gt-nearest-anchor permutation and
    # compress A*C -> C for coarse matching (se3eti.kitti/model.py:178-182)
    anchor_matching: bool = False
    align_mode: str = "0"
    n_level_equiv: int = 0
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    # EQ-attention global-pooling variants (vanilla_transformer.py:131-134)
    attn_r_summ: str = "mean"
    attn_on_sub: bool = False
    attn_r_multihead: bool = False
    # matching
    ground_truth_matching_radius: float = 0.05
    num_points_in_patch: int = 64
    num_sinkhorn_iterations: int = 100
    num_targets: int = 128
    overlap_threshold: float = 0.1
    num_correspondences: int = 256
    dual_normalization: bool = True
    gt_candidates: int = 48
    # fine matching / LGR
    fine_topk: int = 3
    acceptance_radius: float = 0.1
    mutual: bool = True
    confidence_threshold: float = 0.05
    use_dustbin: bool = False
    correspondence_threshold: int = 3
    correspondence_limit: int = 1024
    num_refinement_steps: int = 5

    @property
    def kanchor(self) -> int:
        return self.epn.kanchor if self.backbone == "e2pn" else 1


class SE3ETModel(nn.Module):
    """Full registration model (forward mirrors ``model.py:79-227``)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.backbone == "e2pn":
            self.backbone_net = E2PNBackbone(
                input_dim=c.input_dim,
                output_dim=c.output_dim,
                init_dim=c.init_dim,
                init_radius=c.init_radius,
                init_sigma=c.init_sigma,
                group_norm=c.group_norm,
                config=c.epn,
                num_stages=c.num_stages,
                ones_input=c.ones_features,
                remat=c.backbone_remat,
            )
        else:
            self.backbone_net = KPConvFPN(
                input_dim=c.input_dim,
                output_dim=c.output_dim,
                init_dim=c.init_dim,
                kernel_size=c.kernel_size,
                init_radius=c.init_radius,
                init_sigma=c.init_sigma,
                group_norm=c.group_norm,
                num_stages=c.num_stages,
            )
        self.transformer = GeometricTransformer(
            input_dim=c.gt_input_dim,
            output_dim=c.gt_output_dim,
            hidden_dim=c.gt_hidden_dim,
            num_heads=c.num_heads,
            blocks=tuple(c.blocks),
            sigma_d=c.sigma_d,
            sigma_a=c.sigma_a,
            angle_k=c.angle_k,
            supervise_rotation=c.supervise_rotation,
            reduction_a=c.reduction_a,
            na=c.kanchor if c.backbone == "e2pn" else None,
            attn_r_positive=c.attn_r_positive,
            attn_r_positive_rot_supervise=c.attn_r_positive_rot_supervise,
            attn_r_summ=c.attn_r_summ,
            attn_on_sub=c.attn_on_sub,
            attn_r_multihead=c.attn_r_multihead,
            align_mode=c.align_mode,
            n_level_equiv=c.n_level_equiv,
        )
        self.optimal_transport = LearnableLogOptimalTransport(
            c.num_sinkhorn_iterations
        )
        if c.anchor_matching:
            from se3et_tpu.nn.anchor_heads import PermutationInvariantLayer

            self.permutation_invariant = PermutationInvariantLayer(
                na=c.kanchor, d_model=c.gt_output_dim
            )

    def __call__(self, data, train: bool = False, with_registration: bool = True,
                 with_gt: bool = True, stop_after: str = ""):
        # ``stop_after`` in {"backbone", "transformer", "matching",
        # "sinkhorn"}: early-return for in-graph prefix profiling
        # (scripts/profile_prefix.py) — differences between consecutive
        # prefixes cancel the per-dispatch relay bias that inflates
        # section-by-section timings.
        from se3et_tpu import precision as prec_mod

        c = self.cfg
        # bf16 activations are inference-only by default: through the
        # ~35-layer backbone the backward pass loses the gradient signal in
        # bf16 (measured: coarse-loss backbone grad^2 1e-10 vs 1.1e3 in
        # fp32), freezing the encoder.  ``bf16_train`` opts training in for
        # loss-scaling experiments.
        prec_mod.set_compute_dtype(
            c.compute_dtype if (not train or c.bf16_train) else None
        )
        from se3et_tpu.nn import layers as layers_mod

        layers_mod.set_gn_joint_stats(c.gn_joint_stats)
        out = {}
        coarse = c.num_stages - 1
        fine = 1

        points_c = data[f"points_{coarse}"]  # (2, Nc, 3)
        masks_c = data[f"masks_{coarse}"]
        points_f = data[f"points_{fine}"]
        masks_f = data[f"masks_{fine}"]
        transform = data["transform"]

        # 1. point-to-node partition per cloud.  The partition is pure
        # geometry, so the pipeline precomputes it on the host when
        # ``PyramidConfig.patch_k`` is set (device fallback: ~22 ms/pair at
        # production shapes, dominated by XLA's TopK over (Nc, Nf)).
        if "node_knn_indices" in data and (
            data["node_knn_indices"].shape[-1] == c.num_points_in_patch
            # the pipeline builds the partition for ITS OWN (fine=1,
            # coarse=num_stages-1) stages — verify the node/point dims match
            # this model's stage choice before trusting it (a num_stages
            # mismatch with a coincidentally equal patch_k would silently
            # partition against the wrong node set)
            and data["node_knn_indices"].shape[-2] == points_c.shape[1]
            and data["patch_node_masks"].shape[-1] == points_c.shape[1]
        ):
            node_masks = data["patch_node_masks"]
            knn_idx = data["node_knn_indices"]
            knn_masks = data["node_knn_masks"]
        else:
            _, node_masks, knn_idx, knn_masks = jax.vmap(
                geometry.point_to_node_partition, in_axes=(0, 0, None, 0, 0)
            )(points_f, points_c, c.num_points_in_patch, masks_f, masks_c)

        knn_points = jax.vmap(geometry.gather_with_sentinel)(points_f, knn_idx)

        ref_node_masks, src_node_masks = node_masks[0], node_masks[1]
        ref_knn_idx, src_knn_idx = knn_idx[0], knn_idx[1]
        ref_knn_masks, src_knn_masks = knn_masks[0], knn_masks[1]
        ref_knn_points, src_knn_points = knn_points[0], knn_points[1]

        # 2. ground-truth node correspondence overlaps (training / evaluation
        # only; pure serving sets with_gt=False — reference computes them
        # unconditionally, model.py:120)
        if with_gt or train:
            overlap_mat = matching_lib.node_correspondences(
                points_c[0], points_c[1], ref_knn_points, src_knn_points,
                transform, c.ground_truth_matching_radius, ref_node_masks,
                src_node_masks, ref_knn_masks, src_knn_masks,
                num_candidates=c.gt_candidates,
            )
            out["gt_overlap_mat"] = overlap_mat
        out["ref_node_masks"] = ref_node_masks
        out["src_node_masks"] = src_node_masks

        # 3. backbone
        if c.backbone == "e2pn":
            # fused windowed conv + Pallas kernels on the inference path;
            # training differentiates through the conv kernels when
            # train_fused_conv (custom VJP, windowed_conv.py)
            feats_f, feats_c = self.backbone_net(
                data["features"], data,
                fused=(not train) and c.serve_fused_conv,
                fused_conv_grad=train and c.train_fused_conv,
            )
        else:
            feats_f, feats_c = self.backbone_net(data["features"], data)
        feats_f = feats_f.astype(jnp.float32)
        feats_c = feats_c.astype(jnp.float32)
        # feats_f: (2, Nf, C); feats_c: (2, Nc, [A,] C)
        if stop_after == "backbone":
            return {"feats_f": feats_f, "feats_c": feats_c}

        # 4. coarse transformer (batch of one pair)
        ref_in = feats_c[0][None]  # (1, Nc, [A,] C)
        src_in = feats_c[1][None]
        normals_c = data.get(f"normals_{coarse}")
        ref_c_out, src_c_out, ref_feat_m, src_feat_m, am0, am1 = self.transformer(
            points_c[0][None], points_c[1][None], ref_in, src_in,
            ref_masks=masks_c[0][None], src_masks=masks_c[1][None],
            ref_normal=None if normals_c is None else normals_c[0][None],
            src_normal=None if normals_c is None else normals_c[1][None],
            # tile-fused Pallas embedding + flash attention; the embedding
            # and RPE self layers carry custom VJPs so training uses them
            # too (knobs below); the EQ-cross flash is forward-only
            fused_embedding=(
                (not train and c.serve_fused_embedding)
                or (train and c.train_fused_embedding)
            ),
            fused_attention=(
                (not train and c.serve_fused_attention)
                or (train and c.train_fused_attention)
            ),
            fused_attention_cross=(not train) and c.serve_fused_attention,
            fused_femb=(not train) and c.serve_fused_attention
            and c.serve_femb,
        )
        out["attn_matrix0"] = am0
        out["attn_matrix1"] = am1

        if c.anchor_matching:
            # gt-aligned anchor permutation + A*C -> C compression replaces
            # the coarse features (se3eti.kitti/model.py:178-182)
            if ref_feat_m is None:
                raise ValueError(
                    "anchor_matching requires a block list whose transformer "
                    "returns equivariant feats_m (e.g. SE3ET-I blocks)"
                )
            ref_feat_m, src_feat_m, ref_c_out, src_c_out = (
                self.permutation_invariant(ref_feat_m, src_feat_m, transform)
            )
        out["ref_feats_m"] = ref_feat_m
        out["src_feats_m"] = src_feat_m

        ref_feats_c = ref_c_out[0].astype(jnp.float32)
        src_feats_c = src_c_out[0].astype(jnp.float32)
        ref_feats_c = ref_feats_c / (
            jnp.linalg.norm(ref_feats_c, axis=-1, keepdims=True) + 1e-12
        )
        src_feats_c = src_feats_c / (
            jnp.linalg.norm(src_feats_c, axis=-1, keepdims=True) + 1e-12
        )
        out["ref_feats_c"] = ref_feats_c
        out["src_feats_c"] = src_feats_c
        out["ref_feats_f"] = feats_f[0]
        out["src_feats_f"] = feats_f[1]
        if stop_after == "transformer":
            return out

        # 5. coarse correspondences (feature top-k, no grad)
        ref_idx, src_idx, corr_scores, corr_valid = matching_lib.superpoint_matching(
            jax.lax.stop_gradient(ref_feats_c),
            jax.lax.stop_gradient(src_feats_c),
            ref_node_masks, src_node_masks, c.num_correspondences,
            c.dual_normalization,
        )
        out["ref_node_corr_indices"] = ref_idx
        out["src_node_corr_indices"] = src_idx
        out["node_corr_valid"] = corr_valid

        if train:
            key = self.make_rng("targets")
            overlap_mat = out["gt_overlap_mat"]
            ref_idx, src_idx, corr_scores, corr_valid = (
                matching_lib.superpoint_targets(
                    key, overlap_mat, c.num_targets, c.overlap_threshold
                )
            )

        # 6. patch gather for fine matching
        sel_ref_knn_idx = ref_knn_idx[ref_idx]  # (P, K)
        sel_src_knn_idx = src_knn_idx[src_idx]
        sel_ref_knn_masks = ref_knn_masks[ref_idx] & corr_valid[:, None]
        sel_src_knn_masks = src_knn_masks[src_idx] & corr_valid[:, None]
        sel_ref_knn_points = ref_knn_points[ref_idx]
        sel_src_knn_points = src_knn_points[src_idx]
        sel_ref_knn_feats = geometry.gather_with_sentinel(feats_f[0], sel_ref_knn_idx)
        sel_src_knn_feats = geometry.gather_with_sentinel(feats_f[1], sel_src_knn_idx)

        out["ref_node_corr_knn_points"] = sel_ref_knn_points
        out["src_node_corr_knn_points"] = sel_src_knn_points
        out["ref_node_corr_knn_masks"] = sel_ref_knn_masks
        out["src_node_corr_knn_masks"] = sel_src_knn_masks
        if stop_after == "matching":
            out["_gathered_feats"] = (sel_ref_knn_feats, sel_src_knn_feats)
            return out

        # inference rotation: cross-anchor similarity of matched-node
        # equivariant features (se3eti.kitti/model.py:247-273)
        if ref_feat_m is not None and src_feat_m is not None:
            rm = jax.lax.stop_gradient(ref_feat_m[0])[:, ref_idx]  # (A, P, C)
            sm = jax.lax.stop_gradient(src_feat_m[0])[:, src_idx]

            def _norm_flat(x):
                flat = x.reshape(x.shape[0], -1)
                flat = flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + 1e-9)
                return flat.reshape(x.shape)

            rm, sm = _norm_flat(rm), _norm_flat(sm)
            out["rot_sup_matrix"] = (
                jnp.einsum("anc,enc->ae", rm, sm) + 1.0
            ) / 2.0

        # 7. optimal transport
        from se3et_tpu import precision as prec

        scores = jnp.einsum(
            "pnd,pmd->pnm", sel_ref_knn_feats, sel_src_knn_feats,
            precision=prec.feature(),
        ) / jnp.sqrt(jnp.asarray(feats_f.shape[-1], jnp.float32))
        matching_scores = self.optimal_transport(
            scores, sel_ref_knn_masks, sel_src_knn_masks,
            use_fused=c.serve_fused_sinkhorn,
        )
        out["matching_scores"] = matching_scores
        if stop_after == "sinkhorn":
            return out

        # 8. local-to-global registration (inference tail, no grad)
        if with_registration:
            reg = matching_lib.local_global_registration(
                jax.lax.stop_gradient(sel_ref_knn_points),
                jax.lax.stop_gradient(sel_src_knn_points),
                sel_ref_knn_masks,
                sel_src_knn_masks,
                jax.lax.stop_gradient(matching_scores),
                k=c.fine_topk,
                acceptance_radius=c.acceptance_radius,
                mutual=c.mutual,
                confidence_threshold=c.confidence_threshold,
                use_dustbin=c.use_dustbin,
                correspondence_threshold=c.correspondence_threshold,
                correspondence_limit=c.correspondence_limit,
                num_refinement_steps=c.num_refinement_steps,
            )
            out.update(reg)
        return out

r"""Losses and in-graph evaluator.

Ports of ``geotransformer/modules/loss/circle_loss.py`` and the per-experiment
``loss.py`` (CoarseMatchingLoss / FineMatchingLoss / RotationMatchingLoss /
OverallLoss / Evaluator, e.g. ``experiments/se3ete.3dmatch/loss.py``), adapted
to the dense masked representations of the TPU model (the gt correspondence
list becomes the (M, N) overlap matrix).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.core import se3
from se3et_tpu.ops import geometry


@dataclasses.dataclass(frozen=True)
class LossConfig:
    positive_margin: float = 0.1
    negative_margin: float = 1.4
    positive_optimal: float = 0.1
    negative_optimal: float = 1.4
    log_scale: float = 24.0
    positive_overlap: float = 0.1
    fine_positive_radius: float = 0.05
    weight_coarse_loss: float = 1.0
    weight_fine_loss: float = 1.0
    weight_rotation_loss: float = 1.0
    supervise_rotation: bool = False
    kanchor: int = 6


def weighted_circle_loss(
    pos_masks, neg_masks, feat_dists, pos_scales=None, neg_scales=None,
    positive_margin=0.1, negative_margin=1.4, positive_optimal=0.1,
    negative_optimal=1.4, log_scale=24.0,
):
    """Overlap-weighted circle loss over feature distances.

    Reference: ``modules/loss/circle_loss.py:44-132``.  Rows with no positives
    or no negatives are excluded from the mean.
    """
    pos_w = jnp.maximum(feat_dists - positive_optimal, 0.0)
    if pos_scales is not None:
        pos_w = pos_w * pos_scales
    neg_w = jnp.maximum(negative_optimal - feat_dists, 0.0)
    if neg_scales is not None:
        neg_w = neg_w * neg_scales

    neg_big = -1e12
    pos_logits = log_scale * pos_w * (feat_dists - positive_margin)
    pos_logits = jnp.where(pos_masks, pos_logits, neg_big)
    neg_logits = -log_scale * neg_w * (feat_dists - negative_margin)
    neg_logits = jnp.where(neg_masks, neg_logits, neg_big)

    lse_pos_row = jax.nn.logsumexp(pos_logits, axis=-1)
    lse_neg_row = jax.nn.logsumexp(neg_logits, axis=-1)
    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    lse_pos_col = jax.nn.logsumexp(pos_logits, axis=-2)
    lse_neg_col = jax.nn.logsumexp(neg_logits, axis=-2)
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale

    row_ok = jnp.any(pos_masks, axis=-1) & jnp.any(neg_masks, axis=-1)
    col_ok = jnp.any(pos_masks, axis=-2) & jnp.any(neg_masks, axis=-2)
    loss_row = jnp.sum(loss_row * row_ok) / jnp.maximum(jnp.sum(row_ok), 1)
    loss_col = jnp.sum(loss_col * col_ok) / jnp.maximum(jnp.sum(col_ok), 1)
    return 0.5 * (loss_row + loss_col)


def coarse_matching_loss(output, cfg: LossConfig):
    """Weighted circle loss on superpoint features vs gt overlaps.

    Reference: ``experiments/se3ete.3dmatch/loss.py:15-45``.
    """
    ref_feats = output["ref_feats_c"]
    src_feats = output["src_feats_c"]
    overlaps = output["gt_overlap_mat"]  # (M, N)
    dists = jnp.sqrt(
        geometry.pairwise_distance(ref_feats, src_feats, normalized=True)
    )
    # padded / empty nodes must not act as positives OR negatives
    valid_pair = (
        output["ref_node_masks"][:, None] & output["src_node_masks"][None, :]
    )
    pos_masks = (overlaps > cfg.positive_overlap) & valid_pair
    neg_masks = (overlaps == 0.0) & valid_pair
    pos_scales = jnp.sqrt(overlaps * pos_masks)
    return weighted_circle_loss(
        pos_masks, neg_masks, dists, pos_scales,
        positive_margin=cfg.positive_margin, negative_margin=cfg.negative_margin,
        positive_optimal=cfg.positive_optimal,
        negative_optimal=cfg.negative_optimal, log_scale=cfg.log_scale,
    )


def fine_matching_loss(output, transform, cfg: LossConfig):
    """NLL on the Sinkhorn matrix with slack row/col labels.

    Reference: ``experiments/se3ete.3dmatch/loss.py:48-76``.
    """
    ref_knn = output["ref_node_corr_knn_points"]  # (P, K, 3)
    src_knn = output["src_node_corr_knn_points"]
    ref_m = output["ref_node_corr_knn_masks"]
    src_m = output["src_node_corr_knn_masks"]
    scores = output["matching_scores"]  # (P, K+1, K+1)

    src_knn = se3.apply_transform(src_knn, transform)
    d2 = geometry.pairwise_distance(ref_knn, src_knn)
    gt_masks = ref_m[:, :, None] & src_m[:, None, :]
    gt_corr = (d2 < cfg.fine_positive_radius**2) & gt_masks
    slack_row = (~jnp.any(gt_corr, axis=2)) & ref_m
    slack_col = (~jnp.any(gt_corr, axis=1)) & src_m

    p, k = ref_m.shape
    labels = jnp.zeros_like(scores, dtype=bool)
    labels = labels.at[:, :k, :k].set(gt_corr)
    labels = labels.at[:, :k, k].set(slack_row)
    labels = labels.at[:, k, :k].set(slack_col)
    total = jnp.sum(labels)
    return -jnp.sum(scores * labels) / jnp.maximum(total, 1)


def rotation_matching_loss(output, transform, cfg: LossConfig):
    """BCE between the rotation-attention matrix and the gt-nearest-anchor
    permutation one-hot (``experiments/se3ete.3dmatch/loss.py:79-160``).

    Note: the gt anchor label depends on the (traced) gt rotation; the
    argmax over a fixed rotation table is jittable.
    """
    quotient = {4: 3, 6: 4, 12: 5}[cfg.kanchor]
    space = anchor_lib.get_anchor_space(cfg.kanchor, quotient)
    rotations = jnp.asarray(space.rotations)  # (R, 3, 3)
    trace_ori = jnp.asarray(space.trace_idx_ori)  # (R, A)
    a = cfg.kanchor

    def target_for(rot):
        cos = 0.5 * (jnp.einsum("rji,ji->r", rotations, rot) - 1.0)
        label = jnp.argmax(cos)
        perm = trace_ori[label]  # (A,)
        return jax.nn.one_hot(perm, a)

    losses = []
    for key, rot in (
        ("attn_matrix0", transform[:3, :3]),
        ("attn_matrix1", transform[:3, :3].T),
    ):
        attn = output.get(key)
        if attn is None:
            continue
        attn = attn.reshape(a, a)
        target = target_for(rot)
        pos_weight = float(a - 1)
        # BCEWithLogits with pos_weight
        log_p = jax.nn.log_sigmoid(attn)
        log_np = jax.nn.log_sigmoid(-attn)
        bce = -(pos_weight * target * log_p + (1.0 - target) * log_np)
        losses.append(jnp.mean(bce))
    if not losses:
        return jnp.asarray(0.0)
    return sum(losses)


def overall_loss(output, data, cfg: LossConfig):
    """Weighted sum (``experiments/se3ete.3dmatch/loss.py:163-195``)."""
    transform = data["transform"]
    c_loss = coarse_matching_loss(output, cfg)
    f_loss = fine_matching_loss(output, transform, cfg)
    total = cfg.weight_coarse_loss * c_loss + cfg.weight_fine_loss * f_loss
    losses = {"c_loss": c_loss, "f_loss": f_loss}
    if cfg.supervise_rotation:
        r_loss = rotation_matching_loss(output, transform, cfg)
        total = total + cfg.weight_rotation_loss * r_loss
        losses["r_loss"] = r_loss
    losses["loss"] = total
    return total, losses


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    acceptance_overlap: float = 0.0
    acceptance_radius: float = 0.1
    rmse_threshold: float = 0.2
    rre_threshold: float = 15.0
    rte_threshold: float = 0.3
    kitti_registration: bool = False  # RR = (RRE<rre_thr) & (RTE<rte_thr)
    # eval.py --method=ransac parameters (reference config.py `_C.ransac`:
    # 0.05 m / 3 pts indoor, 0.3 m / 4 pts KITTI)
    ransac_distance_threshold: float = 0.05
    ransac_num_points: int = 3
    ransac_num_iterations: int = 50000


def evaluate(output, data, cfg: EvalConfig):
    """In-graph evaluator: PIR / IR / RRE / RTE / RMSE / RR.

    Reference: ``experiments/se3ete.3dmatch/loss.py:198-262``.
    """
    transform = data["transform"]
    metrics = {}

    # coarse precision (PIR)
    overlap = output["gt_overlap_mat"]
    gt_map = overlap > cfg.acceptance_overlap
    ref_idx = output["ref_node_corr_indices"]
    src_idx = output["src_node_corr_indices"]
    valid = output["node_corr_valid"]
    hits = gt_map[ref_idx, src_idx] & valid
    metrics["PIR"] = jnp.sum(hits) / jnp.maximum(jnp.sum(valid), 1)

    # fine inlier ratio (IR)
    ref_corr = output["ref_corr_points"]
    src_corr = se3.apply_transform(output["src_corr_points"], transform)
    cd = jnp.linalg.norm(ref_corr - src_corr, axis=1)
    cv = output["corr_valid"]
    metrics["IR"] = jnp.sum((cd < cfg.acceptance_radius) & cv) / jnp.maximum(
        jnp.sum(cv), 1
    )

    # registration errors
    est = output["estimated_transform"]
    rre, rte = se3.isotropic_transform_error(transform, est)
    metrics["RRE"] = rre
    metrics["RTE"] = rte

    src_points = data["points_0"][1]
    src_masks = data["masks_0"][1]
    realign = se3.inverse_transform(transform) @ est
    moved = se3.apply_transform(src_points, realign)
    err = jnp.linalg.norm(moved - src_points, axis=1)
    rmse = jnp.sum(err * src_masks) / jnp.maximum(jnp.sum(src_masks), 1)
    metrics["RMSE"] = rmse
    if cfg.kitti_registration:
        metrics["RR"] = (
            (rre < cfg.rre_threshold) & (rte < cfg.rte_threshold)
        ).astype(jnp.float32)
    else:
        metrics["RR"] = (rmse < cfg.rmse_threshold).astype(jnp.float32)
    return metrics

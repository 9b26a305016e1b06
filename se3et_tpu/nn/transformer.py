r"""Conditional transformer (block scheduler) + GeometricTransformer wrapper.

TPU-native port of
``geotransformer/modules/transformer/conditional_transformer.py`` (the
``RPEConditionalTransformer`` state machine) and
``geotransformer/modules/geotransformer/geotransformer.py:124-317``.

The scheduler interprets the experiment's ``blocks`` list, e.g.

* SE3ET-E:  ``['self_eq','cross_a_soft','self_eq','cross_r_soft',
  'self','cross','self','cross','self','cross']``
* SE3ET-I:  ``['self_eq','cross','self_eq','cross','self_eq','cross']``
* GeoTransformer baseline: ``['self','cross'] * 3``

and handles the equivariant<->invariant transitions:

* ``self_eq`` followed by plain ``cross``: anchor max-pool to invariant
  queries/keys, keep the equivariant tensor for the value path
  (``conditional_transformer.py:271-283``);
* plain ``cross`` between ``self_eq`` blocks: invariant attention with
  equivariant values, producing new equivariant features
  (``conditional_transformer.py:294-315``);
* ``cross_r_soft``/``cross_r_best`` followed by plain blocks: soft/best
  rotation-aligned anchor fusion (``eq2inv_soft``/``eq2inv_best``,
  ``conditional_transformer.py:177-249``) + :class:`RotCompressOutput`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.nn.attention import (
    LRPETransformerLayer,
    PETransformerLayer,
    RotCompressOutput,
    RPETransformerLayer,
    TransformerLayer,
)
from se3et_tpu.nn.embedding import GeometricStructureEmbedding
from se3et_tpu.nn.layers import TorchLinear

EQ_BLOCKS = (
    "self_eq", "cross_eq", "cross_a_soft", "cross_a_best", "cross_r_soft",
    "cross_r_best",
)


def _block_eq(block: str) -> bool:
    return block in EQ_BLOCKS


def _block_attn_mode(block: str) -> Optional[str]:
    if "_eq" in block:
        return None
    for mode in ("a_soft", "a_best", "r_soft", "r_best"):
        if mode in block:
            return mode
    return None


class RPEConditionalTransformer(nn.Module):
    """Block scheduler over ref/src coarse features (cf. reference class of the
    same name)."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    na: int = 4
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    attn_r_summ: str = "mean"
    attn_on_sub: bool = False
    attn_r_multihead: bool = False
    align_mode: str = "0"
    d_equiv_embed: int = 0
    return_attention_weights: bool = False  # rotation supervision

    def setup(self):
        layers = []
        for block in self.blocks:
            eq = _block_eq(block)
            if "self" in block:
                layers.append(
                    RPETransformerLayer(
                        self.d_model, self.num_heads,
                        activation_fn=self.activation_fn, equivariant=eq,
                        d_equiv_embed=self.d_equiv_embed, kanchor=self.na,
                    )
                )
            else:
                layers.append(
                    TransformerLayer(
                        self.d_model, self.num_heads,
                        activation_fn=self.activation_fn, equivariant=eq,
                        attn_mode=_block_attn_mode(block), kanchor=self.na,
                        attn_r_positive=self.attn_r_positive,
                        attn_r_positive_rot_supervise=self.attn_r_positive_rot_supervise,
                        with_rot_supervision=self.return_attention_weights,
                        attn_r_summ=self.attn_r_summ,
                        attn_on_sub=self.attn_on_sub,
                        attn_r_multihead=self.attn_r_multihead,
                    )
                )
        self.layers = layers
        if any("r_soft" in b or "r_best" in b for b in self.blocks):
            self.rotcompress = RotCompressOutput(
                self.d_model, na=self.na, activation_fn=self.activation_fn,
                dual_align=self.align_mode == "dual_early",
            )
        quotient = {1: 1, 3: 1, 4: 3, 6: 4, 12: 5}.get(self.na, 1)
        self._space = anchor_lib.get_anchor_space(self.na, quotient)

    def _eq2inv_normal(self, feats, normals, weighted=True):
        """Normal-guided anchor pooling (``conditional_transformer.py:143-175``):
        weight (or select) anchors by alignment of the point normal with the
        anchor vertex.  feats (B, A, N, C); normals (B, N, 3)."""
        verts = jnp.asarray(self._space.vertices)  # (A, 3)
        sim = jnp.einsum("bnc,ac->ban", normals, verts)  # (B, A, N)
        if weighted:
            w = jax.nn.sigmoid(sim)[..., None]
            return jnp.sum(feats * w, axis=1)
        idx = jnp.argmax(sim, axis=1)  # (B, N)
        return jnp.take_along_axis(feats, idx[:, None, :, None], axis=1)[:, 0]

    def _eq2inv_soft(self, feats0, feats1, attn_w0, attn_w1):
        """Soft rotation-weighted anchor fusion (``conditional_transformer.py:209-249``).

        attn_w: (B, R) rotation weights from the r_soft cross block.
        """
        trace_ori = jnp.asarray(self._space.trace_idx_ori)  # (R, A)
        def fuse(feats, w):
            permuted = feats[:, trace_ori]  # (B, R, A, N, C)
            return jnp.sum(permuted * w[:, :, None, None, None], axis=1)  # (B,A,N,C)
        if self.align_mode == "0":
            feats0_inv = feats0
            feats1_inv = fuse(feats1, attn_w0)
        elif self.align_mode == "1":
            feats0_inv = fuse(feats0, attn_w1)
            feats1_inv = feats1
        elif self.align_mode == "dual_late":
            feats0_inv = fuse(feats0, attn_w1)
            feats1_inv = fuse(feats1, attn_w0)
        elif self.align_mode == "dual_early":
            # concat own + aligned anchors -> (B, 2A, N, C); RotCompressOutput
            # compresses 2A*C -> C (conditional_transformer.py:186-190,
            # output_layer.py:29-31 dual_align)
            feats0_inv = jnp.concatenate([feats0, fuse(feats0, attn_w1)], axis=1)
            feats1_inv = jnp.concatenate([fuse(feats1, attn_w0), feats1], axis=1)
        else:
            raise NotImplementedError(self.align_mode)
        out0 = self.rotcompress(feats0_inv)
        out1 = self.rotcompress(feats1_inv)
        if self.align_mode == "dual_late":
            out0 = out0 + self.rotcompress(feats0)
            out1 = out1 + self.rotcompress(feats1)
        return out0, out1

    def _eq2inv_best(self, feats0, feats1, perm0, perm1):
        """Best-rotation anchor alignment (``conditional_transformer.py:177-207``).

        perm: (B, A) anchor gather maps from the r_best cross block.
        """
        def gather(feats, perm):
            return jnp.take_along_axis(feats, perm[:, :, None, None], axis=1)
        if self.align_mode == "0":
            feats0_inv, feats1_inv = feats0, gather(feats1, perm0)
        elif self.align_mode == "1":
            feats0_inv, feats1_inv = gather(feats0, perm1), feats1
        elif self.align_mode == "dual_late":
            feats0_inv, feats1_inv = gather(feats0, perm1), gather(feats1, perm0)
        elif self.align_mode == "dual_early":
            feats0_inv = jnp.concatenate([feats0, gather(feats0, perm1)], axis=1)
            feats1_inv = jnp.concatenate([gather(feats1, perm0), feats1], axis=1)
        else:
            raise NotImplementedError(self.align_mode)
        out0 = self.rotcompress(feats0_inv)
        out1 = self.rotcompress(feats1_inv)
        if self.align_mode == "dual_late":
            out0 = out0 + self.rotcompress(feats0)
            out1 = out1 + self.rotcompress(feats1)
        return out0, out1

    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None,
                 masks1=None, equiv_embed0=None, equiv_embed1=None,
                 ref_normal=None, src_normal=None, use_flash=False,
                 points0=None, points1=None, stacked=None,
                 use_flash_cross=None, femb_pack=None):
        """feats: (B, A, N, C) equivariant or (B, N, C) invariant coarse feats.

        ``stacked``: optional (emb, masks, points) with both clouds on the
        leading axis — the flash self layers then run ONE kernel call over
        the stacked batch.  This is not only a dispatch saving: the flash
        kernel is a custom call, so per-cloud ``emb[:nb]``/``emb[nb:]``
        slices would force XLA to materialize two ~0.5 GB operand copies.
        """
        feats0_eq = feats1_eq = None
        attn_matrix0 = attn_matrix1 = None
        ref_feat_m = src_feat_m = None
        blocks = list(self.blocks)
        for i, block in enumerate(blocks):
            layer = self.layers[i]
            if "self" in block:
                if feats0_eq is not None:
                    in0, in1 = feats0_eq, feats1_eq
                else:
                    in0, in1 = feats0, feats1
                if stacked is not None and in0.shape == in1.shape:
                    emb_s, masks_s, points_s = stacked
                    ins = jnp.concatenate([in0, in1], axis=0)
                    outs, _ = layer(ins, ins, emb_s, memory_masks=masks_s,
                                    points=points_s, use_flash=True,
                                    femb_pack=femb_pack)
                    nb = in0.shape[0]
                    feats0, feats1 = outs[:nb], outs[nb:]
                else:
                    feats0, _ = layer(in0, in0, embeddings0,
                                      memory_masks=masks0,
                                      equiv_states=equiv_embed0,
                                      points=points0, use_flash=use_flash)
                    feats1, _ = layer(in1, in1, embeddings1,
                                      memory_masks=masks1,
                                      equiv_states=equiv_embed1,
                                      points=points1, use_flash=use_flash)
                if block == "self_eq" and i + 1 < len(blocks) and blocks[i + 1] == "cross":
                    # next block is plain cross: pool to invariant, remember eq
                    feats0_eq, feats1_eq = feats0, feats1
                    if ref_normal is not None and src_normal is not None:
                        feats0 = self._eq2inv_normal(feats0_eq, ref_normal)
                        feats1 = self._eq2inv_normal(feats1_eq, src_normal)
                    else:
                        feats0 = jnp.max(feats0_eq, axis=1)
                        feats1 = jnp.max(feats1_eq, axis=1)
                continue

            # cross blocks
            next_is_self_eq = i + 1 < len(blocks) and blocks[i + 1] == "self_eq"
            last = i + 1 == len(blocks)
            if block == "cross" and (
                next_is_self_eq or (last and i > 0 and blocks[i - 1] == "self_eq")
            ):
                # invariant q/k with equivariant values -> equivariant output
                feats0_eq, _ = layer(feats0, feats1, feats1_eq, memory_masks=masks1)
                feats0_new = jnp.max(feats0_eq, axis=1)
                feats1_eq, _ = layer(feats1, feats0, feats0_eq, memory_masks=masks0)
                feats1 = jnp.max(feats1_eq, axis=1)
                feats0 = feats0_new
                if last:
                    ref_feat_m, src_feat_m = feats0_eq, feats1_eq
                continue

            # EQ cross flash kernels are forward-only; training (which sets
            # use_flash for the differentiable self layers) keeps XLA here
            flash_cross = (use_flash if use_flash_cross is None
                           else use_flash_cross)
            aux0 = aux1 = None
            feats0_new, aux0 = layer(
                feats0, feats1, memory_masks=masks1, q_masks=masks0,
                use_flash=flash_cross,
            )
            feats1_new, aux1 = layer(
                feats1, feats0, memory_masks=masks0, q_masks=masks1,
                use_flash=flash_cross,
            )
            feats0, feats1 = feats0_new, feats1_new

            if "r_soft" in block or "r_best" in block:
                if "r_soft" in block:
                    attn_matrix0 = aux0.get("attn_matrix")
                    attn_matrix1 = aux1.get("attn_matrix")
                    if i + 1 < len(blocks):
                        ref_feat_m, src_feat_m = feats0, feats1
                if i + 1 < len(blocks) and not _block_eq(blocks[i + 1]):
                    if "r_best" in block:
                        feats0, feats1 = self._eq2inv_best(
                            feats0, feats1, aux0["attn_idx"], aux1["attn_idx"]
                        )
                    elif ref_normal is not None and src_normal is not None:
                        feats0_eq = feats1_eq = None
                        feats0 = self._eq2inv_normal(feats0, ref_normal)
                        feats1 = self._eq2inv_normal(feats1, src_normal)
                    else:
                        feats0_eq = feats1_eq = None
                        feats0, feats1 = self._eq2inv_soft(
                            feats0, feats1, aux0["attn_w"], aux1["attn_w"]
                        )
                elif i + 1 == len(blocks) and "r_soft" in block:
                    ref_feat_m, src_feat_m = feats0, feats1
                    feats0 = jnp.max(feats0, axis=1)
                    feats1 = jnp.max(feats1, axis=1)

        # final outputs must be invariant (B, N, C)
        if feats0.ndim == 4:
            feats0 = jnp.max(feats0, axis=1)
            feats1 = jnp.max(feats1, axis=1)
        return feats0, feats1, ref_feat_m, src_feat_m, attn_matrix0, attn_matrix1


class VanillaConditionalTransformer(nn.Module):
    """Plain self/cross block scheduler with no positional information
    (``conditional_transformer.py:33-58``).  Unused by the 18 shipped
    experiments (all use RPE) — provided for reference-surface parity.
    Masks: True = valid."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    return_attention_scores: bool = False

    @nn.compact
    def __call__(self, feats0, feats1, masks0=None, masks1=None):
        scores = []
        for block in self.blocks:
            layer = TransformerLayer(
                self.d_model, self.num_heads, activation_fn=self.activation_fn
            )
            if block == "self":
                feats0, aux0 = layer(feats0, feats0, memory_masks=masks0)
                feats1, aux1 = layer(feats1, feats1, memory_masks=masks1)
            else:
                feats0, aux0 = layer(feats0, feats1, memory_masks=masks1)
                feats1, aux1 = layer(feats1, feats0, memory_masks=masks0)
            if self.return_attention_scores:
                scores.append([aux0["scores"], aux1["scores"]])
        if self.return_attention_scores:
            return feats0, feats1, scores
        return feats0, feats1


class PEConditionalTransformer(nn.Module):
    """Additive-positional-embedding scheduler: PE layers for ``self``
    blocks, vanilla layers for ``cross`` (``conditional_transformer.py:
    61-95``).  Masks: True = valid."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    return_attention_scores: bool = False

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None,
                 masks1=None):
        scores = []
        for block in self.blocks:
            if block == "self":
                layer = PETransformerLayer(
                    self.d_model, self.num_heads,
                    activation_fn=self.activation_fn,
                )
                feats0, aux0 = layer(
                    feats0, feats0, embeddings0, embeddings0, masks0
                )
                feats1, aux1 = layer(
                    feats1, feats1, embeddings1, embeddings1, masks1
                )
            else:
                layer = TransformerLayer(
                    self.d_model, self.num_heads,
                    activation_fn=self.activation_fn,
                )
                feats0, aux0 = layer(feats0, feats1, memory_masks=masks1)
                feats1, aux1 = layer(feats1, feats0, memory_masks=masks0)
            if self.return_attention_scores:
                scores.append([aux0["scores"], aux1["scores"]])
        if self.return_attention_scores:
            return feats0, feats1, scores
        return feats0, feats1


class LRPEConditionalTransformer(nn.Module):
    """Learnable-relative-positional-embedding scheduler: LRPE layers for
    ``self`` blocks over integer relative-position indices
    (``conditional_transformer.py:393-441``).  Masks: True = valid."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    num_embeddings: int
    activation_fn: str = "ReLU"
    return_attention_scores: bool = False

    @nn.compact
    def __call__(self, feats0, feats1, emb_indices0, emb_indices1,
                 masks0=None, masks1=None):
        scores = []
        for block in self.blocks:
            if block == "self":
                layer = LRPETransformerLayer(
                    self.d_model, self.num_heads, self.num_embeddings,
                    activation_fn=self.activation_fn,
                )
                feats0, aux0 = layer(feats0, feats0, emb_indices0, masks0)
                feats1, aux1 = layer(feats1, feats1, emb_indices1, masks1)
            else:
                layer = TransformerLayer(
                    self.d_model, self.num_heads,
                    activation_fn=self.activation_fn,
                )
                feats0, aux0 = layer(feats0, feats1, memory_masks=masks1)
                feats1, aux1 = layer(feats1, feats0, memory_masks=masks0)
            if self.return_attention_scores:
                scores.append([aux0["scores"], aux1["scores"]])
        if self.return_attention_scores:
            return feats0, feats1, scores
        return feats0, feats1


class GeometricTransformer(nn.Module):
    """in_proj -> geometric embedding -> conditional transformer -> out_proj.

    Reference: ``modules/geotransformer/geotransformer.py:124-317``.
    """

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Sequence[str]
    sigma_d: float
    sigma_a: float
    angle_k: int
    activation_fn: str = "ReLU"
    supervise_rotation: bool = False
    reduction_a: str = "max"
    na: Optional[int] = None
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    attn_r_summ: str = "mean"
    attn_on_sub: bool = False
    attn_r_multihead: bool = False
    align_mode: str = "0"
    n_level_equiv: int = 0

    @nn.compact
    def __call__(self, ref_points, src_points, ref_feats, src_feats,
                 ref_masks=None, src_masks=None, ref_normal=None,
                 src_normal=None, fused_embedding=False,
                 fused_attention=False, fused_attention_cross=None,
                 fused_femb=False):
        """points: (B, N, 3); feats: (B, N, C_in) or (B, N, A, C_in).

        Returns (ref_out, src_out, ref_feat_m, src_feat_m, attn_matrix0,
        attn_matrix1) — outputs (B, N, C_out); feat_m equivariant tensors for
        anchor matching; attn_matrix for rotation supervision.
        """
        d_equiv_embed = int(np.sum(2 * np.arange(self.n_level_equiv) + 1))
        embedding = GeometricStructureEmbedding(
            self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k,
            reduction_a=self.reduction_a, kanchor=self.na or 1,
            n_level_equiv=self.n_level_equiv,
        )
        # the flash RPE self-attention recomputes the degree-1 SH term from
        # raw coordinates in-kernel; skip the (B, A, N, M, D) materialization
        # when every self layer is guaranteed to take the flash route
        n_coarse = ref_points.shape[1]
        flash_self = (
            fused_attention
            and n_coarse == src_points.shape[1]
            and n_coarse % 128 == 0
            and (d_equiv_embed == 0
                 or (d_equiv_embed == 4 and (self.na or 1) > 1))
        )
        # both clouds batched through one embedding evaluation
        stacked = None
        femb_pack = None
        if (
            ref_points.shape == src_points.shape
            and ref_masks is not None
            and src_masks is not None
        ):
            pts = jnp.concatenate([ref_points, src_points], axis=0)
            mks = jnp.concatenate([ref_masks, src_masks], axis=0)
            if flash_self and fused_femb and self.reduction_a == "max":
                # in-attention fused embedding: the (B, N, M, C) tensor
                # never exists — each flash self layer recomputes its tiles
                # from raw geometry (rpe_self_attention_femb)
                wd, wa, knn_pts = embedding(pts, mks, tables_only=True)
                femb_pack = (knn_pts, wd, wa, self.sigma_d, self.sigma_a)
                stacked = (None, mks, pts)
                ref_emb = src_emb = None
                ref_eq_emb = src_eq_emb = None
                eq_emb = None
                emb = None
            else:
                emb, eq_emb = embedding(pts, mks, fused=fused_embedding,
                                        compute_equiv=not flash_self)
            nb = ref_points.shape[0]
            if emb is None:
                pass
            elif flash_self:
                # flash self layers consume the stacked embedding directly —
                # per-cloud slices of a custom-call operand would copy ~1 GB
                ref_emb = src_emb = None
                stacked = (emb, mks, pts)
            else:
                ref_emb, src_emb = emb[:nb], emb[nb:]
            if eq_emb is not None:
                ref_eq_emb, src_eq_emb = eq_emb[:nb], eq_emb[nb:]
            else:
                ref_eq_emb = src_eq_emb = None
        else:
            ref_emb, ref_eq_emb = embedding(ref_points, ref_masks,
                                            fused=fused_embedding,
                                            compute_equiv=not flash_self)
            src_emb, src_eq_emb = embedding(src_points, src_masks,
                                            fused=fused_embedding,
                                            compute_equiv=not flash_self)

        in_proj = TorchLinear(self.hidden_dim)
        out_proj = TorchLinear(self.output_dim)

        if self.na is None or self.na == 1:
            f0 = in_proj(ref_feats)
            f1 = in_proj(src_feats)
        else:
            # (B, N, A, C) -> (B, A, N, C)
            f0 = in_proj(jnp.swapaxes(ref_feats, 1, 2))
            f1 = in_proj(jnp.swapaxes(src_feats, 1, 2))

        transformer = RPEConditionalTransformer(
            blocks=self.blocks, d_model=self.hidden_dim, num_heads=self.num_heads,
            activation_fn=self.activation_fn, na=self.na or 4,
            attn_r_positive=self.attn_r_positive,
            attn_r_positive_rot_supervise=self.attn_r_positive_rot_supervise,
            attn_r_summ=self.attn_r_summ, attn_on_sub=self.attn_on_sub,
            attn_r_multihead=self.attn_r_multihead,
            align_mode=self.align_mode, d_equiv_embed=d_equiv_embed,
            return_attention_weights=self.supervise_rotation,
        )
        f0, f1, ref_feat_m, src_feat_m, am0, am1 = transformer(
            f0, f1, ref_emb, src_emb, masks0=ref_masks, masks1=src_masks,
            equiv_embed0=ref_eq_emb, equiv_embed1=src_eq_emb,
            ref_normal=ref_normal, src_normal=src_normal,
            use_flash=fused_attention,
            points0=ref_points if flash_self else None,
            points1=src_points if flash_self else None,
            stacked=stacked,
            use_flash_cross=fused_attention_cross,
            femb_pack=femb_pack,
        )
        return out_proj(f0), out_proj(f1), ref_feat_m, src_feat_m, am0, am1

r"""Positional / geometric-structure embeddings for the coarse transformer.

Port of ``geotransformer/modules/transformer/positional_embedding.py`` and
``geotransformer/modules/geotransformer/geotransformer.py:19-121``, with two
TPU-minded changes:

* All pairwise computations are masked (padded coarse points are excluded from
  k-NN triplet selection and produce zeroed embeddings).
* The equivariant spherical-harmonic embedding keeps the raw low-dimensional SH
  coefficients ``(B, A, N, M, D_eq)`` — the per-layer projection to d_model is
  folded into the attention score computation (see
  :class:`se3et_tpu.nn.attention.RPEMultiHeadAttention`) instead of
  materializing a (B, A, N, M, d_model) tensor as the reference does.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.core import harmonics
from se3et_tpu.ops import geometry
from se3et_tpu.nn.layers import torch_bias_init, torch_kernel_init

_PREC = jax.lax.Precision.HIGHEST


class SinusoidalPositionalEmbedding(nn.Module):
    """d-dim sinusoid of scalar indices (``positional_embedding.py:8-34``).

    Layout deviation: [sin | cos] concatenated instead of interleaved — the
    following learned projection absorbs any feature permutation, and the
    non-interleaved form lets XLA fuse sin/cos into the consumer matmul
    instead of materializing the (N, M, d) tensor through a shuffle.
    """

    d_model: int

    @nn.compact
    def __call__(self, indices):
        d = self.d_model
        div = jnp.exp(jnp.arange(0, d, 2) * (-np.log(10000.0) / d))
        ang = indices[..., None] * div
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class GeometricStructureEmbedding(nn.Module):
    """Pairwise distance + triplet-angle embedding (+ optional equivariant SH).

    Reference: ``geotransformer.py:19-121``.
    """

    hidden_dim: int
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    kanchor: int = 1
    n_level_equiv: int = 0

    @nn.compact
    def __call__(self, points, masks=None, fused=False, compute_equiv=True,
                 tables_only=False):
        """points: (B, N, 3); masks: (B, N) -> emb (B, N, N, C) [, eq (B, A, N, N, D)].

        ``fused=True`` computes the d/a sinusoid+projection tile-wise in one
        Pallas kernel (inference path; bf16 output) instead of materializing
        the (B, N, M, [k,] C) fp32 sinusoids.  ``compute_equiv=False`` skips
        the (B, A, N, M, D) SH materialization (the flash RPE attention
        recomputes the degree-1 term from raw coordinates in-kernel).
        ``tables_only=True`` computes NO embedding at all and returns
        ``(wd, wa, knn_points)`` — the in-attention fused-embedding serving
        path (``ops/pallas/rpe_attention.rpe_self_attention_femb``)
        recomputes the tiles from raw geometry in-kernel; the parameter
        declarations stay identical so checkpoints are interchangeable.
        """
        b, n, _ = points.shape
        c = self.hidden_dim
        wd = self.param("proj_d_kernel", torch_kernel_init(0), (c, c))
        bd = self.param("proj_d_bias", torch_bias_init(c), (c,))
        wa = self.param("proj_a_kernel", torch_kernel_init(0), (c, c))
        ba = self.param("proj_a_bias", torch_bias_init(c), (c,))

        sq = geometry.pairwise_distance(points, points)

        k = self.angle_k
        knn_sq = sq
        if masks is not None:
            knn_sq = jnp.where(masks[:, None, :], knn_sq, geometry.INF)
        # k+1 nearest, drop self (column 0)
        _, knn_idx = jax.lax.top_k(-knn_sq, k + 1)
        knn_idx = knn_idx[:, :, 1:]  # (B, N, k)
        knn_points = jnp.take_along_axis(
            points, knn_idx.reshape(b, n * k, 1), axis=1
        ).reshape(b, n, k, 3)

        if tables_only:
            return wd, wa, knn_points

        if fused and self.reduction_a == "max" and n % 8 == 0:
            from se3et_tpu.ops.pallas.embedding import (
                geometric_embedding_trainable,
            )

            # the trainable wrapper == the forward kernel when no gradient is
            # taken (serving); under jax.grad its custom VJP produces the
            # projection-parameter gradients (basis-space accumulation)
            emb = geometric_embedding_trainable(
                points, knn_points, wd, bd, wa, ba,
                float(self.sigma_d), float(self.sigma_a), 48.0,
                jax.default_backend() != "tpu",
            )
        else:
            from se3et_tpu import precision as prec

            dist = jnp.sqrt(sq)
            ref_vectors = knn_points - points[:, :, None, :]  # (B, N, k, 3)
            factor_a = 180.0 / (self.sigma_a * np.pi)
            div = jnp.exp(
                jnp.arange(0, c, 2) * (-np.log(10000.0) / c)
            )

            def sinusoid(idx):
                # [sin | cos] layout (see SinusoidalPositionalEmbedding)
                ang = idx[..., None] * div
                return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

            def block_emb(args):
                """Embedding for a block of query rows against all M columns."""
                pts_blk, dist_blk, ref_blk = args
                anc = points[:, None, :, :] - pts_blk[:, :, None, :]
                cross = jnp.cross(
                    ref_blk[:, :, None, :, :], anc[:, :, :, None, :]
                )  # (B, rb, M, k, 3)
                sin_values = jnp.linalg.norm(cross, axis=-1)
                cos_values = jnp.sum(
                    ref_blk[:, :, None, :, :] * anc[:, :, :, None, :], axis=-1
                )
                a_idx = jnp.arctan2(sin_values, cos_values) * factor_a
                d_emb = prec.cast_feature(
                    sinusoid(dist_blk / self.sigma_d)
                ) @ prec.cast_feature(wd) + bd
                a_emb = prec.cast_feature(
                    sinusoid(a_idx)
                ) @ prec.cast_feature(wa) + ba
                if self.reduction_a == "max":
                    a_emb = jnp.max(a_emb, axis=3)
                else:
                    a_emb = jnp.mean(a_emb, axis=3)
                return d_emb + a_emb  # (B, rb, M, C)

            # The (B, N, M, k, C) fp32 angle sinusoid is ~6 GB at production
            # coarse shapes (N=M=1024, k=3, C=256) — the single largest HBM
            # temp of the train step.  Chunk the query rows through
            # lax.map + per-block checkpoint so both forward temps and
            # backward residuals stay block-sized; the math is identical.
            rb = 64
            if n >= 256 and n % rb == 0:
                nb = n // rb
                xs = (
                    points.reshape(b, nb, rb, 3).transpose(1, 0, 2, 3),
                    dist.reshape(b, nb, rb, n).transpose(1, 0, 2, 3),
                    ref_vectors.reshape(b, nb, rb, k, 3).transpose(1, 0, 2, 3, 4),
                )
                blocks = jax.lax.map(jax.checkpoint(block_emb), xs)
                emb = blocks.transpose(1, 0, 2, 3, 4).reshape(b, n, n, c)
            else:
                emb = block_emb((points, dist, ref_vectors))

        if self.n_level_equiv > 0 and self.kanchor > 1 and compute_equiv:
            eq = self._equiv_embedding(points)
            return emb, eq
        return emb, None

    def _equiv_embedding(self, points):
        """Per-anchor Wigner-rotated SH of pair directions (``geotransformer.py:57-67``)."""
        degrees = list(range(self.n_level_equiv))
        space = anchor_lib.get_anchor_space(
            self.kanchor, {4: 3, 6: 4, 12: 5}.get(self.kanchor, 1)
        )
        wd = harmonics.anchor_wigner_d(degrees, space.anchors)
        diff = points[:, :, None, :] - points[:, None, :, :]  # (B, N, M, 3)
        sh = harmonics.real_sh(degrees, diff, xp=jnp)  # (B, N, M, D)
        outs = []
        off = 0
        for l in degrees:
            d = harmonics.sh_dim(l)
            block = sh[..., off : off + d]
            outs.append(
                jnp.einsum("acd,bnmd->banmc", jnp.asarray(wd[l]), block, precision=_PREC)
            )
            off += d
        return jnp.concatenate(outs, axis=-1)  # (B, A, N, M, D)

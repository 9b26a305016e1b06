r"""Rotation-supervision / anchor-matching heads.

Ports of ``geotransformer/modules/transformer/rotation_supervision.py``
(:class:`RotationAttentionLayer`) and
``geotransformer/modules/transformer/permutation_invariant.py``
(:class:`PermutationInvariantLayer`) — auxiliary heads used by the
``supervise_rotation`` / ``anchor_matching`` experiment modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.nn.layers import TorchLinear

_PREC = jax.lax.Precision.HIGHEST


class RotationAttentionLayer(nn.Module):
    """Cross-anchor similarity at matched node pairs, normalized to [0, 1].

    Reference: ``rotation_supervision.py:6-46``.
    """

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, ref_feats_m, src_feats_m, ref_corr_indices, src_corr_indices):
        """feats_m: (B, A, N, C); corr_indices: (P,) -> (B, A, A) similarity."""
        h = self.num_heads
        q = TorchLinear(self.d_model)(ref_feats_m)
        k = TorchLinear(self.d_model)(src_feats_m)

        def heads(x):
            b, a, n, c = x.shape
            return jnp.moveaxis(x.reshape(b, a, n, h, c // h), 3, 2)

        q, k = heads(q), heads(k)  # (B, A, H, N, c)
        qm = q[:, :, :, ref_corr_indices]
        km = k[:, :, :, src_corr_indices]

        def norm_nc(x):
            flat = x.reshape(x.shape[:3] + (-1,))
            flat = flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + 1e-9)
            return flat.reshape(x.shape)

        qm, km = norm_nc(qm), norm_nc(km)
        sim = jnp.einsum("bahnc,behnc->baeh", qm, km, precision=_PREC)
        return (jnp.mean(sim, axis=3) + 1.0) / 2.0


class PermutationInvariantLayer(nn.Module):
    """GT-rotation-aligned anchor permutation + A*C -> C compression.

    Reference: ``permutation_invariant.py:12-88``.
    """

    na: int
    d_model: int

    @nn.compact
    def __call__(self, ref_feats_m, src_feats_m, gt_transform):
        space = anchor_lib.get_anchor_space(self.na, {4: 3, 6: 4}[self.na])
        rotations = jnp.asarray(space.rotations)
        trace_ori = jnp.asarray(space.trace_idx_ori)
        gt_r = gt_transform[:3, :3]
        cos = 0.5 * (jnp.einsum("rji,ji->r", rotations, gt_r) - 1.0)
        label = jnp.argmax(cos)
        perm = trace_ori[label]  # (A,)
        src_aligned = src_feats_m[:, perm]  # (B, A, N, C)

        fc2 = TorchLinear(self.d_model)

        def compress(x):
            b, a, n, c = x.shape
            return fc2(jnp.moveaxis(x, 1, 2).reshape(b, n, a * c))

        return ref_feats_m, src_aligned, compress(ref_feats_m), compress(src_aligned)

r"""Invariant KPConv + KPConv-FPN backbone (GeoTransformer baseline).

TPU-native port of ``geotransformer/modules/kpconv/{kpconv,modules}.py`` and
``experiments/geotransformer.3dmatch/backbone.py``.  Tensors carry a leading
cloud/batch axis: ``x (B, N, C)``, ``neighbors (B, N, H)`` (sentinel = N).

Deviation from the reference: KPConv normalizes by the neighbor count, which the
reference estimates as ``#{h : sum_c feats[h] > 0}`` (``kpconv/kpconv.py:113``)
— an artifact of the zero pad row that miscounts real neighbors whose feature
sum is negative.  We count valid (non-sentinel) neighbor indices, the intended
semantics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu import precision as prec
from se3et_tpu.core import kernel_points as kp_lib
from se3et_tpu.nn.epn import _influence_weights, max_pool_neighbors, nearest_upsample
from se3et_tpu.nn.layers import MaskedGroupNorm, TorchLinear, UnaryBlock

_PREC = jax.lax.Precision.HIGHEST


class KPConv(nn.Module):
    """Rigid kernel-point convolution (``kpconv/kpconv.py:10-133``)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    use_bias: bool = False

    def setup(self):
        kp = kp_lib.load_kernels(
            self.radius, self.kernel_size, dimension=3, fixed="center", equiv_mode=True
        )
        self.kernel_points = jnp.asarray(kp)
        fan_in = self.in_channels * self.out_channels  # torch fan-in convention
        bound = 1.0 / np.sqrt(fan_in)
        self.weights = self.param(
            "weights",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (self.kernel_size, self.in_channels, self.out_channels),
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )

    def __call__(self, x, q_points, s_points, neighbor_indices, influence=None):
        """x: (B, Ns, C) -> (B, Nq, Cout)."""
        w = influence
        if w is None:
            w = _influence_weights(
                q_points, s_points, neighbor_indices, self.kernel_points, self.sigma
            )  # (B, Nq, H, K)
        num_s = s_points.shape[1]
        safe = jnp.clip(neighbor_indices, 0, num_s - 1)
        x = prec.cast_feature(x)
        w = prec.cast_feature(w)
        nbr_x = jnp.take_along_axis(
            x, safe.reshape(safe.shape[0], -1, 1), axis=1
        ).reshape(safe.shape + (x.shape[-1],))
        valid = neighbor_indices < num_s
        nbr_x = jnp.where(valid[..., None], nbr_x, 0.0)

        # host-precomputed influence may carry zero h-padding
        wf = jnp.einsum(
            "bnhc,bnhk->bnkc", nbr_x,
            w[:, :, : neighbor_indices.shape[2]], precision=prec.feature(),
        )
        out = jnp.einsum(
            "bnkc,kcd->bnd", wf, prec.cast_feature(self.weights),
            precision=prec.feature(),
        ).astype(jnp.float32)
        count = jnp.maximum(jnp.sum(valid, axis=-1), 1)
        out = out / count[..., None]
        if self.use_bias:
            out = out + self.bias
        return out


class ConvBlock(nn.Module):
    """KPConv -> GroupNorm -> LeakyReLU (``kpconv/modules.py ConvBlock``)."""

    in_dim: int
    out_dim: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int

    @nn.compact
    def __call__(self, x, q_points, s_points, neighbor_indices, q_mask=None,
                 influence=None):
        x = KPConv(self.in_dim, self.out_dim, self.kernel_size, self.radius, self.sigma)(
            x, q_points, s_points, neighbor_indices, influence=influence
        )
        x = MaskedGroupNorm(self.group_norm)(x, q_mask)
        return jax.nn.leaky_relu(x, 0.1)


class ResidualBlock(nn.Module):
    """Bottleneck residual block (``kpconv/modules.py ResidualBlock``)."""

    in_dim: int
    out_dim: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False

    @nn.compact
    def __call__(self, x, q_points, s_points, neighbor_indices, q_mask=None,
                 s_mask=None, influence=None):
        if s_mask is None:
            s_mask = q_mask if not self.strided else None
        mid = self.out_dim // 4
        skip = x
        h = UnaryBlock(mid, self.group_norm)(x, s_mask) if self.in_dim != mid else x
        h = ConvBlock(
            mid, mid, self.kernel_size, self.radius, self.sigma, self.group_norm
        )(h, q_points, s_points, neighbor_indices, q_mask, influence=influence)
        h = UnaryBlock(self.out_dim, self.group_norm, no_relu=True)(h, q_mask)
        if self.strided:
            skip = max_pool_neighbors(skip, neighbor_indices)
        if self.in_dim != self.out_dim:
            skip = UnaryBlock(self.out_dim, self.group_norm, no_relu=True)(skip, q_mask)
        return jax.nn.leaky_relu(h + skip, 0.1)


class KPConvFPN(nn.Module):
    """4/5-stage KPConv encoder + FPN decoder to the fine stage.

    Port of ``experiments/geotransformer.3dmatch/backbone.py:8-87``.  Returns
    ``(feats_f, feats_c)``: invariant fine features (stage 1) and invariant
    coarse features (last stage, width init_dim * 2^stages).
    """

    input_dim: int
    output_dim: int
    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    num_stages: int = 4

    @nn.compact
    def __call__(self, feats, pyramid):
        d = self.init_dim
        r, s = self.init_radius, self.init_sigma
        pts = [pyramid[f"points_{i}"] for i in range(self.num_stages)]
        msk = [pyramid[f"masks_{i}"] for i in range(self.num_stages)]
        nbs = [pyramid[f"neighbors_{i}"] for i in range(self.num_stages)]
        subs = [pyramid[f"subsampling_{i}"] for i in range(self.num_stages - 1)]
        ups = [pyramid[f"upsampling_{i}"] for i in range(self.num_stages - 1)]

        def make_influence(radius, sigma, q, sup, idx, key):
            # host-precomputed geometry fast path (data/influence.py)
            pre = pyramid.get(key)
            if (
                pre is not None
                and pre.shape[:2] == idx.shape[:2]
                and pre.shape[2] >= idx.shape[2]
                and pre.shape[-1] == self.kernel_size
            ):
                return prec.cast_feature(pre)
            kp = kp_lib.load_kernels(radius, self.kernel_size, dimension=3,
                                     fixed="center", equiv_mode=True)
            return _influence_weights(q, sup, idx, jnp.asarray(kp), sigma)

        inf_same = [make_influence(r, s, pts[0], pts[0], nbs[0],
                                   "influence_same_0")]
        inf_sub = [None]
        for st in range(1, self.num_stages):
            mult = 2 ** (st - 1)
            inf_sub.append(
                make_influence(r * mult, s * mult, pts[st], pts[st - 1],
                               subs[st - 1], f"influence_sub_{st}")
            )
            inf_same.append(
                make_influence(r * mult * 2, s * mult * 2, pts[st], pts[st],
                               nbs[st], f"influence_same_{st}")
            )

        x = ConvBlock(self.input_dim, d, self.kernel_size, r, s, self.group_norm)(
            feats, pts[0], pts[0], nbs[0], msk[0], influence=inf_same[0]
        )
        x = ResidualBlock(d, d * 2, self.kernel_size, r, s, self.group_norm)(
            x, pts[0], pts[0], nbs[0], msk[0], influence=inf_same[0]
        )
        stage_feats = [x]
        dims = [d * 2]
        for st in range(1, self.num_stages):
            mult = 2 ** (st - 1)
            in_dim = dims[-1]
            x = ResidualBlock(
                in_dim, in_dim, self.kernel_size, r * mult, s * mult, self.group_norm,
                strided=True,
            )(x, pts[st], pts[st - 1], subs[st - 1], msk[st], s_mask=msk[st - 1],
              influence=inf_sub[st])
            x = ResidualBlock(
                in_dim, in_dim * 2, self.kernel_size, r * mult * 2, s * mult * 2,
                self.group_norm,
            )(x, pts[st], pts[st], nbs[st], msk[st], influence=inf_same[st])
            x = ResidualBlock(
                in_dim * 2, in_dim * 2, self.kernel_size, r * mult * 2, s * mult * 2,
                self.group_norm,
            )(x, pts[st], pts[st], nbs[st], msk[st], influence=inf_same[st])
            stage_feats.append(x)
            dims.append(in_dim * 2)

        feats_c = stage_feats[-1]
        latent = feats_c
        for st in range(self.num_stages - 2, 0, -1):
            latent = nearest_upsample(latent, ups[st])
            latent = jnp.concatenate([latent, stage_feats[st]], axis=-1)
            if st > 1:
                latent = UnaryBlock(dims[st], self.group_norm)(latent, msk[st])
            else:
                latent = TorchLinear(self.output_dim)(latent)
        return latent, feats_c

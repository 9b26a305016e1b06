r"""Common NN layers (flax.linen) with PyTorch-matched initialization.

Replaces ``geotransformer/modules/layers`` and the norm/activation blocks in
``geotransformer/modules/e2pn/blocks_epn.py`` (GroupNormEPN, UnaryBlockEPN).

Initializers reproduce the PyTorch defaults the reference relies on
(``kaiming_uniform_(w, a=sqrt(5))`` == U(±1/sqrt(fan_in)); Linear bias
U(±1/sqrt(fan_in))) so training dynamics match (SURVEY §7.4 hard part 5).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu import precision as prec

# model-wide GroupNorm statistics policy (trace-time, like the precision
# module): False = per-cloud stats, True = joint ref+src stats (the
# reference's stacked-pair semantics)
_GN_JOINT = False


def set_gn_joint_stats(flag: bool) -> None:
    global _GN_JOINT
    _GN_JOINT = bool(flag)


def torch_kernel_init(in_axis: int | Sequence[int] = -2):
    """U(±1/sqrt(fan_in)) — PyTorch's kaiming_uniform(a=sqrt(5)) for Linear."""

    def init(key, shape, dtype=jnp.float32):
        axes = (in_axis,) if isinstance(in_axis, int) else tuple(in_axis)
        fan_in = 1
        for ax in axes:
            fan_in *= shape[ax]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Linear with PyTorch default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(0), (in_features, self.features)
        )
        x = prec.cast_feature(x)
        y = jnp.einsum("...i,io->...o", x, prec.cast_feature(kernel))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + prec.cast_feature(bias)
        return y


def build_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.1)
    if name == "gelu":
        return jax.nn.gelu
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unknown activation {name}")


class MaskedGroupNorm(nn.Module):
    """GroupNorm over (optional anchors, valid points, group channels).

    Port of ``GroupNormEPN`` (``blocks_epn.py:684-701``): the reference feeds
    the stacked cloud as one instance of torch GroupNorm with layout
    (1, C, A, N), i.e. statistics span all points, anchors and the channels of
    a group — the ref and src clouds of a pair share statistics.  Here
    statistics are computed per cloud (leading batch axis) by default and
    padded points are excluded via ``mask``; ``joint_stats=True`` reduces over
    the cloud axis too, reproducing the reference's joint ref+src
    normalization exactly (ablation knob; see BENCH.md).
    """

    num_groups: int
    epsilon: float = 1e-5
    # None -> use the model-wide policy (set_gn_joint_stats)
    joint_stats: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None):
        """x: (B, N, C) or (B, N, A, C); mask: (B, N) True = valid."""
        joint = self.joint_stats if self.joint_stats is not None else _GN_JOINT
        c = x.shape[-1]
        g = min(self.num_groups, c)
        assert c % g == 0, (c, g)
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        orig_shape = x.shape
        # (B, N, [A], G, C/G); single-pass sum/sum-of-squares statistics
        xg = x.reshape(orig_shape[:-1] + (g, c // g))
        red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        if joint:
            red_axes = (0,) + red_axes
        if mask is None:
            s1 = jnp.sum(xg, axis=red_axes, keepdims=True)
            s2 = jnp.sum(xg * xg, axis=red_axes, keepdims=True)
            denom = float(np.prod([xg.shape[a] for a in red_axes]))
        else:
            m = mask.reshape(mask.shape + (1,) * (xg.ndim - mask.ndim)).astype(x.dtype)
            xm = xg * m  # padded rows (already zeroed upstream) contribute 0
            s1 = jnp.sum(xm, axis=red_axes, keepdims=True)
            s2 = jnp.sum(xm * xg, axis=red_axes, keepdims=True)
            per_point = 1
            for ax in red_axes:
                if ax >= mask.ndim:
                    per_point *= xg.shape[ax]
            counts = jnp.sum(mask.astype(x.dtype), axis=1)  # (B,)
            if joint:
                counts = jnp.sum(counts, keepdims=True)  # clouds share stats
            denom = (
                counts.reshape((counts.shape[0],) + (1,) * (xg.ndim - 1))
                * per_point
                + 1e-9
            )
        mean = s1 / denom
        var = jnp.maximum(s2 / denom - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = (xg - mean) * inv
        out = out.reshape(orig_shape) * scale + bias
        # NOTE: no trailing re-mask pass — padded rows are never read downstream
        # (sentinel-index gathers and masked attention/losses).
        return out.astype(in_dtype)


class LayerNorm(nn.Module):
    """Affine LayerNorm over the channel axis (torch nn.LayerNorm)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (y * scale + bias).astype(in_dtype)


class UnaryBlock(nn.Module):
    """Linear -> GroupNorm -> LeakyReLU(0.1).

    Port of ``kpconv/modules.py UnaryBlock`` / ``UnaryBlockEPN``
    (``blocks_epn.py:639-665``); works on both invariant (B, N, C) and
    equivariant (B, N, A, C) tensors.
    """

    out_dim: int
    group_norm: int
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        x = TorchLinear(self.out_dim)(x)
        x = MaskedGroupNorm(self.group_norm)(x, mask)
        if not self.no_relu:
            x = jax.nn.leaky_relu(x, 0.1)
        return x


class LastUnaryBlock(nn.Module):
    """Plain Linear output head (``LastUnaryBlockEPN``, ``blocks_epn.py:668-681``)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        return TorchLinear(self.out_dim)(x)

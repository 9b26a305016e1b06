r"""Pallas TPU kernels: flash-style equivariant cross attention.

The EQ cross-attention (``nn/attention.MultiHeadAttentionEQ``, reference
``vanilla_transformer.py:87-870``) scores every (query-anchor, key-anchor)
pair: ``s_ae = q . k`` of shape (A, E, H, N, M).  At flagship shapes
(A=E=6, H=4, N=M~1000) that is a ~150M-element tensor the XLA path
materializes **twice** (scores + softmax) plus a global pooled read — ~1 GB
of HBM traffic per cross layer for ~40 GFLOP of MXU work.  These kernels
restructure it flash-attention style:

* **stats pass**: stream (bn, M) score blocks per (a, e); emit only the
  per-row softmax max/sum-exp, the globally pooled positive-score sum
  (-> anchor/rotation weights), and optionally the rotation-supervision
  block max.  Nothing (A, E, N, M)-shaped ever leaves VMEM.
* tiny O(A*E) weight math stays in plain jnp outside.
* **apply pass**: recompute the score block, softmax with the precomputed
  row stats, and accumulate ``sum_e w[a,e] * softmax(s[a,e]) @ v[e]`` into
  an (A, H, N, c) output, iterating key anchors innermost.

Recomputing scores costs one extra q@k pass (~20 GFLOP, well under a ms on
the MXU) and saves the ~1 GB round-trip — the standard flash trade.

Forward-only (serving path): the training path keeps the XLA formulation
(which autodiff handles), mirroring the backbone's ``fused`` convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _positive(x, mode):
    if mode is None:
        return x
    if mode == "sq":
        return x * x
    if mode == "abs":
        return jnp.abs(x)
    if mode == "relu":
        return jax.nn.relu(x)
    if mode == "sigmoid":
        return jax.nn.sigmoid(x)
    if mode == "leakyrelu":
        return jax.nn.leaky_relu(x, 0.1)
    if mode == "softplus":
        return jax.nn.softplus(x)
    if mode == "minus":
        return (x + 1.0) / 2.0
    raise ValueError(mode)


def _stats_kernel(q_ref, k_ref, qm_ref, km_ref, sup_q_ref, sup_k_ref,
                  rowmax_ref, rowsum_ref, gsum_ref, supmax_ref,
                  *, num_heads, scale, positive, with_sup):
    """Per-(a, e, n-block): softmax row stats + pooled positive scores."""
    kmask = km_ref[0]  # (M,) f32 0/1
    qmask = qm_ref[0]  # (bn,)
    bn = q_ref.shape[2]
    m = k_ref.shape[2]

    hacc = jnp.zeros((bn, m), jnp.float32)
    supacc = jnp.zeros((bn, m), jnp.float32) if with_sup else None
    for h in range(num_heads):
        # bf16 operands feed the MXU directly; f32 accumulation via
        # preferred_element_type (an explicit astype would force f32 matmul)
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bn, M)
        hacc = hacc + s
        if with_sup:
            supacc = supacc + s * (sup_q_ref[0, h] * sup_k_ref[0, h])
        sm = jnp.where(kmask[None, :] > 0, s, _NEG)
        mx = jnp.max(sm, axis=1)  # (bn,)
        rowmax_ref[0, 0, h] = mx
        rowsum_ref[0, 0, h] = jnp.sum(
            jnp.exp(sm - mx[:, None]) * kmask[None, :], axis=1
        )

    g = _positive(hacc * (1.0 / num_heads), positive)
    g = g * qmask[:, None] * kmask[None, :]
    # scalar partials broadcast into one (8, 128) tile: Mosaic requires
    # output block minor dims divisible by (8, 128); 590 KB total at A=E=6
    gsum_ref[0, 0, 0] = jnp.broadcast_to(jnp.sum(g), (8, 128))
    if with_sup:
        sup = jnp.where(
            (qmask[:, None] > 0) & (kmask[None, :] > 0),
            supacc * (1.0 / num_heads), _NEG,
        )
        supmax_ref[0, 0, 0] = jnp.broadcast_to(jnp.max(sup), (8, 128))


def _apply_kernel(q_ref, k_ref, v_ref, w_ref, rowmax_ref, rowsum_ref, km_ref,
                  out_ref, acc, *, num_heads, scale):
    """Per-(a, n-block), key anchors e innermost: accumulate the weighted
    softmax-attention output without materializing scores."""
    e = pl.program_id(2)
    kmask = km_ref[0]  # (M,)

    @pl.when(e == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # w_ae arrives as a grid-indexed (8, 128) broadcast tile — a dynamic
    # lane index into a raw (A, E) array cannot be lowered (Mosaic requires
    # lane indices provably multiple-of-128)
    w = w_ref[0, 0, 0, 0]
    for h in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bn, M)
        # mask BEFORE the exp (mirrors _stats_kernel): rowmax covers valid
        # keys only, so a masked key whose raw score exceeds it by >~88
        # would overflow exp to inf and inf*0 = NaN
        s = jnp.where(kmask[None, :] > 0, s, _NEG)
        p = jnp.exp(s - rowmax_ref[0, 0, h][:, None]) * kmask[None, :]
        # match the XLA path's softmax.astype(v.dtype) before the value einsum
        p = p.astype(v_ref.dtype)
        o = jax.lax.dot_general(
            p, v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, c)
        inv = 1.0 / jnp.maximum(rowsum_ref[0, 0, h], 1e-30)
        acc[h] += (w * inv)[:, None] * o

    @pl.when(e == pl.num_programs(2) - 1)
    def _flush():
        out_ref[0] = acc[:]


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("positive", "with_sup", "block_n", "interpret"),
)
def eq_attention_stats(
    q, k, q_masks, k_masks, sup_q=None, sup_k=None, *,
    positive="sq", with_sup=False, block_n=256, interpret=False,
):
    """q: (A, H, N, c), k: (E, H, M, c); masks (N,), (M,) bool.

    Returns (rowmax (A,E,H,N), rowsum (A,E,H,N), attn_ae (A,E)[, sup (A,E)]):
    softmax row statistics and the masked-mean pooled positive head-mean
    scores (and, with ``with_sup``, the masked max of the normalized-feature
    head-mean, reference ``vanilla_transformer.py:298-310``).
    """
    a, h, n, c = q.shape
    e, _, m, _ = k.shape
    scale = 1.0 / np.sqrt(c)

    bn = min(block_n, n)
    n_pad = -(-n // bn) * bn
    m_pad = -(-m // 128) * 128
    qp = _pad_to(q, n_pad, 2)
    kp = _pad_to(k, m_pad, 2)
    qm = _pad_to(q_masks.astype(jnp.float32), n_pad, 0)[None]
    km = _pad_to(k_masks.astype(jnp.float32), m_pad, 0)[None]
    if not with_sup:
        sup_q = jnp.zeros((a, h, 1), jnp.float32)
        sup_k = jnp.zeros((e, h, 1), jnp.float32)
    nb = n_pad // bn

    rowmax, rowsum, gsum, supmax = pl.pallas_call(
        functools.partial(
            _stats_kernel, num_heads=h, scale=scale, positive=positive,
            with_sup=with_sup,
        ),
        grid=(a, e, nb),
        in_specs=[
            pl.BlockSpec((1, h, bn, c), lambda i, j, t: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, c), lambda i, j, t: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i, j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1), lambda i, j, t: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, bn), lambda i, j, t: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, bn), lambda i, j, t: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 8, 128), lambda i, j, t: (i, j, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 8, 128), lambda i, j, t: (i, j, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((a, e, h, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((a, e, h, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((a, e, nb, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((a, e, nb, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, qm, km, sup_q, sup_k)

    counts = jnp.sum(q_masks) * jnp.sum(k_masks)
    attn_ae = jnp.sum(gsum[..., 0, 0], axis=-1) / (
        counts.astype(jnp.float32) + 1e-9
    )
    rowmax = rowmax[..., :n]
    rowsum = rowsum[..., :n]
    if with_sup:
        return rowmax, rowsum, attn_ae, jnp.max(supmax[..., 0, 0], axis=-1)
    return rowmax, rowsum, attn_ae


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def eq_attention_apply(
    q, k, v, w_ae, rowmax, rowsum, k_masks, *, block_n=256, interpret=False,
):
    """hidden[a] = sum_e w_ae[a,e] * softmax_m(q[a] . k[e]) @ v[e].

    q: (A, H, N, c); k, v: (E, H, M, c); w_ae: (A, E) f32;
    rowmax/rowsum: (A, E, H, N) from :func:`eq_attention_stats`.
    Returns (A, H, N, c) float32.
    """
    a, h, n, c = q.shape
    e, _, m, _ = k.shape
    scale = 1.0 / np.sqrt(c)

    bn = min(block_n, n)
    n_pad = -(-n // bn) * bn
    m_pad = -(-m // 128) * 128
    qp = _pad_to(q, n_pad, 2)
    kp = _pad_to(k, m_pad, 2)
    vp = _pad_to(v, m_pad, 2)
    km = _pad_to(k_masks.astype(jnp.float32), m_pad, 0)[None]
    rmx = _pad_to(rowmax, n_pad, 3)
    rsm = _pad_to(rowsum, n_pad, 3, value=1.0)
    nb = n_pad // bn

    out = pl.pallas_call(
        functools.partial(_apply_kernel, num_heads=h, scale=scale),
        grid=(a, nb, e),
        in_specs=[
            pl.BlockSpec((1, h, bn, c), lambda i, t, j: (i, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, c), lambda i, t, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, m_pad, c), lambda i, t, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda i, t, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),  # w_ae broadcast tiles
            pl.BlockSpec((1, 1, h, bn), lambda i, t, j: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, bn), lambda i, t, j: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i, t, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, bn, c), lambda i, t, j: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, h, n_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, bn, c), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp,
      jnp.broadcast_to(
          w_ae.astype(jnp.float32)[:, :, None, None], (a, e, 8, 128)
      ),
      rmx, rsm, km)

    return out[:, :, :n]

r"""Pallas TPU kernel: flash-style RPE self-attention over the coarse stage.

The RPE self-attention layers (``nn/attention.RPEMultiHeadAttention``,
reference ``rpe_transformer.py:18-131``) are HBM-bound at flagship shapes
(N=M~1024, C=256, A=6, H=4): each layer reads the full (B, N, M, C) geometric
embedding (~1 GB bf16) and the equivariant layers materialize ~200 MB
(B, A, H, N, M) f32 score tensors twice (scores + softmax).  This kernel
restructures one layer flash-attention style:

* every projection is folded into the *query* outside the kernel
  (``qp = q @ Wp^T`` for the positional term; the Wigner-D blocks fold into
  the SH term's query, see :func:`fold_equivariant_query`), so the kernel
  only ever contracts query blocks against embedding tiles;
* row-constant score terms (the ``q . bias`` broadcasts and the degree-0 SH
  term) are *dropped* — adding a per-query constant to every key's score is
  a softmax no-op;
* the degree-1 SH term needs no embedding tensor at all:
  ``s_eq = c1/r * (qw_y dy + qw_z dz + qw_x dx)`` is computed on the VPU
  from the raw point coordinates (``harmonics.real_sh`` degree-1 layout);
* scores never leave VMEM: an online softmax (running row max / sum with
  rescaled accumulators) streams the key/embedding tiles once.

Anchor and head axes are independent in self-attention, so equivariant
(A, H) collapses to one AH batch axis.  Forward-only (serving path); training
keeps the XLA formulation, mirroring the backbone's ``fused`` convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
# real_sh degree-1 coefficient (core/harmonics.py:45)
_SH1_C = float(np.sqrt(3.0 / (4.0 * np.pi)))


def _scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref, gm_ref,
            *, scale, with_eq):
    """Masked scaled score tile (AH, bn, bm) + the diag-zeroed ``rinv``
    factor (shared by forward, backward recompute, and the dqw reduction).

    The degree-1 SH term is evaluated as two plain MXU matmuls against
    precomputed geometry-row tensors (see :func:`_fold_geom`):

    * ``r^2 = gn^T @ gm[8:16]`` — the ``|pn|^2 + |pm|^2 - 2 pn.pm``
      expansion; no pairwise-difference broadcasts.
    * ``qw.(pn - pm) = qw8 @ gm[0:8]`` — the per-query ``qw.pn`` constant is
      folded into ``qw8`` column 0 outside the kernel, so the pairwise
      numerator is one ``(AH*bn, 8) @ (8, bm)`` contraction.

    The earlier per-component broadcast AND n-batched 3-wide dot_general
    formulations both crashed the Mosaic compile helper on real TPU
    (opaque subprocess exit 1); every pattern used here is probe-validated
    by ``scripts/mosaic_probe.py``.  The diagonal is zeroed explicitly via
    the index rows (``gn[5]`` / ``gm[5]``): the expansion cannot reproduce
    the XLA path's exact 0/eps = 0 at r=0 (``core/harmonics.real_sh``), and
    a catastrophically cancelled r^2 ~ 0 there would blow up ``rinv``.
    """
    kmask = km_ref[0, 0]  # (bm,) f32 0/1

    # content scores, batched over anchor-heads: (AH, bn, bm)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # positional scores, batched over query rows: (bn, AH, bm)
    sp = jax.lax.dot_general(
        qp_ref[0], emb_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s + jnp.transpose(sp, (1, 0, 2))

    rinvk = None
    if with_eq:
        gn = gn_ref[0]  # (8, bn)  rows (x, y, z, |p|^2, 1, idx, 0, 0)
        gm = gm_ref[0]  # (16, bm)  see _fold_geom
        r2 = jax.lax.dot_general(
            gn, gm[8:16], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bn, bm)
        rinv = _SH1_C / (jnp.sqrt(jnp.maximum(r2, 0.0)) + 1e-12)
        didx = gn[5][:, None] - gm[5][None, :]
        rinvk = jnp.where(didx * didx > 0.25, rinv, 0.0)
        ah, bn = qw_ref.shape[1], qw_ref.shape[2]
        pre = jax.lax.dot_general(
            qw_ref[0].reshape(ah * bn, 8), gm[0:8],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(ah, bn, gm.shape[1])
        s = s + rinvk[None] * pre

    s = s * scale
    s = jnp.where(kmask[None, None, :] > 0, s, _NEG)
    return s, rinvk


def _fold_geom(qw, points, nb, block_n):
    """Geometry-row tensors for the in-kernel degree-1 SH matmuls.

    qw:     (B, 3, AH, N) — component rows (y, z, x), see
            :func:`fold_equivariant_query`.
    points: (B, 4, N) f32 — coordinate rows x, y, z (+ pad).
    Returns (with the (B, nb) axes FOLDED into one leading dim — 5-D operands
    plus a dynamic batch grid index crash this Mosaic version; every operand
    stays <= 4-D and the index map does ``bi * nb + i``)
      qw8_b: (B*nb, AH, block_n, 8) — cols (qw.p_yzx, qw_y, qw_z, qw_x, 0..)
      gn_b:  (B*nb, 8, block_n)     — rows (x, y, z, |p|^2, 1, idx, 0, 0)
      gm:    (B, 16, N)             — rows 0-7 the numerator side
             (1, -y, -z, -x, 0, idx, 0, 0), rows 8-15 the r^2 side
             (-2x, -2y, -2z, 1, |p|^2, 0, 0, 0).  The index rows pair with
             zeros in the contractions (qw8 col 5 / gn row 5 x gm row 13)
             and exist only for the in-kernel diagonal test.
    """
    b, _, ah, n = qw.shape
    x, y, z = points[:, 0], points[:, 1], points[:, 2]  # (B, N)
    sq = x * x + y * y + z * z
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[None], (b, n)
    )
    gn = jnp.stack([x, y, z, sq, one, idx, zero, zero], axis=1)
    gn_b = gn.reshape(b, 8, nb, block_n).transpose(0, 2, 1, 3)
    gn_b = gn_b.reshape(b * nb, 8, block_n)
    gm = jnp.stack(
        [one, -y, -z, -x, zero, idx, zero, zero,
         -2.0 * x, -2.0 * y, -2.0 * z, one, sq, zero, zero, zero],
        axis=1,
    )
    qdot = (qw[:, 0] * y[:, None] + qw[:, 1] * z[:, None]
            + qw[:, 2] * x[:, None])  # (B, AH, N)
    zq = jnp.zeros_like(qdot)
    qw8 = jnp.stack(
        [qdot, qw[:, 0], qw[:, 1], qw[:, 2], zq, zq, zq, zq], axis=-1
    )  # (B, AH, N, 8)
    qw8_b = qw8.reshape(b, ah, nb, block_n, 8).transpose(0, 2, 1, 3, 4)
    qw8_b = qw8_b.reshape(b * nb, ah, block_n, 8)
    return qw8_b, gn_b, gm


def _kernel(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
            gm_ref, out_ref, mx_ref, sm_ref, acc, rowmax, rowsum,
            *, ah, bn, bm, c, scale, with_eq):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        rowmax[...] = jnp.full_like(rowmax, -jnp.inf)
        rowsum[...] = jnp.zeros_like(rowsum)

    kmask = km_ref[0, 0]  # (bm,) f32 0/1
    s, _ = _scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
                   gm_ref, scale=scale, with_eq=with_eq)

    tmax = jnp.max(s, axis=2)  # (AH, bn)
    new_max = jnp.maximum(rowmax[...], tmax)
    alpha = jnp.exp(rowmax[...] - new_max)
    p = jnp.exp(s - new_max[:, :, None]) * kmask[None, None, :]
    rowsum[...] = rowsum[...] * alpha + jnp.sum(p, axis=2)
    # match the XLA path's softmax.astype(v.dtype) before the value matmul
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (AH, bn, c)
    acc[...] = acc[...] * alpha[:, :, None] + pv
    rowmax[...] = new_max

    @pl.when(j == pl.num_programs(2) - 1)
    def _flush():
        out_ref[0] = acc[...] / jnp.maximum(rowsum[...], 1e-30)[:, :, None]
        mx_ref[0] = rowmax[...]
        sm_ref[0] = rowsum[...]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_n", "block_m", "interpret"),
)
def _rpe_fwd(q, k, v, qp, emb, k_masks, qw=None, points=None, *,
             scale, block_n=64, block_m=256, interpret=False):
    """Flash RPE self-attention: one fused softmax(QK + RPE [+ SH]) @ V.

    q, k, v:  (B, AH, N, c) — anchor-heads flattened
    qp:       (B, N, AH, C) — positional query ``q @ Wp^T`` (head-split Wp)
    emb:      (B, N, N, C)  — materialized geometric embedding (bf16)
    k_masks:  (B, N) bool   — True = valid key
    qw:       (B, 3, AH, N) — Wigner-folded degree-1 SH query (y, z, x rows;
              see :func:`fold_equivariant_query`), or None
    points:   (B, 4, N) f32 — coordinate rows x, y, z (+ zero pad), required
              with ``qw``
    Returns   (B, AH, N, c) f32.

    N must be divisible by ``block_n`` and ``block_m`` (the flagship coarse
    stage is padded to 1024).  Row-constant score terms (projection biases,
    degree-0 SH) must NOT be included in the folded queries — the kernel
    relies on softmax shift invariance to skip them.
    """
    b, ah, n, c = q.shape
    assert n % block_n == 0 and n % block_m == 0, (n, block_n, block_m)
    assert emb.shape[1] == n and emb.shape[2] == n, emb.shape
    cc = emb.shape[3]
    with_eq = qw is not None
    if not with_eq:
        qw = jnp.zeros((b, 3, ah, n), jnp.float32)
        points = jnp.zeros((b, 4, n), jnp.float32)

    km = k_masks.astype(jnp.float32)[:, None]  # (b, 1, n): a 2-D
    # (1, block_m) mask block violates Mosaic's last-two-dims rule for b > 1
    nb, mb = n // block_n, n // block_m
    # n-block the small per-query tensors so their block's last dims EQUAL
    # the array dims (Mosaic block rule; a block_n-wide slice of the n axis
    # only lowers when block_n % 128 == 0).  The key-side (b, 16, n) layout
    # stays as-is: block_m tiles of n are 128-aligned by construction.
    qw8_b, gn_b, gm = _fold_geom(qw, points, nb, block_n)

    out, mx, sm = pl.pallas_call(
        functools.partial(
            _kernel, ah=ah, bn=block_n, bm=block_m, c=c, scale=scale,
            with_eq=with_eq,
        ),
        grid=(b, nb, mb),
        in_specs=[
            pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, block_n, ah, cc), lambda bi, i, j: (bi, i, 0, 0)),
            pl.BlockSpec((1, block_n, block_m, cc),
                         lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((1, 1, block_m), lambda bi, i, j: (bi, 0, j)),
            pl.BlockSpec((1, ah, block_n, 8),
                         lambda bi, i, j: (bi * nb + i, 0, 0, 0)),
            pl.BlockSpec((1, 8, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((1, 16, block_m), lambda bi, i, j: (bi, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, ah, block_n),
                         lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((1, ah, block_n),
                         lambda bi, i, j: (bi * nb + i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b * nb, ah, block_n), jnp.float32),
            jax.ShapeDtypeStruct((b * nb, ah, block_n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ah, block_n, c), jnp.float32),
            pltpu.VMEM((ah, block_n), jnp.float32),
            pltpu.VMEM((ah, block_n), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, qp, emb, km, qw8_b, gn_b, gm)
    mx = mx.reshape(b, nb, ah, block_n).transpose(0, 2, 1, 3).reshape(b, ah, n)
    sm = sm.reshape(b, nb, ah, block_n).transpose(0, 2, 1, 3).reshape(b, ah, n)
    return out, mx, sm


def rpe_self_attention(q, k, v, qp, emb, k_masks, qw=None, points=None, *,
                       scale, block_n=64, block_m=256, interpret=False):
    """Forward-only entry (serving): see :func:`_rpe_fwd`."""
    return _rpe_fwd(q, k, v, qp, emb, k_masks, qw, points, scale=scale,
                    block_n=block_n, block_m=block_m, interpret=interpret)[0]


def _bwd_p_kernel(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref,
                  gn_ref, gm_ref, mx_ref, sm_ref, p_ref,
                  *, scale, with_eq):
    """Backward score recompute: write the softmax tile P to HBM.

    This is the ONLY Pallas piece of the backward.  Mosaic bisection
    (``scripts/bisect_rpe_bwd{2..7}.py``, round 4) showed this compile
    helper crashes on ANY dot_general consuming values derived from other
    in-kernel dots — every gradient contraction (dv, dk, dq, dqp, demb,
    bf16 variants, scratch round-trips) dies, while the score/softmax
    recompute + a direct tile write lowers.  So the kernel materializes P
    ((B, AH, N, M) f32, transient) and every gradient contraction runs as
    an XLA einsum over it — identical f32 math, and XLA fuses
    ``dS = P * (dO V^T - D)`` into the consumers.  The XLA attention
    path's backward materializes strictly more (scores f32 pre- and
    post-softmax, plus the (B, A, N, M, D) SH tensor the forward needs).
    """
    s, _ = _scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
                   gm_ref, scale=scale, with_eq=with_eq)
    inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
    p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
    p_ref[0] = p * km_ref[0, 0][None, None, :]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_n", "block_m", "interpret", "with_eq"),
)
def _rpe_bwd(q, k, v, qp, emb, km, qw, points, d_out, out, mx, sm, *,
             scale, block_n, block_m, interpret, with_eq):
    b, ah, n, c = q.shape
    cc = emb.shape[3]
    nb, mb = n // block_n, n // block_m
    dd = jnp.einsum("banc,banc->ban", d_out.astype(jnp.float32), out)

    # same n-blocked layouts as the forward (see _rpe_fwd / _fold_geom): the
    # (b, nb) axes fold into one leading dim so every operand stays <= 4-D
    def _nblock(x):  # (b, ah, n) -> (b*nb, ah, block_n)
        return (x.reshape(b, ah, nb, block_n).transpose(0, 2, 1, 3)
                .reshape(b * nb, ah, block_n))

    qw8_b, gn_b, gm = _fold_geom(qw, points, nb, block_n)
    km3 = km[:, None]  # (b, 1, n) — see _rpe_fwd
    mx_b, sm_b = _nblock(mx), _nblock(sm)

    # Pallas piece: recompute the softmax tile P (see _bwd_p_kernel for why
    # this is the ONLY in-kernel step of the backward on this Mosaic
    # version).  (B, AH, N, M) f32 — transient, ~100 MB/cloud at production
    # coarse shapes.
    p_full = pl.pallas_call(
        functools.partial(_bwd_p_kernel, scale=scale, with_eq=with_eq),
        grid=(b, nb, mb),
        in_specs=[
            pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, block_n, ah, cc), lambda bi, i, j: (bi, i, 0, 0)),
            pl.BlockSpec((1, block_n, block_m, cc),
                         lambda bi, i, j: (bi, i, j, 0)),
            pl.BlockSpec((1, 1, block_m), lambda bi, i, j: (bi, 0, j)),
            pl.BlockSpec((1, ah, block_n, 8),
                         lambda bi, i, j: (bi * nb + i, 0, 0, 0)),
            pl.BlockSpec((1, 8, block_n),
                         lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((1, 16, block_m), lambda bi, i, j: (bi, 0, j)),
            pl.BlockSpec((1, ah, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((1, ah, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ah, block_n, block_m),
                               lambda bi, i, j: (bi, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((b, ah, n, n), jnp.float32),
        interpret=interpret,
    )(q, k, qp, emb, km3, qw8_b, gn_b, gm, mx_b, sm_b)

    # every gradient contraction as an XLA einsum over P (f32, HIGHEST —
    # the exact math the in-kernel f32 dots did); XLA fuses the dS
    # elementwise chain into the consumers
    hi = jax.lax.Precision.HIGHEST
    do32 = d_out.astype(jnp.float32)
    dpv = jnp.einsum("banc,bamc->banm", do32, v.astype(jnp.float32),
                     precision=hi)
    ds = p_full * (dpv - dd[..., None])  # (B, AH, N, M)
    dv = jnp.einsum("banm,banc->bamc", p_full, do32, precision=hi)
    dk = scale * jnp.einsum("banm,banc->bamc", ds,
                            q.astype(jnp.float32), precision=hi)
    dq = scale * jnp.einsum("banm,bamc->banc", ds,
                            k.astype(jnp.float32), precision=hi)
    dqp = scale * jnp.einsum("banm,bnmd->bnad", ds,
                             emb.astype(jnp.float32), precision=hi)
    demb = (scale * jnp.einsum("banm,bnad->bnmd", ds,
                               qp.astype(jnp.float32), precision=hi)
            ).astype(emb.dtype)

    if with_eq:
        # rinvk (diag-zeroed 1/r) recomputed from raw coordinates — the
        # same expansion _scores uses in-kernel
        x = points[:, :3]  # (B, 3, N)
        sq = jnp.sum(x * x, axis=1)  # (B, N)
        r2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
            "bdn,bdm->bnm", x, x, precision=hi)
        rinv = _SH1_C / (jnp.sqrt(jnp.maximum(r2, 0.0)) + 1e-12)
        eye = jnp.eye(n, dtype=bool)[None]
        rinvk = jnp.where(eye, 0.0, rinv)  # (B, N, M)
        # dqw8 cols: (qw.p_yzx fold, qw_y, qw_z, qw_x); gm rows 0:3 of the
        # numerator side are (1, -y, -z, -x) — contract dS*rinvk with them
        dsr = ds * rinvk[:, None]
        gm8 = gm[:, 0:4]  # (B, 4, M) rows (1, -y, -z, -x)
        dqw8 = scale * jnp.einsum("banm,bem->bane", dsr, gm8, precision=hi)
        # dqw_d = dqw8[d+1] + dqw8[0] * p_yzx_d (the col-0 fold)
        p_yzx = jnp.stack([points[:, 1], points[:, 2], points[:, 0]], axis=1)
        dqw = (jnp.moveaxis(dqw8[..., 1:4], -1, 1)
               + dqw8[..., 0][:, None] * p_yzx[:, :, None])
    else:
        dqw = jnp.zeros_like(qw)
    return dq, dk, dv, dqp, demb, dqw


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def rpe_self_attention_trainable(q, k, v, qp, emb, k_masks, qw, points,
                                 scale, block_n, block_m, interpret):
    """:func:`rpe_self_attention` with a flash backward (training path).

    Two recompute passes (dK/dV with queries innermost, dQ-side with keys
    innermost) — scores never materialize in either direction.  Gradients
    flow to q/k/v, the folded positional query ``qp``, the embedding, and
    the folded SH query ``qw``; masks and coordinates get zeros.
    """
    return _rpe_fwd(q, k, v, qp, emb, k_masks, qw, points, scale=scale,
                    block_n=block_n, block_m=block_m, interpret=interpret)[0]


def _rpe_trainable_fwd(q, k, v, qp, emb, k_masks, qw, points, scale, block_n,
                       block_m, interpret):
    out, mx, sm = _rpe_fwd(q, k, v, qp, emb, k_masks, qw, points, scale=scale,
                           block_n=block_n, block_m=block_m,
                           interpret=interpret)
    return out, (q, k, v, qp, emb, k_masks, qw, points, out, mx, sm)


def _rpe_trainable_bwd(scale, block_n, block_m, interpret, res, d_out):
    q, k, v, qp, emb, k_masks, qw, points, out, mx, sm = res
    b, ah, n, _ = q.shape
    with_eq = qw is not None
    if not with_eq:
        qw = jnp.zeros((b, 3, ah, n), jnp.float32)
        points = jnp.zeros((b, 4, n), jnp.float32)
    km = k_masks.astype(jnp.float32)
    dq, dk, dv, dqp, demb, dqw = _rpe_bwd(
        q, k, v, qp, emb, km, qw, points, d_out, out, mx, sm, scale=scale,
        block_n=block_n, block_m=block_m, interpret=interpret,
        with_eq=with_eq,
    )
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        dqp.astype(qp.dtype), demb.astype(emb.dtype), None,
        dqw.astype(qw.dtype) if with_eq else None,
        jnp.zeros_like(points) if with_eq else None,
    )


rpe_self_attention_trainable.defvjp(_rpe_trainable_fwd, _rpe_trainable_bwd)


def fold_equivariant_query(qe, wigner_d1):
    """Fold the anchor Wigner-D degree-1 blocks into the SH query.

    qe: (B, A, H, N, 4) — ``q @ We^T`` for n_level_equiv=2 (degrees 0, 1;
        column 0 is the degree-0 coefficient, dropped as row-constant).
    wigner_d1: (A, 3, 3) — ``harmonics.anchor_wigner_d([0,1], anchors)[1]``.
    Returns (B, 3, A*H, N) f32 with component rows ordered (y, z, x) to match
    ``real_sh`` degree-1 layout.
    """
    b, a, h, n, _ = qe.shape
    qw = jnp.einsum("acd,bahnc->bdahn", jnp.asarray(wigner_d1), qe[..., 1:4])
    return qw.reshape(b, 3, a * h, n)

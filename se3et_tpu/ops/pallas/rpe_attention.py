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


# --------------------------------------------------------------------------
# Fused-embedding variant (serving): the geometric-structure embedding tile
# is computed INSIDE the kernel from raw coordinates — the (B, N, M, C)
# tensor never exists.  Deletes the embedding kernel's ~1 GB bf16 write
# (chip write-bandwidth-floored at ~3 ms, bench_write_floor) and every self
# layer's full-tensor re-read.  Chebyshev machinery identical to
# ops/pallas/embedding.py (same fit tables -> same values as the
# materialized bf16 tile up to f32 accumulation order).
# --------------------------------------------------------------------------


def _cheb_accum(t, g_ref, deg, acc_ref):
    """Fused Chebyshev projection: ``acc = T(t) @ G`` without materializing
    the basis.

    The three-term recurrence runs 8 degrees at a time; each (8, bn, bm)
    row group stays a VMEM value (no scratch staging — the v1 femb kernel's
    full (deg, bn, bm) basis scratch was the VMEM line that forced bn=16)
    and is contracted immediately against its 8 rows of ``G`` in bf16 with
    f32 accumulation — the same precision as the materialized embedding
    kernel's single full-basis dot (``embedding._cheb_project``).  The first
    group OVERWRITES ``acc_ref`` (no cross-grid-step state)."""
    tk_prev, tk = jnp.ones_like(t), t
    two_t = 2.0 * t
    rows = []
    for j in range(deg):
        rows.append(tk_prev[None])
        tk_prev, tk = tk, two_t * tk - tk_prev
        if len(rows) == 8 or j == deg - 1:
            g = (j // 8) * 8
            basis = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                basis, g_ref[g:g + basis.shape[0]].astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bn, bm, C)
            acc_ref[...] = part if g == 0 else acc_ref[...] + part
            rows = []


def _fold_angular_geom(points3, knn_points, nb, block_n):
    """Per-query coefficient rows for the in-kernel triplet-angle matmuls.

    points3: (B, N, 3) f32; knn_points: (B, N, k, 3) f32 (the angle_k
    nearest real nodes, reference ``geotransformer.py:88-96``).
    Returns rk (B*nb, k*32, block_n): per angle-neighbor kk, four 8-row
    coefficient groups (cos, cx, cy, cz) contracted against ``gm[0:8]``
    (rows ``(1, -y_m, -z_m, -x_m, 0, idx, 0, 0)``, :func:`_fold_geom`):

      cos_k = r.p_m - r.p_n          (r = knn_k - p_n)
      (cx, cy, cz) = cross(r, p_m - p_n)

    so ``angle = atan2(|cross|, cos)`` needs only proven score-tile matmul
    patterns in-kernel (no pairwise-difference lane broadcasts).
    """
    b, n, kk, _ = knn_points.shape
    x, y, z = points3[..., 0], points3[..., 1], points3[..., 2]  # (B, N)
    r = knn_points - points3[:, :, None, :]  # (B, N, k, 3)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]  # (B, N, k)
    zero = jnp.zeros_like(rx)
    rdotp = rx * x[..., None] + ry * y[..., None] + rz * z[..., None]
    groups = [
        # cos: coeffs over gm rows (1, -y_m, -z_m, -x_m)
        jnp.stack([-rdotp, -ry, -rz, -rx], axis=-1),
        # cx = ry z_m - rz y_m + (rz y_n - ry z_n)
        jnp.stack([rz * y[..., None] - ry * z[..., None], rz, -ry, zero],
                  axis=-1),
        # cy = rz x_m - rx z_m + (rx z_n - rz x_n)
        jnp.stack([rx * z[..., None] - rz * x[..., None], zero, rx, -rz],
                  axis=-1),
        # cz = rx y_m - ry x_m + (ry x_n - rx y_n)
        jnp.stack([ry * x[..., None] - rx * y[..., None], -rx, zero, ry],
                  axis=-1),
    ]
    # (B, N, k, 4 groups, 8 coeffs) -> (B*nb, k*32, block_n)
    g4 = jnp.stack(groups, axis=3)  # (B, N, k, 4, 4)
    g8 = jnp.concatenate([g4, jnp.zeros_like(g4)], axis=-1)  # (..., 8)
    rk = g8.reshape(b, n, kk * 32)
    rk = rk.reshape(b, nb, block_n, kk * 32).transpose(0, 1, 3, 2)
    return rk.reshape(b * nb, kk * 32, block_n)


def _femb_tile(gn_ref, gm_ref, rk_ref, gd_ref, ga_ref, acc_cur, acc_max, *,
               angle_k, deg_d, deg_a, inv_half_d):
    """Geometric-embedding tile (bn, bm, C) f32, recomputed from geometry.

    Matches ``ops/pallas/embedding._embedding_kernel`` semantics (Chebyshev
    distance + max-over-k Chebyshev angle, biases DROPPED — they are
    row-constant in the attention scores, a softmax no-op).

    v2 (round 5): the projections run through :func:`_cheb_accum` — basis
    row groups never materialize, and the only (bn, bm, C) f32 buffers are
    TWO accumulators (``acc_cur`` for the projection in flight, ``acc_max``
    for the running max over angle neighbors).  v1 carried a (deg, bn, bm)
    basis scratch plus three (bn, bm, C) f32 values, which forced bn=16;
    the halved footprint restores bn=32 (half the grid steps and half the
    K/V re-fetch sweeps — the cost that made femb v1 lose, BENCH.md r4)."""
    from se3et_tpu.ops.pallas.embedding import _atan2_pos

    gn = gn_ref[0]  # (8, bn)
    gm = gm_ref[0]  # (16, bm)
    r2 = jax.lax.dot_general(
        gn, gm[8:16], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, bm)
    # self-pairs via the index rows: the matmul expansions cancel
    # catastrophically at r ~ 0 (dist noise is harmless under clip, but the
    # angle becomes atan2(noise, noise) = arbitrary); the reference
    # evaluates the diagonal at dist = 0, angle = 0 exactly
    didx = gn[5][:, None] - gm[5][None, :]
    off_diag = didx * didx > 0.25  # (bn, bm)
    rk = rk_ref[0]  # (k*32, bn)
    gm8 = gm[0:8]
    for kk in range(angle_k):
        o = kk * 32
        cos_v = jax.lax.dot_general(
            rk[o:o + 8], gm8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cx = jax.lax.dot_general(
            rk[o + 8:o + 16], gm8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cy = jax.lax.dot_general(
            rk[o + 16:o + 24], gm8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cz = jax.lax.dot_general(
            rk[o + 24:o + 32], gm8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sin_v = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 0.0))
        ang = _atan2_pos(sin_v, cos_v)  # (bn, bm) in [0, pi]
        ang = jnp.where(off_diag, ang, 0.0)
        t_a = jnp.clip(ang * np.float32(2.0 / np.pi) - 1.0, -1.0, 1.0)
        _cheb_accum(t_a, ga_ref, deg_a, acc_cur)
        # the running max lives in bf16: max is monotone, so the max of
        # bf16-rounded candidates equals the bf16-rounded max (<= 1 ulp,
        # the same rounding the materialized bf16 embedding carries) —
        # and the 2.1 MB saved is what keeps bn=32 under the VMEM roof
        cur = acc_cur[...].astype(acc_max.dtype)
        if kk == 0:
            acc_max[...] = cur
        else:
            acc_max[...] = jnp.maximum(acc_max[...], cur)
    # distance projection last: acc_cur is free to be reused
    dist = jnp.sqrt(jnp.maximum(r2, 0.0))
    dist = jnp.where(off_diag, dist, 0.0)
    t_d = jnp.clip(dist * inv_half_d - 1.0, -1.0, 1.0)
    _cheb_accum(t_d, gd_ref, deg_d, acc_cur)
    return acc_cur[...] + acc_max[...].astype(jnp.float32)


def _kernel_femb(q_ref, k_ref, v_ref, qp_ref, km_ref, qw_ref, gn_ref,
                 gm_ref, rk_ref, gd_ref, ga_ref, out_ref, acc, rowmax,
                 rowsum, acc_cur, acc_max, *, scale, with_eq, angle_k,
                 deg_d, deg_a, inv_half_d):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        rowmax[...] = jnp.full_like(rowmax, -jnp.inf)
        rowsum[...] = jnp.zeros_like(rowsum)

    kmask = km_ref[0, 0]  # (bm,)
    emb_tile = _femb_tile(
        gn_ref, gm_ref, rk_ref, gd_ref, ga_ref, acc_cur, acc_max,
        angle_k=angle_k, deg_d=deg_d, deg_a=deg_a, inv_half_d=inv_half_d,
    ).astype(q_ref.dtype)  # bf16, matching the materialized kernel's output

    # content scores (AH, bn, bm)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # positional scores against the in-tile embedding (bn, AH, bm)
    sp = jax.lax.dot_general(
        qp_ref[0], emb_tile, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s + jnp.transpose(sp, (1, 0, 2))

    if with_eq:
        gn = gn_ref[0]
        gm = gm_ref[0]
        r2 = jax.lax.dot_general(
            gn, gm[8:16], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rinv = _SH1_C / (jnp.sqrt(jnp.maximum(r2, 0.0)) + 1e-12)
        didx = gn[5][:, None] - gm[5][None, :]
        rinvk = jnp.where(didx * didx > 0.25, rinv, 0.0)
        ah_, bn_ = qw_ref.shape[1], qw_ref.shape[2]
        pre = jax.lax.dot_general(
            qw_ref[0].reshape(ah_ * bn_, 8), gm[0:8],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(ah_, bn_, gm.shape[1])
        s = s + rinvk[None] * pre

    s = s * scale
    s = jnp.where(kmask[None, None, :] > 0, s, _NEG)

    tmax = jnp.max(s, axis=2)
    new_max = jnp.maximum(rowmax[...], tmax)
    alpha = jnp.exp(rowmax[...] - new_max)
    p = jnp.exp(s - new_max[:, :, None]) * kmask[None, None, :]
    rowsum[...] = rowsum[...] * alpha + jnp.sum(p, axis=2)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc[...] = acc[...] * alpha[:, :, None] + pv
    rowmax[...] = new_max

    @pl.when(j == pl.num_programs(2) - 1)
    def _flush():
        out_ref[0] = (
            acc[...] / jnp.maximum(rowsum[...], 1e-30)[:, :, None]
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sigma_d", "sigma_a", "d_index_max",
                     "block_n", "block_m", "interpret"),
)
def rpe_self_attention_femb(q, k, v, qp, k_masks, qw, points, knn_points,
                            wd, wa, *, scale, sigma_d, sigma_a,
                            d_index_max=48.0, block_n=16, block_m=128,
                            interpret=False):
    """Flash RPE self-attention with the embedding computed IN-KERNEL.

    Args as :func:`_rpe_fwd` minus ``emb``, plus the raw geometry the
    embedding derives from: ``points`` (B, 4, N) f32 coordinate rows,
    ``knn_points`` (B, N, angle_k, 3) f32, and the UNFOLDED embedding
    projections ``wd``/``wa`` (C_sin, C) — folded through the static
    Chebyshev fit tables here (``G = A @ W``; biases dropped as softmax
    no-ops).  Serving only (no VJP).  Reference semantics:
    ``geotransformer.py:69-121`` + ``rpe_transformer.py:18-131``.

    ``block_n`` defaults to 16: the round-5 bisect (scripts/bisect_femb_v2.py,
    BENCH.md) showed Mosaic's compile helper CRASHES at bn=32 whenever
    AH=24 (production heads x anchors), eq and inv alike, while bn=16 and
    AH=4/bn=32 compile — the v2 fused accumulation still halves the VMEM
    footprint vs v1 at the same tile.
    """
    from se3et_tpu.ops.pallas.embedding import (
        chebyshev_sinusoid_table, pick_deg,
    )

    b, ah, n, c = q.shape
    assert n % block_n == 0 and n % block_m == 0, (n, block_n, block_m)
    cc = wd.shape[1]
    angle_k = knn_points.shape[2]
    with_eq = qw is not None
    if not with_eq:
        qw = jnp.zeros((b, 3, ah, n), jnp.float32)

    factor_a = 180.0 / (sigma_a * np.pi)
    deg_d = pick_deg(cc, float(d_index_max))
    deg_a = pick_deg(cc, float(np.pi * factor_a))
    a_d = jnp.asarray(chebyshev_sinusoid_table(cc, float(d_index_max), deg_d))
    a_a = jnp.asarray(
        chebyshev_sinusoid_table(cc, float(np.pi * factor_a), deg_a)
    )
    g_d = a_d @ wd.astype(jnp.float32)
    g_a = a_a @ wa.astype(jnp.float32)
    inv_half_d = float(2.0 / (d_index_max * sigma_d))

    km = k_masks.astype(jnp.float32)[:, None]
    nb, mb = n // block_n, n // block_m
    qw8_b, gn_b, gm = _fold_geom(qw, points, nb, block_n)
    rk = _fold_angular_geom(
        jnp.swapaxes(points[:, :3], 1, 2), knn_points, nb, block_n
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel_femb, scale=scale, with_eq=with_eq, angle_k=angle_k,
            deg_d=deg_d, deg_a=deg_a, inv_half_d=inv_half_d,
        ),
        grid=(b, nb, mb),
        in_specs=[
            pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
            pl.BlockSpec((1, block_n, ah, cc), lambda bi, i, j: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, block_m), lambda bi, i, j: (bi, 0, j)),
            pl.BlockSpec((1, ah, block_n, 8),
                         lambda bi, i, j: (bi * nb + i, 0, 0, 0)),
            pl.BlockSpec((1, 8, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((1, 16, block_m), lambda bi, i, j: (bi, 0, j)),
            pl.BlockSpec((1, angle_k * 32, block_n),
                         lambda bi, i, j: (bi * nb + i, 0, 0)),
            pl.BlockSpec((deg_d, cc), lambda bi, i, j: (0, 0)),
            pl.BlockSpec((deg_a, cc), lambda bi, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ah, block_n, c),
                               lambda bi, i, j: (bi, 0, i, 0)),
        # out follows q's dtype: serving feeds bf16 and casts the result to
        # v.dtype anyway, and the f32 output's whole-tensor scoped-VMEM
        # staging (12.6 MB at production shape, +operands = 18.9) was what
        # aborted the round-5 production compile at the 16 MB limit
        out_shape=jax.ShapeDtypeStruct((b, ah, n, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((ah, block_n, c), jnp.float32),
            pltpu.VMEM((ah, block_n), jnp.float32),
            pltpu.VMEM((ah, block_n), jnp.float32),
            # the two embedding accumulators (see _femb_tile v2): the only
            # (bn, bm, C) buffers in the kernel — the in-flight projection
            # sum in f32 (4.2 MB at bn=32, bm=128, C=256) + the running
            # angle max in bf16 (2.1 MB; max is monotone, rounding-safe)
            pltpu.VMEM((block_n, block_m, cc), jnp.float32),
            pltpu.VMEM((block_n, block_m, cc), jnp.bfloat16),
        ],
        interpret=interpret,
    )(q, k, v, qp, km, qw8_b, gn_b, gm, rk, g_d, g_a)
    return out


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

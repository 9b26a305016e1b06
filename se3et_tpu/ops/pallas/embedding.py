r"""Pallas TPU kernel: fused geometric-structure embedding.

The XLA path of :class:`se3et_tpu.nn.embedding.GeometricStructureEmbedding`
materializes huge fp32 intermediates per coarse cloud — the distance sinusoid
``(B, N, M, C)`` and the triplet-angle sinusoid ``(B, N, M, k, C)`` (~8 GB at
the production N=M=1024, C=256) — before the learned projections reduce them
(reference semantics: ``geotransformer.py:69-121``).  This kernel computes the
embedding tile-by-tile in VMEM and writes only the final (B, N, M, C) bf16
tensor to HBM.

The projected sinusoid is evaluated through a **Chebyshev expansion**: the
map ``x -> [sin(x*div) | cos(x*div)] @ W + b`` is a smooth function of ONE
scalar (the distance or angle index), so

    emb(x) = T(t(x)) @ G,   G = A @ W   (folded per forward, (DEG, C)),

with ``t = 2x/x_max - 1``, ``T_k(t) = cos(k * arccos t)`` evaluated as one
per-element arccos (atan2 polynomial) + one broadcasted cosine over
(TILE, DEG), and ``A`` the static Chebyshev fit table of the sinusoid rows.
This replaces the C/2 = 128 sin+cos pairs per matrix element (~2M
transcendentals per (8, 256) tile — the measured wall of the direct kernel:
34 ms for two production clouds) with DEG = 64 cosines + one
(TILE, DEG) @ (DEG, C) MXU matmul.  (A cosine series in the *linearly*
mapped variable was tried first and is wrong: the even extension of the
sinusoid has a corner at x = 0, so those coefficients decay only as 1/k^2 —
0.16 max error.  The arccos substitution is what makes it Chebyshev.)  Fit
error < 2e-4 over the index range (coefficients decay like Bessel
``J_k(P/2)`` beyond ``k > P/2``; production ranges are P <= 48), far below
the bf16 output quantization (~4e-3).  Indices beyond the range saturate
(``t`` clamped) — only pairs farther than ``sigma_d * d_index_max``.

Mosaic notes baked in: no atan2 (polynomial), no advanced indexing
(component-wise 2-D slices), no lane-breaking reshapes, int32 iota (f32 iota
is unsupported), leading-dim-only merges.

Inference-path only (no custom VJP); training uses the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEG = 64  # Chebyshev basis size (lane-friendly; safe for index ranges <= ~100)


@functools.lru_cache(maxsize=None)
def chebyshev_sinusoid_table(c: int, x_max: float, deg: int = DEG) -> np.ndarray:
    """Static fit table A (deg, 2*(c//2)): Chebyshev coefficients (on
    ``t = 2x/x_max - 1``) of the sinusoid features
    ``[sin(x*div_j) | cos(x*div_j)]`` for x in [0, x_max].

    ``div_j = 10000^(-2j/c)`` as in ``SinusoidalPositionalEmbedding``.
    """
    half = c // 2
    div = np.exp(np.arange(0, c, 2) * (-np.log(10000.0) / c))  # (half,)
    # Chebyshev nodes on [-1, 1] -> x in [0, x_max]
    npts = 8 * deg
    t = np.cos(np.pi * (np.arange(npts) + 0.5) / npts)
    x = 0.5 * (t + 1.0) * x_max
    feats = np.concatenate(
        [np.sin(x[:, None] * div[None, :]), np.cos(x[:, None] * div[None, :])],
        axis=1,
    )  # (npts, 2*half)
    a = np.polynomial.chebyshev.chebfit(t, feats, deg - 1)  # (deg, 2*half)
    return a.astype(np.float32)


@functools.lru_cache(maxsize=None)
def pick_deg(c: int, x_max: float, tol: float = 1e-5, max_deg: int = DEG) -> int:
    """Smallest sublane-multiple basis size whose fit error is below ``tol``.

    The Chebyshev coefficients of ``sin(x_max/2 * (t+1))`` decay like
    ``J_k(x_max/2)`` — a short angle index range (P = pi*factor_a ~ 12 at
    sigma_a = 15 deg) needs only DEG = 16 while the distance range (P = 48)
    needs 40.  Basis cost (recurrence + projection matmul) is linear in DEG,
    and the angle projection runs angle_k = 3 times per pair: sizing per
    projection cuts the kernel's basis work to ~1/3 (measured: 9.9 -> ~5 ms
    for two production clouds).
    """
    x = np.linspace(0.0, x_max, 4001)
    t = 2.0 * x / x_max - 1.0
    half = c // 2
    div = np.exp(np.arange(0, c, 2) * (-np.log(10000.0) / c))
    feats = np.concatenate(
        [np.sin(x[:, None] * div[None, :]), np.cos(x[:, None] * div[None, :])],
        axis=1,
    )
    for deg in range(16, max_deg + 1, 8):
        a = chebyshev_sinusoid_table(c, x_max, deg)
        err = np.abs(np.polynomial.chebyshev.chebval(t, a).T - feats).max()
        if err < tol:
            return deg
    return max_deg


def _atan2_pos(s, c):
    """atan2(s, c) for s >= 0 (result in [0, pi]) — Mosaic has no atan2.

    Abramowitz & Stegun 4.4.49 polynomial on [0, 1] + range reduction
    (|err| < 1e-5 rad, far below the bf16 output quantization).
    """
    eps = 1e-30
    ac = jnp.abs(c)
    hi = jnp.maximum(s, ac)
    lo = jnp.minimum(s, ac)
    t = lo / jnp.maximum(hi, eps)
    t2 = t * t
    poly = t * (
        0.9998660
        + t2 * (-0.3302995 + t2 * (0.1801410 + t2 * (-0.0851330 + t2 * 0.0208351)))
    )
    a = jnp.where(s > ac, np.float32(np.pi / 2) - poly, poly)
    return jnp.where(c < 0.0, np.float32(np.pi) - a, a)


def _cheb_project(x_row, inv_half_range, g_ref, b_vec, scratch, *, deg, dtype):
    """emb(x) = T(clip(2x/x_max - 1)) @ G + b for a (1, M) index row.

    The basis is built by the three-term recurrence (2 VPU FMAs per element
    per degree — a broadcasted ``cos(k * arccos t)`` costs ~45 cycles/element
    and measured +6.3 ms per projection at production shapes) in the
    TRANSPOSED layout (DEG, M): degrees live on sublanes, so rows are written
    in groups of 8 by leading-axis concatenation — column-oriented stores pad
    their minor dim to the 128-lane tile (16x VMEM blowup, compile OOM).
    The matmul contracts the sublane axis (native transposed-LHS MXU form).
    """
    t = jnp.clip(x_row * inv_half_range - 1.0, -1.0, 1.0)  # (1, M)
    tk_prev, tk = jnp.ones_like(t), t
    two_t = 2.0 * t
    rows = []
    for k in range(deg):
        rows.append(tk_prev)
        tk_prev, tk = tk, two_t * tk - tk_prev
        if len(rows) == 8:
            g = k // 8
            scratch[g * 8:(g + 1) * 8, :] = jnp.concatenate(rows, axis=0)
            rows = []
    basis = scratch[0:deg, :]  # (deg, M); scratch is sized for the max deg
    out = jax.lax.dot_general(
        basis.astype(dtype), g_ref[...].astype(dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, C)
    return out + b_vec[None, :]


def _embedding_kernel(
    q_pts_ref, m_pts_ref, knn_ref, gd_ref, bd_ref, ga_ref, ba_ref,
    out_ref, cheb_scratch, *, sigma_d, sigma_a, d_index_max, angle_k, tm,
    deg_d, deg_a,
):
    # One query point per grid step: every intermediate is a clean 2-D
    # (1, M) / (DEG, M) / (M, C) tensor (3-D small-minor layouts pad their
    # last dim to the 128-lane tile).  Coordinate arithmetic is
    # component-wise on (1, 1)/(1, M) slices.
    # inputs arrive as 8-row blocks (TPU block shapes need 8-divisible
    # second-minor dims); select this grid step's query row dynamically
    row = jax.lax.rem(pl.program_id(1), 8)
    q = q_pts_ref[0, pl.ds(row, 1)]  # (1, 3) f32
    knn = knn_ref[0, pl.ds(row, 1)]  # (1, k*3)
    pts = m_pts_ref[0]  # (TM, 3) f32
    c = gd_ref.shape[1]
    dtype = jnp.bfloat16 if out_ref.dtype == jnp.bfloat16 else jnp.float32

    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # (1, 1)
    px, py, pz = pts[:, 0:1].T, pts[:, 1:2].T, pts[:, 2:3].T  # (1, TM)
    ax, ay, az = px - qx, py - qy, pz - qz  # (1, TM)
    dist = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 0.0))
    acc = _cheb_project(
        dist, np.float32(2.0 / (d_index_max * sigma_d)),
        gd_ref, bd_ref[...], cheb_scratch, deg=deg_d, dtype=dtype,
    )  # (TM, C)

    a_max = None
    for kk in range(angle_k):
        rx = knn[:, kk * 3 + 0:kk * 3 + 1] - qx  # (1, 1)
        ry = knn[:, kk * 3 + 1:kk * 3 + 2] - qy
        rz = knn[:, kk * 3 + 2:kk * 3 + 3] - qz
        cx = ry * az - rz * ay
        cy = rz * ax - rx * az
        cz = rx * ay - ry * ax
        # no epsilon floor: atan2(0, 0) = 0 must hold for self-pairs (m == n),
        # matching jnp.linalg.norm in the XLA path
        sin_v = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 0.0))
        cos_v = rx * ax + ry * ay + rz * az
        ang = _atan2_pos(sin_v, cos_v)  # (1, TM), in [0, pi]
        # angle index range is [0, pi * factor_a] -> inv_half_range in the
        # raw angle variable is 2 / pi
        a_emb = _cheb_project(ang, np.float32(2.0 / np.pi), ga_ref,
                              ba_ref[...], cheb_scratch, deg=deg_a,
                              dtype=dtype)
        a_max = a_emb if a_max is None else jnp.maximum(a_max, a_emb)

    out_ref[0, 0] = (acc + a_max).astype(out_ref.dtype)


def _cheb_basis(x_row, inv_half_range, scratch, *, deg):
    """Chebyshev basis T(clip(2x/x_max - 1)) as a (deg, M) scratch view."""
    t = jnp.clip(x_row * inv_half_range - 1.0, -1.0, 1.0)  # (1, M)
    tk_prev, tk = jnp.ones_like(t), t
    two_t = 2.0 * t
    rows = []
    for k in range(deg):
        rows.append(tk_prev)
        tk_prev, tk = tk, two_t * tk - tk_prev
        if len(rows) == 8:
            g = k // 8
            scratch[g * 8:(g + 1) * 8, :] = jnp.concatenate(rows, axis=0)
            rows = []
    return scratch[0:deg, :]


def _embedding_bwd_kernel(
    q_pts_ref, m_pts_ref, knn_ref, gd_ref, ga_ref, ba_ref, dout_ref,
    dgd_ref, dga_ref, db_ref, cheb_scratch, aemb_scratch,
    *, sigma_d, sigma_a, d_index_max, angle_k, deg_d, deg_a,
):
    """Accumulate d_Gd = sum T_d^T d_emb, d_Ga = sum_k T_a(k)^T (mask_k *
    d_emb), d_b = sum d_emb over all (n, m) pairs.

    The forward is LINEAR in the folded projections G = A @ W, so these
    basis-space accumulators are the complete backward: outside the kernel
    ``d_W = A^T d_G`` and ``d_bd = d_ba = d_b`` (every (n, m, c) has exactly
    one argmax angle; ties split by first-k, the reference ``torch.max``
    convention).  The angle argmax masks are recomputed with the SAME dtype
    chain as the forward kernel — bitwise-identical a_emb values, exact
    masks.
    """
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        dgd_ref[...] = jnp.zeros_like(dgd_ref)
        dga_ref[...] = jnp.zeros_like(dga_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    row = jax.lax.rem(pl.program_id(1), 8)
    q = q_pts_ref[0, pl.ds(row, 1)]  # (1, 3)
    knn = knn_ref[0, pl.ds(row, 1)]  # (1, k*3)
    pts = m_pts_ref[0]  # (M, 3)
    c = gd_ref.shape[1]
    dout = dout_ref[0, 0].astype(jnp.float32)  # (M, C)
    dtype = jnp.bfloat16 if dout_ref.dtype == jnp.bfloat16 else jnp.float32

    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    px, py, pz = pts[:, 0:1].T, pts[:, 1:2].T, pts[:, 2:3].T
    ax, ay, az = px - qx, py - qy, pz - qz
    dist = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 0.0))

    basis_d = _cheb_basis(
        dist, np.float32(2.0 / (d_index_max * sigma_d)), cheb_scratch,
        deg=deg_d,
    )
    dgd_ref[...] += jax.lax.dot_general(
        basis_d.astype(dtype), dout.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[...] += jnp.sum(dout, axis=0, keepdims=True)

    # pass 1: recompute the k angle embeddings (forward dtype chain) + max
    angs = []
    a_max = None
    for kk in range(angle_k):
        rx = knn[:, kk * 3 + 0:kk * 3 + 1] - qx
        ry = knn[:, kk * 3 + 1:kk * 3 + 2] - qy
        rz = knn[:, kk * 3 + 2:kk * 3 + 3] - qz
        cx = ry * az - rz * ay
        cy = rz * ax - rx * az
        cz = rx * ay - ry * ax
        sin_v = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 0.0))
        cos_v = rx * ax + ry * ay + rz * az
        ang = _atan2_pos(sin_v, cos_v)
        angs.append(ang)
        a_emb = _cheb_project(ang, np.float32(2.0 / np.pi), ga_ref,
                              ba_ref[...], cheb_scratch, deg=deg_a,
                              dtype=dtype)
        aemb_scratch[kk] = a_emb
        a_max = a_emb if a_max is None else jnp.maximum(a_max, a_emb)

    # pass 2: first-k argmax masks -> basis-space gradient accumulation
    matched = jnp.zeros_like(a_max)
    for kk in range(angle_k):
        m_k = jnp.where(
            (aemb_scratch[kk] == a_max) & (matched == 0.0), 1.0, 0.0
        )
        matched = jnp.maximum(matched, m_k)
        basis_a = _cheb_basis(
            angs[kk], np.float32(2.0 / np.pi), cheb_scratch, deg=deg_a
        )
        dga_ref[...] += jax.lax.dot_general(
            basis_a.astype(dtype), (dout * m_k).astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def geometric_embedding_trainable(
    points, knn_points, wd, bd, wa, ba, sigma_d, sigma_a, d_index_max,
    interpret,
):
    """:func:`geometric_embedding_pallas` with a hand-written backward pass
    for the projection parameters (training path).

    Gradients are exact *through the Chebyshev parametrization* (the forward
    is linear in ``G = A @ W``), with first-k argmax routing for the angle
    max reduction.  Points carry no gradient (geometry inputs).
    """
    return geometric_embedding_pallas(
        points, knn_points, wd, bd, wa, ba, sigma_d=sigma_d, sigma_a=sigma_a,
        d_index_max=d_index_max, interpret=interpret,
    )


def _emb_trainable_fwd(points, knn_points, wd, bd, wa, ba, sigma_d, sigma_a,
                       d_index_max, interpret):
    out = geometric_embedding_pallas(
        points, knn_points, wd, bd, wa, ba, sigma_d=sigma_d, sigma_a=sigma_a,
        d_index_max=d_index_max, interpret=interpret,
    )
    return out, (points, knn_points, wd, wa)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "sigma_a", "d_index_max", "interpret"),
)
def _emb_bwd_call(points, knn_points, wd, wa, d_out, *, sigma_d, sigma_a,
                  d_index_max, interpret):
    b, n, _ = points.shape
    k = knn_points.shape[2]
    c = wd.shape[1]
    factor_a = 180.0 / (sigma_a * np.pi)
    deg_d = pick_deg(c, float(d_index_max))
    deg_a = pick_deg(c, float(np.pi * factor_a))
    a_d = jnp.asarray(chebyshev_sinusoid_table(c, float(d_index_max), deg_d))
    a_a = jnp.asarray(
        chebyshev_sinusoid_table(c, float(np.pi * factor_a), deg_a)
    )
    g_d = a_d @ wd.astype(jnp.float32)
    g_a = a_a @ wa.astype(jnp.float32)

    kernel = functools.partial(
        _embedding_bwd_kernel, sigma_d=float(sigma_d), sigma_a=float(sigma_a),
        d_index_max=float(d_index_max), angle_k=k, deg_d=deg_d, deg_a=deg_a,
    )
    dgd, dga, db = pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 8, 3), lambda bi, i: (bi, i // 8, 0)),
            pl.BlockSpec((1, n, 3), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, 8, k * 3), lambda bi, i: (bi, i // 8, 0)),
            pl.BlockSpec((deg_d, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((deg_a, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((c,), lambda bi, i: (0,)),
            pl.BlockSpec((1, 1, n, c), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((deg_d, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((deg_a, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((deg_d, c), jnp.float32),
            jax.ShapeDtypeStruct((deg_a, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max(deg_d, deg_a), n), jnp.float32),
            pltpu.VMEM((k, n, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        points.astype(jnp.float32),
        knn_points.reshape(b, n, k * 3).astype(jnp.float32),
        g_d,
        g_a,
        jnp.zeros((c,), jnp.float32),  # bias cancels in argmax comparison
        d_out,
    )
    d_wd = a_d.T @ dgd
    d_wa = a_a.T @ dga
    return d_wd, db[0], d_wa, db[0]


def _emb_trainable_bwd(sigma_d, sigma_a, d_index_max, interpret, res, d_out):
    points, knn_points, wd, wa = res
    d_wd, d_bd, d_wa, d_ba = _emb_bwd_call(
        points, knn_points, wd, wa, d_out, sigma_d=sigma_d, sigma_a=sigma_a,
        d_index_max=d_index_max, interpret=interpret,
    )
    return (
        jnp.zeros_like(points), jnp.zeros_like(knn_points),
        d_wd.astype(wd.dtype), d_bd, d_wa.astype(wa.dtype), d_ba,
    )


geometric_embedding_trainable.defvjp(_emb_trainable_fwd, _emb_trainable_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "sigma_a", "d_index_max", "tile_n", "tile_m",
                     "interpret", "out_dtype"),
)
def geometric_embedding_pallas(
    points, knn_points, wd, bd, wa, ba,
    *, sigma_d, sigma_a, d_index_max=48.0, tile_n=8, tile_m=256,
    interpret=False, out_dtype=jnp.bfloat16,
):
    """Fused geometric embedding (Chebyshev-projected sinusoids).

    points: (B, N, 3) f32; knn_points: (B, N, k, 3) f32;
    wd/wa: (C_sin, C) projection weights; bd/ba: (C,).
    Returns emb (B, N, N, C) in ``out_dtype``.  ``tile_n``/``tile_m`` are
    accepted for API compatibility; the kernel processes one query row over
    the full support dimension per grid step.

    ``d_index_max``: static distance-index range of the Chebyshev fit
    (indices = dist / sigma_d); pairs beyond ``sigma_d * d_index_max`` apart
    saturate.  48 covers ~9.6 m at the 3DMatch sigma_d=0.2 and ~230 m at the
    KITTI sigma_d=4.8.
    """
    del tile_n, tile_m
    b, n, _ = points.shape
    k = knn_points.shape[2]
    c = wd.shape[1]

    # fold the static Chebyshev fit tables into the learned projections:
    # G = A @ W, (deg, C) — basis size picked per projection from its index
    # range (the angle range is ~4x shorter than the distance range)
    factor_a = 180.0 / (sigma_a * np.pi)
    deg_d = pick_deg(c, float(d_index_max))
    deg_a = pick_deg(c, float(np.pi * factor_a))
    a_d = jnp.asarray(chebyshev_sinusoid_table(c, float(d_index_max), deg_d))
    a_a = jnp.asarray(
        chebyshev_sinusoid_table(c, float(np.pi * factor_a), deg_a)
    )
    g_d = a_d @ wd.astype(jnp.float32)
    g_a = a_a @ wa.astype(jnp.float32)

    kernel = functools.partial(
        _embedding_kernel, sigma_d=float(sigma_d), sigma_a=float(sigma_a),
        d_index_max=float(d_index_max), angle_k=k, tm=n,
        deg_d=deg_d, deg_a=deg_a,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 8, 3), lambda bi, i: (bi, i // 8, 0)),
            pl.BlockSpec((1, n, 3), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, 8, k * 3), lambda bi, i: (bi, i // 8, 0)),
            pl.BlockSpec((deg_d, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((c,), lambda bi, i: (0,)),
            pl.BlockSpec((deg_a, c), lambda bi, i: (0, 0)),
            pl.BlockSpec((c,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 1, n, c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, n, c), out_dtype),
        scratch_shapes=[pltpu.VMEM((max(deg_d, deg_a), n), jnp.float32)],
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        points.astype(jnp.float32),
        knn_points.reshape(b, n, k * 3).astype(jnp.float32),
        g_d,
        bd.astype(jnp.float32),
        g_a,
        ba.astype(jnp.float32),
    )

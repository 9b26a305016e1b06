r"""Pallas TPU kernel: fused geometric-structure embedding.

The XLA path of :class:`se3et_tpu.nn.embedding.GeometricStructureEmbedding`
materializes huge fp32 intermediates per coarse cloud — the distance sinusoid
``(B, N, M, C)`` and the triplet-angle sinusoid ``(B, N, M, k, C)`` (~8 GB at
the production N=M=1024, C=256) — before the learned projections reduce them
(reference semantics: ``geotransformer.py:69-121``).  This kernel computes the
embedding tile-by-tile in VMEM: pairwise distance -> sinusoid -> d-projection,
and per-triplet angle -> sinusoid -> a-projection -> max, writing only the
final (B, N, M, C) bf16 tensor to HBM.

Mosaic notes baked in: no atan2 (polynomial), no advanced indexing
(component-wise 2-D slices), no lane-breaking reshapes, iota passed as an
input, sin/cos projected by split weight halves instead of a concat buffer,
and both N and M tiled to bound VMEM.

Inference-path only (no custom VJP); training uses the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


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


def _sin_cos_project(indices_2d, div, w_ref, b_vec, dtype):
    """(sin|cos sinusoid of indices) @ W + b without materializing the concat:
    two matmuls against the weight halves."""
    tn, m = indices_2d.shape
    half = div.shape[1]
    ang = (indices_2d[:, :, None] * div[None, :, :]).reshape(tn * m, half)
    w_sin = w_ref[:half, :].astype(dtype)
    w_cos = w_ref[half:, :].astype(dtype)
    out = jnp.dot(jnp.sin(ang).astype(dtype), w_sin,
                  preferred_element_type=jnp.float32)
    out += jnp.dot(jnp.cos(ang).astype(dtype), w_cos,
                   preferred_element_type=jnp.float32)
    return out + b_vec[None, :]


def _embedding_kernel(
    q_pts_ref, m_pts_ref, knn_ref, div_ref, wd_ref, bd_ref, wa_ref, ba_ref,
    out_ref, *, sigma_d, sigma_a, angle_k, tn, tm,
):
    # All coordinate arithmetic is component-wise on 2-D (TN, TM)/(TN, 1)
    # slices: integer/advanced indexing on small trailing axes lowers to
    # Mosaic-unsupported gathers.
    q = q_pts_ref[0]  # (TN, 3) f32
    pts = m_pts_ref[0]  # (TM, 3) f32
    c = wd_ref.shape[1]
    div = div_ref[...]  # (1, C//2)
    dtype = wd_ref.dtype

    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]  # (TN, 1)
    px, py, pz = pts[:, 0:1].T, pts[:, 1:2].T, pts[:, 2:3].T  # (1, TM)
    ax, ay, az = px - qx, py - qy, pz - qz  # (TN, TM)
    dist = jnp.sqrt(jnp.maximum(ax * ax + ay * ay + az * az, 0.0))
    acc = _sin_cos_project(dist / sigma_d, div, wd_ref, bd_ref[...], dtype)

    factor_a = 180.0 / (sigma_a * np.pi)
    angs = []
    knn = knn_ref[0]  # (TN, k*3)
    for kk in range(angle_k):
        rx = knn[:, kk * 3 + 0:kk * 3 + 1] - qx  # (TN, 1)
        ry = knn[:, kk * 3 + 1:kk * 3 + 2] - qy
        rz = knn[:, kk * 3 + 2:kk * 3 + 3] - qz
        cx = ry * az - rz * ay
        cy = rz * ax - rx * az
        cz = rx * ay - ry * ax
        # no epsilon floor: atan2(0, 0) = 0 must hold for self-pairs (m == n),
        # matching jnp.linalg.norm in the XLA path
        sin_v = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 0.0))
        cos_v = rx * ax + ry * ay + rz * az
        angs.append(_atan2_pos(sin_v, cos_v) * factor_a)  # (TN, TM)
    # one batched projection for all k triplet angles (fewer, bigger matmuls)
    a_all = _sin_cos_project(
        jnp.concatenate(angs, axis=0), div, wa_ref, ba_ref[...], dtype
    ).reshape(angle_k, tn * tm, c)
    a_max = jnp.max(a_all, axis=0)

    out_ref[0] = (acc + a_max).reshape(tn, tm, c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "sigma_a", "tile_n", "tile_m", "interpret",
                     "out_dtype"),
)
def geometric_embedding_pallas(
    points, knn_points, wd, bd, wa, ba,
    *, sigma_d, sigma_a, tile_n=8, tile_m=256, interpret=False,
    out_dtype=jnp.bfloat16,
):
    """Fused geometric embedding.

    points: (B, N, 3) f32; knn_points: (B, N, k, 3) f32;
    wd/wa: (C_sin, C) projection weights; bd/ba: (C,).
    Returns emb (B, N, N, C) in ``out_dtype``.
    """
    b, n, _ = points.shape
    k = knn_points.shape[2]
    c = wd.shape[1]
    tn = tile_n
    tm = min(tile_m, n)
    assert n % tn == 0 and n % tm == 0, (n, tn, tm)

    kernel = functools.partial(
        _embedding_kernel, sigma_d=sigma_d, sigma_a=sigma_a, angle_k=k,
        tn=tn, tm=tm,
    )
    wdtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(b, n // tn, n // tm),
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, tm, 3), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, tn, k * 3), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, c // 2), lambda bi, i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, i, j: (0, 0)),
            pl.BlockSpec((c,), lambda bi, i, j: (0,)),
            pl.BlockSpec((c, c), lambda bi, i, j: (0, 0)),
            pl.BlockSpec((c,), lambda bi, i, j: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, tn, tm, c), lambda bi, i, j: (bi, i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, n, c), out_dtype),
        interpret=interpret,
    )(
        points.astype(jnp.float32),
        points.astype(jnp.float32),
        knn_points.reshape(b, n, k * 3).astype(jnp.float32),
        jnp.exp(
            jnp.arange(0, c, 2, dtype=jnp.float32) * (-np.log(10000.0) / c)
        )[None, :],
        wd.astype(wdtype),
        bd.astype(jnp.float32),
        wa.astype(wdtype),
        ba.astype(jnp.float32),
    )

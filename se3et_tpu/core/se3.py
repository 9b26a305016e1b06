r"""SE(3) transform utilities (jax.numpy, fully jittable).

TPU-native replacements for ``geotransformer/modules/ops/transformation.py``,
``geotransformer/modules/registration/procrustes.py`` and
``geotransformer/modules/registration/metrics.py``.  The reference computes the
weighted-Procrustes SVD on the CPU (``procrustes.py:53``); here the 3x3 SVD runs
on device so the whole registration tail stays inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry math must not silently drop to bf16 on TPU: transforms, Procrustes
# and metric computations all use full float32 MXU precision.
_PREC = jax.lax.Precision.HIGHEST


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to points.

    Args:
        points: (..., N, 3) or (N, 3)
        transform: (4, 4) or broadcastable batch (..., 4, 4)

    Reference: ``modules/ops/transformation.py:7-60``.
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    return jnp.einsum("...nj,...ij->...ni", points, rotation, precision=_PREC) + translation[..., None, :]


def apply_rotation(points: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...nj,...ij->...ni", points, rotation, precision=_PREC)


def compose_transform(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) transforms from (..., 3, 3) + (..., 3)."""
    batch = rotation.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=rotation.dtype)
    out = out.at[..., :3, :3].set(rotation)
    out = out.at[..., :3, 3].set(translation)
    out = out.at[..., 3, 3].set(1.0)
    return out


def inverse_transform(transform: jnp.ndarray) -> jnp.ndarray:
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    inv_r = jnp.swapaxes(rotation, -1, -2)
    inv_t = -jnp.einsum("...ij,...j->...i", inv_r, translation, precision=_PREC)
    return compose_transform(inv_r, inv_t)


def rodrigues_rotation(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle to rotation matrix (Rodrigues formula).

    Reference: ``modules/ops/transformation.py`` rodrigues helpers.
    """
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    k = jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(axis.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=axis.dtype)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return eye + s * k + (1.0 - c) * (k @ k)


def quaternion_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix, batched."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def _horn_rotation(h: jnp.ndarray, num_iters: int = 30) -> jnp.ndarray:
    """Optimal rotation from the covariance ``h = sum_n w_n src_n ref_n^T``
    via Horn's quaternion method: the top eigenvector of the symmetric 4x4 N
    matrix, found by shifted power iteration.

    Rationale (TPU): batched tiny ``jnp.linalg.svd`` lowers to slow iterative
    HLO; the power iteration is a fixed unrolled chain of 4x4 matmuls that
    vectorizes perfectly and always yields a *proper* rotation (no det-sign
    fixup needed).
    """
    s = h  # s[a, b] = sum src_a ref_b
    sxx, sxy, sxz = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
    syx, syy, syz = s[..., 1, 0], s[..., 1, 1], s[..., 1, 2]
    szx, szy, szz = s[..., 2, 0], s[..., 2, 1], s[..., 2, 2]
    n = jnp.stack(
        [
            sxx + syy + szz, syz - szy, szx - sxz, sxy - syx,
            syz - szy, sxx - syy - szz, sxy + syx, szx + sxz,
            szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy,
            sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz,
        ],
        axis=-1,
    ).reshape(h.shape[:-2] + (4, 4))
    # shift so the target eigenvalue is the dominant one in magnitude
    shift = 2.0 * jnp.linalg.norm(n, axis=(-2, -1), keepdims=True) + 1e-9
    m = n + shift * jnp.eye(4, dtype=h.dtype)
    v = jnp.ones(h.shape[:-2] + (4,), h.dtype)
    for _ in range(num_iters):
        v = jnp.einsum("...ij,...j->...i", m, v, precision=_PREC)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)
    return quaternion_to_rotation(v)


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
    method: str = "horn",
) -> jnp.ndarray:
    """Weighted Kabsch/Procrustes: rigid transform aligning src -> ref.

    Args:
        src_points: (..., N, 3)
        ref_points: (..., N, 3)
        weights: (..., N) or None
        method: 'horn' (quaternion power iteration — fast batched TPU path) or
            'svd' (jnp.linalg.svd with det-sign correction).

    Returns:
        transform: (..., 4, 4)

    Reference: ``modules/registration/procrustes.py:6-73`` (device math instead
    of the reference's CPU SVD round-trip).
    """
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], dtype=src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]

    src_centroid = jnp.sum(src_points * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=-2, keepdims=True)
    src_c = src_points - src_centroid
    ref_c = ref_points - ref_centroid

    h = jnp.einsum("...ni,...nj->...ij", src_c, w * ref_c, precision=_PREC)  # (..., 3, 3)
    if method == "horn":
        r = _horn_rotation(h)
    else:
        u, _, vt = jnp.linalg.svd(h, full_matrices=False)
        v = jnp.swapaxes(vt, -1, -2)
        ut = jnp.swapaxes(u, -1, -2)
        det = jnp.linalg.det(v @ ut)
        diag = jnp.stack(
            [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
        )
        r = jnp.einsum("...ij,...j,...jk->...ik", v, diag, ut, precision=_PREC)
    t = ref_centroid[..., 0, :] - jnp.einsum("...ij,...j->...i", r, src_centroid[..., 0, :], precision=_PREC)
    return compose_transform(r, t)


def isotropic_transform_error(
    gt_transform: jnp.ndarray, est_transform: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(RRE degrees, RTE meters).  Reference: ``registration/metrics.py:47-111``."""
    gt_r, est_r = gt_transform[..., :3, :3], est_transform[..., :3, :3]
    gt_t, est_t = gt_transform[..., :3, 3], est_transform[..., :3, 3]
    trace = jnp.einsum("...ji,...ji->...", gt_r, est_r, precision=_PREC)
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    rre = jnp.degrees(jnp.arccos(cos))
    rte = jnp.linalg.norm(gt_t - est_t, axis=-1)
    return rre, rte


def anisotropic_transform_error(
    gt_transform: jnp.ndarray, est_transform: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-axis rotation/translation errors (r_mse, r_mae, t_mse, t_mae).

    Reference: ``registration/metrics.py:114-162`` (Euler-angle decomposition).
    """
    rel = inverse_transform(gt_transform) @ est_transform
    r = rel[..., :3, :3]
    # xyz Euler angles of the relative rotation
    sy = jnp.sqrt(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2)
    ax = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    ay = jnp.arctan2(-r[..., 2, 0], sy)
    az = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    angles = jnp.degrees(jnp.stack([ax, ay, az], axis=-1))
    t = rel[..., :3, 3]
    r_mse = jnp.mean(angles**2, axis=-1)
    r_mae = jnp.mean(jnp.abs(angles), axis=-1)
    t_mse = jnp.mean(t**2, axis=-1)
    t_mae = jnp.mean(jnp.abs(t), axis=-1)
    return r_mse, r_mae, t_mse, t_mae


def modified_chamfer_distance(
    raw_points, ref_points, src_points, gt_transform, est_transform,
    raw_masks=None, ref_masks=None, src_masks=None,
):
    """Modified Chamfer distance (``registration/metrics.py:8-44``):
    mean NN distance of est-aligned src to raw ref + of gt-aligned raw to src.
    """
    from se3et_tpu.ops import geometry

    aligned_src = apply_transform(src_points, est_transform)
    sq1 = geometry.pairwise_distance(aligned_src, raw_points)
    if raw_masks is not None:
        sq1 = jnp.where(raw_masks[None, :], sq1, geometry.INF)
    d1 = jnp.min(sq1, axis=-1)
    if src_masks is not None:
        chamfer1 = jnp.sum(jnp.sqrt(d1) * src_masks) / jnp.maximum(
            jnp.sum(src_masks), 1
        )
    else:
        chamfer1 = jnp.mean(jnp.sqrt(d1))

    # Q -> P_raw: raw points moved by (est o gt^-1), matched against ref points
    composed = est_transform @ inverse_transform(gt_transform)
    aligned_raw = apply_transform(raw_points, composed)
    sq2 = geometry.pairwise_distance(ref_points, aligned_raw)
    if raw_masks is not None:
        sq2 = jnp.where(raw_masks[None, :], sq2, geometry.INF)
    d2 = jnp.min(sq2, axis=-1)
    if ref_masks is not None:
        chamfer2 = jnp.sum(jnp.sqrt(d2) * ref_masks) / jnp.maximum(
            jnp.sum(ref_masks), 1
        )
    else:
        chamfer2 = jnp.mean(jnp.sqrt(d2))
    return chamfer1 + chamfer2


def random_rotation(key: jax.Array, factor: float = 1.0) -> jnp.ndarray:
    """Uniform-ish random rotation: random axis, angle in [0, 2*pi*factor].

    Matches the reference augmentation scheme
    (``utils/pointcloud.py random_sample_rotation``).
    """
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    angle = jax.random.uniform(k2, ()) * 2.0 * jnp.pi * factor
    return rodrigues_rotation(axis, angle)

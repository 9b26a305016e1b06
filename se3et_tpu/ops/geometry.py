r"""Fixed-shape geometry ops (jax.numpy, jittable).

TPU-native replacements for ``geotransformer/modules/ops/``.  Everything is
static-shape: dynamic sets become fixed budgets + boolean masks, following the
sentinel-padding idiom the reference already uses for neighbor matrices
(index == N means "shadow" neighbor; features/points carry a zero pad row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1e10


def pairwise_distance(
    x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False, clamp: bool = True
) -> jnp.ndarray:
    """Squared pairwise distances |x_i - y_j|^2, shape (..., N, M).

    Reference: ``modules/ops/pairwise_distance.py:4-31`` (same normalized fast
    path: for unit-norm features |x-y|^2 = 2 - 2 x.y).
    """
    xy = jnp.einsum("...nc,...mc->...nm", x, y)
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x**2, axis=-1)[..., :, None]
        y2 = jnp.sum(y**2, axis=-1)[..., None, :]
        sq = x2 - 2.0 * xy + y2
    if clamp:
        sq = jnp.maximum(sq, 0.0)
    return sq


def gather_with_sentinel(
    values: jnp.ndarray, indices: jnp.ndarray, pad_value: float = 0.0
) -> jnp.ndarray:
    """Gather rows of ``values`` (N, ...) by ``indices`` where index == N (or
    any out-of-range index) returns ``pad_value``.

    This is the JAX equivalent of the reference's "concatenate a zero row, then
    index" idiom (``blocks_epn.py:377``, ``kpconv/kpconv.py:91-103``) without
    materializing the padded array.
    """
    n = values.shape[0]
    safe = jnp.clip(indices, 0, n - 1)
    out = values[safe]
    mask = (indices >= 0) & (indices < n)
    return jnp.where(
        mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim)), out, pad_value
    )


def masked_softmax(
    scores: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -1
) -> jnp.ndarray:
    """Softmax with ``mask`` (True = keep).  Fully-masked rows produce zeros."""
    if mask is None:
        return jax.nn.softmax(scores, axis=axis)
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(mask, scores, neg)
    out = jax.nn.softmax(scores, axis=axis)
    return jnp.where(mask, out, 0.0)


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False, eps: float = 1e-9
) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / (den + eps)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False):
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(mask, x, neg), axis=axis, keepdims=keepdims)


def knn(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    k: int,
    q_masks: jnp.ndarray | None = None,
    s_masks: jnp.ndarray | None = None,
):
    """Masked k-nearest-neighbors: (sq_dists (N, k), indices (N, k)).

    Padded support points are pushed to +inf distance; indices for them still
    appear if k exceeds the number of valid points — callers should use the
    returned distances or masks to filter.
    """
    sq = pairwise_distance(q_points, s_points)
    if s_masks is not None:
        sq = jnp.where(s_masks[..., None, :], sq, INF)
    neg_d, idx = jax.lax.top_k(-sq, k)
    return -neg_d, idx


def point_to_node_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_limit: int,
    point_masks: jnp.ndarray | None = None,
    node_masks: jnp.ndarray | None = None,
):
    """Voronoi point-to-node partition with per-node masked KNN patches.

    Static-shape port of ``modules/ops/pointcloud_partition.py:61-107``:
    each point is assigned to its nearest node; each node's patch is its
    ``point_limit`` nearest *assigned* points, sentinel-filled (index = N).

    Args:
        points: (N, 3) fine points (padded rows allowed)
        nodes: (M, 3) coarse points (padded rows allowed)
        point_limit: K, patch size
        point_masks: (N,) True for real points
        node_masks: (M,) True for real nodes

    Returns:
        point_to_node: (N,) int32 nearest-node index
        out_node_masks: (M,) True for nodes owning >= 1 point (and real)
        node_knn_indices: (M, K) int32, sentinel N for empty slots
        node_knn_masks: (M, K) bool
    """
    num_points = points.shape[0]
    sq = pairwise_distance(nodes, points)  # (M, N)
    if node_masks is not None:
        sq = jnp.where(node_masks[:, None], sq, INF)
    if point_masks is not None:
        sq = jnp.where(point_masks[None, :], sq, INF)

    point_to_node = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (N,)

    valid_point = (
        point_masks if point_masks is not None else jnp.ones(num_points, bool)
    )
    owns = jnp.zeros(nodes.shape[0], bool).at[point_to_node].max(valid_point)
    out_node_masks = owns if node_masks is None else jnp.logical_and(owns, node_masks)

    # Restrict each node's candidates to its own points, then top-k by distance.
    node_ids = jnp.arange(nodes.shape[0], dtype=jnp.int32)
    assigned = point_to_node[None, :] == node_ids[:, None]  # (M, N)
    assigned = jnp.logical_and(assigned, valid_point[None, :])
    sq_masked = jnp.where(assigned, sq, INF)
    neg_d, node_knn_indices = jax.lax.top_k(-sq_masked, point_limit)  # (M, K)
    node_knn_masks = (-neg_d) < INF * 0.5
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices, num_points)
    return point_to_node, out_node_masks, node_knn_indices.astype(jnp.int32), node_knn_masks


def vector_angle(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Angle between vectors along the last dim (stable atan2 form).

    Reference: ``modules/ops/vector_angle.py``.
    """
    cross = jnp.linalg.norm(jnp.cross(x, y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    return jnp.arctan2(cross, dot)

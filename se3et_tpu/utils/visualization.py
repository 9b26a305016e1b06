r"""Qualitative visualization helpers (headless).

Port of ``geotransformer/utils/visualization.py:14-158`` without the open3d
interactive windows: every function writes standard PLY/OBJ files that any
viewer opens.  The t-SNE feature coloring is the reference's
``get_colors_with_tsne`` (sklearn TSNE -> Spectral colormap); a numpy PCA
fallback (:func:`se3et_tpu.utils.pointcloud_io.feature_colors`) covers
environments without sklearn.
"""

from __future__ import annotations

import numpy as np

from se3et_tpu.utils.pointcloud_io import (
    feature_colors,
    write_correspondence_ply,
    write_ply,
)

__all__ = [
    "get_colors_with_tsne",
    "write_point_to_node_ply",
    "write_node_correspondences",
    "write_points_to_obj",
    "write_correspondences_to_obj",
]


def _spectral_colormap(t):
    """matplotlib ``Spectral`` approximation via its anchor colors (no
    matplotlib dependency)."""
    anchors = np.asarray(
        [
            (0.620, 0.004, 0.259), (0.835, 0.243, 0.310), (0.957, 0.427, 0.263),
            (0.992, 0.682, 0.380), (0.996, 0.878, 0.545), (1.000, 1.000, 0.749),
            (0.902, 0.961, 0.596), (0.671, 0.867, 0.643), (0.400, 0.761, 0.647),
            (0.196, 0.533, 0.741), (0.369, 0.310, 0.635),
        ],
        np.float64,
    )
    t = np.clip(np.asarray(t, np.float64), 0.0, 1.0) * (len(anchors) - 1)
    lo = np.floor(t).astype(int)
    hi = np.minimum(lo + 1, len(anchors) - 1)
    frac = (t - lo)[:, None]
    return (anchors[lo] * (1 - frac) + anchors[hi] * frac).astype(np.float32)


def get_colors_with_tsne(feats, perplexity=40, n_iter=300, seed=0):
    """1-D t-SNE of features -> Spectral RGB (``visualization.py:66-79``)."""
    feats = np.asarray(feats, np.float64)
    try:
        from sklearn.manifold import TSNE

        perplexity = min(perplexity, max(2, feats.shape[0] - 1))
        try:
            tsne = TSNE(n_components=1, perplexity=perplexity,
                        max_iter=max(n_iter, 250), random_state=seed)
        except TypeError:  # older sklearn uses n_iter
            tsne = TSNE(n_components=1, perplexity=perplexity,
                        n_iter=max(n_iter, 250), random_state=seed)
        emb = tsne.fit_transform(feats).reshape(-1)
    except ImportError:
        emb = feature_colors(feats, seed=seed)[:, 0]
    lo, hi = emb.min(), emb.max()
    return _spectral_colormap((emb - lo) / (hi - lo + 1e-12))


def write_point_to_node_ply(path, points, nodes, point_to_node, node_colors=None,
                            seed=0):
    """Points colored by their node assignment; nodes in red
    (``draw_point_to_node``, ``visualization.py:14-26``)."""
    rng = np.random.RandomState(seed)
    if node_colors is None:
        node_colors = rng.rand(len(nodes), 3).astype(np.float32)
    point_colors = node_colors[np.asarray(point_to_node)]
    all_points = np.concatenate([np.asarray(points), np.asarray(nodes)], 0)
    all_colors = np.concatenate(
        [point_colors, np.tile([[1.0, 0.0, 0.0]], (len(nodes), 1))], 0
    )
    write_ply(path, all_points, colors=all_colors)


def write_node_correspondences(prefix, ref_points, ref_nodes, ref_point_to_node,
                               src_points, src_nodes, src_point_to_node,
                               node_correspondences, offsets=(0.0, 2.0, 0.0),
                               seed=0):
    """Two node-colored clouds (src offset) + correspondence line set
    (``draw_node_correspondences``, ``visualization.py:28-62``).

    Writes ``<prefix>_clouds.ply`` and ``<prefix>_corr.ply``.
    """
    offsets = np.asarray(offsets, np.float32)
    src_points = np.asarray(src_points) + offsets
    src_nodes = np.asarray(src_nodes) + offsets
    rng = np.random.RandomState(seed)
    ref_nc = rng.rand(len(ref_nodes), 3).astype(np.float32)
    src_nc = rng.rand(len(src_nodes), 3).astype(np.float32)
    pts = np.concatenate([np.asarray(ref_points), src_points], 0)
    cols = np.concatenate(
        [ref_nc[np.asarray(ref_point_to_node)], src_nc[np.asarray(src_point_to_node)]], 0
    )
    write_ply(f"{prefix}_clouds.ply", pts, colors=cols)
    corr = np.asarray(node_correspondences)
    write_correspondence_ply(
        f"{prefix}_corr.ply", np.asarray(ref_nodes)[corr[:, 0]],
        src_nodes[corr[:, 1]], max_lines=len(corr),
    )


def _unit_sphere(resolution=6):
    """Lat/long sphere mesh (replaces open3d create_sphere)."""
    res = resolution
    verts = [(0.0, 0.0, 1.0)]
    for i in range(1, res):
        theta = np.pi * i / res
        for j in range(2 * res):
            phi = 2 * np.pi * j / (2 * res)
            verts.append((
                np.sin(theta) * np.cos(phi),
                np.sin(theta) * np.sin(phi),
                np.cos(theta),
            ))
    verts.append((0.0, 0.0, -1.0))
    verts = np.asarray(verts, np.float32)
    tris = []
    ring = 2 * res
    for j in range(ring):  # top cap
        tris.append((0, 1 + j, 1 + (j + 1) % ring))
    for i in range(res - 2):
        a = 1 + i * ring
        b = 1 + (i + 1) * ring
        for j in range(ring):
            j2 = (j + 1) % ring
            tris.append((a + j, b + j, b + j2))
            tris.append((a + j, b + j2, a + j2))
    last = len(verts) - 1
    base = last - ring
    for j in range(ring):  # bottom cap
        tris.append((last, base + (j + 1) % ring, base + j))
    return verts, np.asarray(tris, np.int64)


def write_points_to_obj(file_name, points, colors=None, radius=0.02,
                        resolution=6):
    """Each point as a small sphere mesh (``visualization.py:82-107``)."""
    verts, tris = _unit_sphere(resolution)
    verts = verts * radius
    points = np.asarray(points, np.float32)
    lines = []
    for i, p in enumerate(points):
        for v in verts + p:
            line = f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
            if colors is not None:
                c = colors[i]
                line += f" {c[0]:.6f} {c[1]:.6f} {c[2]:.6f}"
            lines.append(line + "\n")
    nv = len(verts)
    for i in range(len(points)):
        for t in tris + i * nv + 1:
            lines.append(f"f {t[0]} {t[1]} {t[2]}\n")
    with open(file_name, "w") as f:
        f.writelines(lines)


def write_correspondences_to_obj(file_name, src_corr_points, tgt_corr_points):
    """Correspondences as OBJ line elements (``visualization.py:137-158``)."""
    src = np.asarray(src_corr_points, np.float32)
    tgt = np.asarray(tgt_corr_points, np.float32)
    lines = []
    for i in range(len(src)):
        lines.append(f"v {src[i, 0]:.6f} {src[i, 1]:.6f} {src[i, 2]:.6f}\n")
        lines.append(f"v {tgt[i, 0]:.6f} {tgt[i, 1]:.6f} {tgt[i, 2]:.6f}\n")
    for i in range(len(src)):
        lines.append(f"l {2 * i + 1} {2 * i + 2}\n")
    with open(file_name, "w") as f:
        f.writelines(lines)

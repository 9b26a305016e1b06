"""Group-theory invariants of the anchor algebra.

These port the runtime assertions the reference uses as de-facto tests
(``blocks_epn.py:277-331``): anchor sets close under composition, kernel
dispositions are symmetric under the anchor group, and permutation tables are
true permutations.
"""

import numpy as np
import pytest

from se3et_tpu.core import anchors as A
from se3et_tpu.core import kernel_points as KP

CONFIGS = [(4, 3), (6, 4), (12, 5), (12, 1), (60, 1), (3, 1), (6, 1), (4, 2)]


def _is_rotation(r):
    return np.allclose(r @ r.T, np.eye(3), atol=1e-5) and np.linalg.det(r) > 0


@pytest.mark.parametrize("kanchor,quotient", CONFIGS)
def test_anchor_space_builds(kanchor, quotient):
    sp = A.get_anchor_space(kanchor, quotient)
    assert sp.anchors.shape == (kanchor, 3, 3)
    assert sp.quotient.shape == (quotient, 3, 3)
    assert sp.rotations.shape[0] == kanchor * quotient
    for r in sp.anchors:
        assert _is_rotation(r)


@pytest.mark.parametrize("kanchor,quotient", CONFIGS)
def test_full_set_is_group(kanchor, quotient):
    sp = A.get_anchor_space(kanchor, quotient)
    rots = sp.rotations.astype(np.float64)
    # closure: every product is in the set
    prod = np.einsum("aij,bjk->abik", rots, rots)
    d = np.linalg.norm(
        prod[:, :, None] - rots[None, None], axis=(-1, -2)
    )  # (R, R, R)
    assert d.min(axis=2).max() < 1e-3
    # identity present
    d_id = np.linalg.norm(rots - np.eye(3), axis=(-1, -2))
    assert d_id.min() < 1e-4


@pytest.mark.parametrize("kanchor,quotient", CONFIGS)
def test_composition_tables_are_permutations(kanchor, quotient):
    sp = A.get_anchor_space(kanchor, quotient)
    for r in range(kanchor):
        assert sorted(sp.ridx_ori[r].tolist()) == list(range(kanchor))
        assert sorted(sp.ridx_rot[:, r].tolist()) == list(range(kanchor))
        # inverse relationship: ridx_ori[r, ridx_rot[a, r]] == a
        for a in range(kanchor):
            assert sp.ridx_ori[r, sp.ridx_rot[a, r]] == a


@pytest.mark.parametrize("kanchor,quotient", [(4, 3), (6, 4), (12, 5)])
def test_vertex_trace_tables(kanchor, quotient):
    sp = A.get_anchor_space(kanchor, quotient)
    verts = sp.vertices.astype(np.float64)
    rots = sp.rotations.astype(np.float64)
    for r in range(sp.num_rotations):
        perm = sp.trace_idx_ori[r]
        assert sorted(perm.tolist()) == list(range(kanchor))
        # v[perm[a]] == R_r v_a
        np.testing.assert_allclose(verts[perm], verts @ rots[r].T, atol=1e-4)
        # trace_idx_rot is the inverse permutation
        inv = sp.trace_idx_rot[r]
        assert np.array_equal(perm[inv], np.arange(kanchor))


def test_anchor_sections_map_z_to_vertices():
    for kanchor, quotient in [(4, 3), (6, 4), (12, 5)]:
        sp = A.get_anchor_space(kanchor, quotient)
        ez = np.array([0.0, 0.0, 1.0])
        mapped = np.einsum("aij,j->ai", sp.anchors.astype(np.float64), ez)
        np.testing.assert_allclose(mapped, sp.vertices, atol=1e-4)


@pytest.mark.parametrize(
    "kanchor,quotient,num_k,expect_real",
    [(6, 4, 15, 6), (6, 4, 7, 4), (4, 3, 15, 7), (12, 5, 13, 5)],
)
def test_kernel_tables(kanchor, quotient, num_k, expect_real):
    sp = A.get_anchor_space(kanchor, quotient)
    kp = KP.equivariant_kernel_points(1.0, num_k, kanchor, quotient)
    kidx_rot, fold, num_real = KP.kernel_permutation_tables(kp, sp, radius=1.0)
    assert kidx_rot.shape == (kanchor, num_k)
    for a in range(kanchor):
        assert sorted(kidx_rot[a].tolist()) == list(range(num_k))
        # kernel[kidx_rot[a, k]] == R_a^{-1} kernel[k]
        np.testing.assert_allclose(
            kp[kidx_rot[a]],
            kp @ sp.anchors[a].astype(np.float64),
            atol=1e-3,
        )
    assert num_real == expect_real
    assert fold.max() == num_real - 1


def test_invariant_kernel_disposition():
    kp = KP.load_kernels(1.0, 15, fixed="center", equiv_mode=True)
    assert kp.shape == (15, 3)
    # center point at origin
    assert np.linalg.norm(kp[0]) < 1e-5
    # mean radius of non-center points near 0.66
    r = np.linalg.norm(kp[1:], axis=1)
    assert abs(r.mean() - 0.66) < 0.02
    # points are well separated (repulsion converged)
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.3


def test_lloyd_kernel_disposition():
    """>30 kernel points switch to the Lloyd generator (reference
    ``kernel_points.py:397-398``): centroidal cells in the unit ball."""
    kp = KP.load_kernels(1.0, 45, fixed="center", equiv_mode=True)
    assert kp.shape == (45, 3)
    assert np.linalg.norm(kp[0]) < 1e-5
    r = np.linalg.norm(kp[1:], axis=1)
    # Lloyd cells fill the ball (no 0.66 ratio — the reference scales Lloyd
    # output by radius directly)
    assert r.max() < 1.0 and r.mean() > 0.5
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.25  # well-separated Voronoi centers
    kpv = KP.load_kernels(1.0, 45, fixed="verticals", equiv_mode=True)
    assert np.abs(kpv[:3, :2]).max() < 1e-6  # fixed vertical rows held


def test_label_relative_rotation():
    sp = A.get_anchor_space(6, 4)
    rots = sp.rotations.astype(np.float64)
    for idx in [0, 5, 17]:
        jitter = A.rot_z(0.05) @ rots[idx]
        target, label = A.label_relative_rotation(rots, jitter)
        assert label == idx
        np.testing.assert_allclose(target, A.rot_z(0.05), atol=1e-4)

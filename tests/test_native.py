"""Native C++ kernels vs the numpy golden reference."""

import numpy as np
import pytest

from se3et_tpu.data import host_ops, native_bridge

pytestmark = pytest.mark.skipif(
    not native_bridge.available(), reason="native library not built"
)


def test_grid_subsample_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    idx = native_bridge.grid_subsample_indices(pts, 0.2)
    sub_native = pts[idx]
    sub_numpy, _ = host_ops.grid_subsample_single(pts, 0.2)
    # float32-vs-float64 voxel-boundary rounding may flip a few boundary
    # points between voxels; require near-identical selections
    assert abs(sub_native.shape[0] - sub_numpy.shape[0]) <= 2
    a = set(map(tuple, np.round(sub_native, 5)))
    b = set(map(tuple, np.round(sub_numpy, 5)))
    jaccard = len(a & b) / len(a | b)
    assert jaccard > 0.9, jaccard


def test_radius_search_matches_numpy():
    rng = np.random.RandomState(1)
    q = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    out_native = native_bridge.radius_search(q, s, 0.3, 16)
    out_numpy = host_ops.radius_search_single(q, s, 0.3, 16)
    # same neighbor sets; both distance-sorted, ties may permute
    for i in range(100):
        a = out_native[i][out_native[i] < 200]
        b = out_numpy[i][out_numpy[i] < 200]
        assert set(a.tolist()) == set(b.tolist()), i
        # sorted by distance
        d = np.linalg.norm(s[a] - q[i], axis=1)
        assert np.all(np.diff(d) >= -1e-6)


def test_knn():
    rng = np.random.RandomState(2)
    q = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    s = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    out = native_bridge.knn(q, s, 8, cell_hint=0.2)
    d = np.linalg.norm(q[:, None] - s[None], axis=-1)
    expect = np.argsort(d, axis=1)[:, :8]
    for i in range(50):
        got = np.linalg.norm(s[out[i]] - q[i], axis=1)
        want = np.sort(d[i])[:8]
        np.testing.assert_allclose(np.sort(got), want, atol=1e-5)

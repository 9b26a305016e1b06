"""Windowed fused conv: host window maps + Pallas kernel vs the gather path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3et_tpu.data import pipeline as pipe


def test_build_window_maps_roundtrip():
    """Window-local indices must decode back to the original neighbors."""
    rng = np.random.RandomState(0)
    cap_q, cap_s, h = 300, 280, 9
    nbr = rng.randint(0, cap_s + 1, size=(cap_q, h)).astype(np.int32)  # incl sentinel
    nseg = (cap_s + pipe.WINDOW_SSEG - 1) // pipe.WINDOW_SSEG  # all segments fit
    seg_idx, local = pipe.build_window_maps(nbr, cap_s, nseg)
    w = nseg * pipe.WINDOW_SSEG
    for b in range(seg_idx.shape[0]):
        rows = slice(b * pipe.WINDOW_QSEG, (b + 1) * pipe.WINDOW_QSEG)
        loc = local[rows]
        orig = nbr[rows]
        valid = loc < w
        # every real neighbor must be mapped (no drops when all segments fit)
        np.testing.assert_array_equal(valid, orig[: loc.shape[0]] < cap_s)
        slot = loc[valid] // pipe.WINDOW_SSEG
        decoded = seg_idx[b][slot] * pipe.WINDOW_SSEG + loc[valid] % pipe.WINDOW_SSEG
        np.testing.assert_array_equal(decoded, orig[valid])


def test_window_overflow_drops_are_masked_and_counted():
    rng = np.random.RandomState(1)
    cap_q, cap_s, h = 128, 128 * 6, 16
    nbr = rng.randint(0, cap_s, size=(cap_q, h)).astype(np.int32)  # spread wide
    pipe.WINDOW_DROP_STATS.clear()
    seg_idx, local = pipe.build_window_maps(nbr, cap_s, 2, stats_key="t")
    w = 2 * pipe.WINDOW_SSEG
    dropped, total = pipe.WINDOW_DROP_STATS["t"]
    assert total == cap_q * h
    assert dropped > 0
    assert (local == w).sum() == dropped  # dropped neighbors -> sentinel


@pytest.mark.parametrize("sseg,nseg", [(16, 6), (8, 12), (4, 24)])
def test_windowed_conv_matches_gather_path(sseg, nseg):
    """KPConvInterSO3 with window maps == the row-gather formulation —
    at the default 16-row segments and the per-set 8/4-row granularities
    (same window width W = nseg * sseg)."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.nn.epn import EPNConfig, KPConvInterSO3

    item = SyntheticPairDataset(num_pairs=1, num_points=700, seed=0)[0]
    cfg = pipe.PyramidConfig(
        num_stages=2, voxel_size=0.1, search_radius=0.25,
        neighbor_limits=(10, 10), stage_caps=(512, 192), coarse_point_cap=192,
        window_segments=nseg,
        window_sseg_by_set=(("neighbors_0", sseg),),
    )
    pipe.WINDOW_DROP_STATS.clear()
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 512, 6, 4), jnp.float32
    )
    pts = jnp.asarray(data["points_0"])
    nbr = jnp.asarray(data["neighbors_0"])
    conv = KPConvInterSO3(4, 8, radius=0.25, sigma=0.2, config=EPNConfig())
    params = conv.init(jax.random.PRNGKey(0), x, pts, pts, nbr)
    window = (
        jnp.asarray(data["neighbors_segs_0"]),
        jnp.asarray(data["neighbors_local_0"]),
        int(data["neighbors_wsseg_0"].shape[-1]),
    )
    assert window[2] == sseg
    ref = conv.apply(params, x, pts, pts, nbr)
    got = conv.apply(params, x, pts, pts, nbr, window=window)
    # the tiny 3-segment budget may drop a few neighbors (counted); the
    # mismatching element fraction must stay below the measured drop rate
    dropped, total = pipe.WINDOW_DROP_STATS.get("neighbors_0", [0, 1])
    mismatch = np.mean(
        ~np.isclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    )
    assert mismatch <= max(4.0 * dropped / max(total, 1), 0.0), (
        mismatch, dropped, total
    )


def test_windowed_gather_wf_kfirst_matches_default():
    """K-first contraction variant == default wf kernel (both dtypes).

    The variants differ only in contraction order (scatter influence into the
    window axis first vs gather features first); f32 must agree to matmul
    roundoff, bf16 to one rounding class.
    """
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(1)
    b, nq, h, k, w, ac = 1, 128, 24, 15, 64, 96
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    infl = jnp.asarray(
        rng.rand(b, nq, h, k) * (np.asarray(local)[..., None] < w), jnp.float32
    )
    windows = jnp.asarray(rng.randn(b, nblk_q, w, ac), jnp.float32)

    ref = wc.windowed_gather_wf(local, infl, windows, interpret=True)
    got = wc.windowed_gather_wf(local, infl, windows, interpret=True,
                                kfirst=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    ib, wb = infl.astype(jnp.bfloat16), windows.astype(jnp.bfloat16)
    ref = np.asarray(
        wc.windowed_gather_wf(local, ib, wb, interpret=True), np.float32
    )
    got = np.asarray(
        wc.windowed_gather_wf(local, ib, wb, interpret=True, kfirst=True),
        np.float32,
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)


def test_windowed_gather_wf_max_matches_separate():
    """Fused conv+skip-max kernel == (windowed_gather_wf, windowed_max_pool)
    run separately, in both contraction orders — including h-padding
    columns (h not a multiple of hc) and sentinel-only padded query rows."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(7)
    b, nq, h, k, w, ac, ac2 = 1, 100, 11, 15, 64, 96, 160
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    infl = jnp.asarray(
        rng.rand(b, nq, h, k) * (np.asarray(local)[..., None] < w),
        jnp.float32,
    )
    windows = jnp.asarray(rng.randn(b, nblk_q, w, ac), jnp.float32)
    windows2 = jnp.asarray(rng.randn(b, nblk_q, w, ac2), jnp.float32)

    for kfirst in (False, True):
        wf, pooled = wc.windowed_gather_wf_max(
            local, infl, windows, windows2, kfirst=kfirst, interpret=True
        )
        ref_wf = wc.windowed_gather_wf(local, infl, windows, kfirst=kfirst,
                                       interpret=True)
        ref_pool = wc.windowed_max_pool(local, windows2, nq, interpret=True)
        np.testing.assert_allclose(np.asarray(wf), np.asarray(ref_wf),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool),
                                   rtol=1e-5, atol=1e-5)


def test_windowed_gather_wf_max_mm_matches_separate():
    """Matmul-fused conv+skip-max kernel == (windowed_gather_wf_max,
    expanded weight matmul) run separately, both contraction orders."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(11)
    b, nq, h, k, w, ac, ac2, ac_out = 1, 100, 11, 15, 64, 96, 160, 128
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    infl = jnp.asarray(
        rng.rand(b, nq, h, k) * (np.asarray(local)[..., None] < w),
        jnp.float32,
    )
    windows = jnp.asarray(rng.randn(b, nblk_q, w, ac), jnp.float32)
    windows2 = jnp.asarray(rng.randn(b, nblk_q, w, ac2), jnp.float32)
    rhs = jnp.asarray(rng.randn(k * ac, ac_out) * 0.1, jnp.float32)

    assert wc.windowed_wf_max_mm_fits(w, ac, ac2, ac_out, h, k)
    for kfirst in (False, True):
        got, pooled = wc.windowed_gather_wf_max_mm(
            local, infl, windows, windows2, rhs, kfirst=kfirst,
            interpret=True,
        )
        ref_wf, ref_pool = wc.windowed_gather_wf_max(
            local, infl, windows, windows2, kfirst=kfirst, interpret=True
        )
        ref = jnp.einsum("bnm,mo->bno", ref_wf, rhs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool),
                                   rtol=1e-5, atol=1e-5)


def test_windowed_gather_wf_mm_matches_separate():
    """Matmul-fused conv kernel == windowed_gather_wf -> expanded weight
    matmul, in both contraction orders and both dtypes.  The fused kernel
    never writes the (B, Nq, K*AC) wf intermediate; its epilogue consumes
    the expanded weight per kernel point (lane-sliced K matmuls)."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(3)
    b, nq, h, k, w, ac, ac_out = 1, 100, 11, 15, 64, 96, 160
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    infl = jnp.asarray(
        rng.rand(b, nq, h, k) * (np.asarray(local)[..., None] < w),
        jnp.float32,
    )
    windows = jnp.asarray(rng.randn(b, nblk_q, w, ac), jnp.float32)
    rhs = jnp.asarray(rng.randn(k * ac, ac_out) * 0.1, jnp.float32)

    assert wc.windowed_wf_mm_fits(w, ac, ac_out, h, k)
    for kfirst in (False, True):
        got = wc.windowed_gather_wf_mm(local, infl, windows, rhs,
                                       kfirst=kfirst, interpret=True)
        wf = wc.windowed_gather_wf(local, infl, windows, kfirst=kfirst,
                                   interpret=True)
        ref = jnp.einsum("bnm,mo->bno", wf, rhs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    ib, wb = infl.astype(jnp.bfloat16), windows.astype(jnp.bfloat16)
    rb = rhs.astype(jnp.bfloat16)
    got = np.asarray(
        wc.windowed_gather_wf_mm(local, ib, wb, rb, interpret=True),
        np.float32,
    )
    wf = wc.windowed_gather_wf(local, ib, wb, interpret=True)
    ref = np.asarray(jnp.einsum("bnm,mo->bno", wf, rb), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.03 * scale)


def test_influence_windowed_matches_xla():
    """The windowed influence kernel reproduces _influence_weights exactly."""
    from se3et_tpu.nn.epn import _influence_weights
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(3)
    cap, h, k = 256, 7, 5
    pts = jnp.asarray(rng.uniform(0, 0.6, size=(1, cap, 3)), jnp.float32)
    nbr = jnp.asarray(rng.randint(0, cap + 1, size=(1, cap, h)), jnp.int32)
    kp = jnp.asarray(rng.uniform(-0.1, 0.1, size=(k, 3)), jnp.float32)
    nseg = cap // pipe.WINDOW_SSEG  # all segments fit -> zero drops
    seg_idx, local = pipe.build_window_maps(np.asarray(nbr[0]), cap, nseg)
    segs = jnp.asarray(seg_idx)[None]
    local = jnp.asarray(local)[None]
    win3 = wc.segment_window_gather(pts, segs, precision=jax.lax.Precision.HIGHEST)
    infl, inf_sum = wc.influence_windowed_pallas(
        local, pts, win3, kp, sigma=0.15, interpret=True, out_dtype=jnp.float32
    )
    ref_w = _influence_weights(pts, pts, nbr, kp, 0.15)  # (1, cap, h, k)
    # tolerance: the kernel gathers coordinates as double-bf16 (hi + lo),
    # whose ~2^-18 relative reconstruction error surfaces as ~1e-5 absolute
    # influence error at these coordinate magnitudes
    np.testing.assert_allclose(
        np.asarray(inf_sum), np.asarray(ref_w).sum(2), rtol=1e-3, atol=2e-4
    )
    got = np.sort(np.asarray(infl), axis=2)
    want = np.sort(np.asarray(ref_w), axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_backbone_fused_matches_unfused():
    """Full E2PN backbone: fused windowed path == gather path (fp32 CPU)."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.nn.epn import E2PNBackbone, EPNConfig

    item = SyntheticPairDataset(num_pairs=1, num_points=500, seed=1)[0]
    cfg = pipe.PyramidConfig(
        num_stages=3, voxel_size=0.12, search_radius=0.3,
        neighbor_limits=(10, 10, 10), stage_caps=(384, 160, 64),
        # all segments of the largest stage fit -> zero drops by construction
        coarse_point_cap=64,
        window_segments=-(-384 // pipe.WINDOW_SSEG),
    )
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    net = E2PNBackbone(
        input_dim=1, output_dim=16, init_dim=8, init_radius=0.3,
        init_sigma=0.24, group_norm=4, config=EPNConfig(), num_stages=3,
        ones_input=True,
    )
    params = net.init(jax.random.PRNGKey(0), data["features"], data)
    pipe.WINDOW_DROP_STATS.clear()
    ff_ref, fc_ref = net.apply(params, data["features"], data, fused=False)
    ff_got, fc_got = net.apply(params, data["features"], data, fused=True)
    # fused path: the influence kernel's double-bf16 coordinate windows carry
    # ~2^-18 relative reconstruction error (~1e-5 per-layer influence noise),
    # amplified through 9 conv layers / group norms.  Measured max abs error
    # at this config: 3.0e-3 (ff) / 6.5e-3 (fc) with ZERO window drops —
    # bounds are ~2x that, so a real divergence above ~1% relative fails.
    np.testing.assert_allclose(np.asarray(ff_got), np.asarray(ff_ref),
                               rtol=2e-2, atol=6e-3)
    np.testing.assert_allclose(np.asarray(fc_got), np.asarray(fc_ref),
                               rtol=2e-2, atol=1.3e-2)


def test_cap_truncation_unbiased_and_counted():
    """Stage caps subsample uniformly (not a Morton prefix) and bind rates are
    recorded (reference random-subsamples, threedmatch/dataset.py:77-81)."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 1, size=(800, 3)).astype(np.float32)
    cfg = pipe.PyramidConfig(
        num_stages=2, voxel_size=0.02, search_radius=0.05,
        neighbor_limits=(8, 8), stage_caps=(400, 200), coarse_point_cap=200,
        window_segments=0,
    )
    pipe.CAP_BIND_STATS.clear()
    stage_points, _, neighbors, _, _ = pipe.build_cloud_pyramid(pts, cfg)
    assert stage_points[0].shape[0] == 400
    assert pipe.CAP_BIND_STATS["stage_0"][0] == 1
    # unbiased: kept points span the full extent, not one spatial corner
    kept = stage_points[0]
    assert np.all(kept.max(0) > 0.9) and np.all(kept.min(0) < 0.1)
    # neighbor indices consistent with the capped point set
    assert neighbors[0].max() <= 400


def test_windowed_max_pool_matches_gather():
    from se3et_tpu.nn.epn import max_pool_neighbors
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(5)
    cap_q, cap_s, h, ac = 256, 384, 9, 16
    nbr = rng.randint(0, cap_s + 1, size=(1, cap_q, h)).astype(np.int32)
    feats = jnp.asarray(rng.randn(1, cap_s, ac), jnp.float32)
    nseg = cap_s // pipe.WINDOW_SSEG  # all segments fit
    seg_idx, local = pipe.build_window_maps(nbr[0], cap_s, nseg)
    win = wc.segment_window_gather(feats, jnp.asarray(seg_idx)[None])
    got = wc.windowed_max_pool(
        jnp.asarray(local)[None], win, cap_q, interpret=True
    )
    want = max_pool_neighbors(feats, jnp.asarray(nbr))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def _check_budget_drops(exp, extent, seed):
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.experiments import make_cfg

    cfg = make_cfg(exp)
    item = SyntheticPairDataset(
        num_pairs=1, num_points=cfg.data.point_limit, extent=extent, seed=seed
    )[0]
    pipe.WINDOW_DROP_STATS.clear()
    pipe.H_DROP_STATS.clear()
    pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg.pipeline
    )
    for key, (dropped, total) in pipe.WINDOW_DROP_STATS.items():
        assert dropped / max(total, 1) <= 0.01, (key, dropped, total)
    # neighbor-H caps: entry-count drops may exceed the 0.5% influence-mass
    # calibration (dropped entries are the farthest = lowest-weight ones);
    # lock at a 4% entry-rate ceiling per set.
    for key, (dropped, total) in pipe.H_DROP_STATS.items():
        assert dropped / max(total, 1) <= 0.04, (key, dropped, total)


def test_cap_neighbor_h_compacts_then_truncates():
    """_cap_neighbor_h pushes valid entries left (stable, preserving the
    radius search's distance order) before cutting, so a row whose valid
    entries are interleaved with sentinels loses only true overflow."""
    sent = 100
    arr = np.array(
        [
            [3, sent, 5, sent, 7, 9],   # 4 valid, interleaved sentinels
            [sent] * 6,                  # all padding
            [0, 1, 2, 3, 4, 5],          # full row: one real drop
        ],
        np.int32,
    )
    pipe.H_DROP_STATS.clear()
    out = pipe._cap_neighbor_h(arr.copy(), 5, sent, "t")
    assert out.shape == (3, 5)
    np.testing.assert_array_equal(out[0], [3, 5, 7, 9, sent])
    assert np.all(out[1] == sent)
    np.testing.assert_array_equal(out[2], [0, 1, 2, 3, 4])
    dropped, total = pipe.H_DROP_STATS["t"]
    assert (dropped, total) == (1, 10)
    # no-op cases return the input untouched
    assert pipe._cap_neighbor_h(arr, 0, sent, "t2") is arr
    assert pipe._cap_neighbor_h(arr, 6, sent, "t2") is arr


def test_production_window_budgets_drop_rate():
    """The shipped 3DMatch per-set window budgets keep drops <= 1% on a
    production-scale synthetic pair (calibration lock; see BENCH.md)."""
    _check_budget_drops("se3ete.3dmatch", extent=2.0, seed=123)


def test_kitti_window_budgets_drop_rate():
    """KITTI 5-stage budgets hold <= 1% drops at LiDAR scale (extent 20,
    matching runner.build_dataset's synthetic-fallback scale)."""
    _check_budget_drops("se3eti.kitti", extent=20.0, seed=123)


def test_host_influence_matches_device_formulation():
    """data/influence.py (numpy fp32 -> bf16) == nn/epn._influence_weights
    for every conv set of a pyramid, within bf16 storage rounding."""
    import jax.numpy as jnp

    from se3et_tpu.core import kernel_points as kp_lib
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.influence import precompute_influence
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn.epn import _influence_weights

    cfg = make_cfg("se3ete.3dmatch")
    item = SyntheticPairDataset(num_pairs=1, num_points=3000, seed=2)[0]
    import dataclasses

    pcfg = dataclasses.replace(
        cfg.pipeline, stage_caps=(3000, 1500, 512, 256), coarse_point_cap=256
    )
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], pcfg
    )
    precompute_influence(data, cfg.model)
    mc, epn_cfg = cfg.model, cfg.model.epn
    r0, s0 = mc.init_radius, mc.init_sigma

    def device_ref(radius, sigma, q, sup, idx):
        kp = kp_lib.equivariant_kernel_points(
            radius, epn_cfg.num_kernel_points, epn_cfg.kanchor,
            epn_cfg.quotient_factor,
        )
        return np.asarray(_influence_weights(
            jnp.asarray(q), jnp.asarray(sup), jnp.asarray(idx),
            jnp.asarray(kp), sigma, epn_cfg.kp_influence,
        ))

    pts = [np.asarray(data[f"points_{i}"]) for i in range(4)]
    checks = [("influence_same_0", device_ref(r0, s0, pts[0], pts[0],
                                              data["neighbors_0"]))]
    for st in (1, 2, 3):
        mult = 2 ** (st - 1)
        checks.append((f"influence_sub_{st}", device_ref(
            r0 * mult, s0 * mult, pts[st], pts[st - 1],
            data[f"subsampling_{st - 1}"])))
        checks.append((f"influence_same_{st}", device_ref(
            r0 * mult * 2, s0 * mult * 2, pts[st], pts[st],
            data[f"neighbors_{st}"])))
    for key, want in checks:
        got = np.asarray(data[key], np.float32)
        # host arrays carry zero h-padding to the kernel's hc multiple
        assert got.shape[2] >= want.shape[2] and got.shape[2] % 8 == 0, key
        # bf16 storage: 8-bit mantissa, ulp at 1.0 = 2^-8 ~ 3.9e-3
        np.testing.assert_allclose(
            got[:, :, : want.shape[2]], want, atol=4e-3, err_msg=key
        )
        np.testing.assert_array_equal(got[:, :, want.shape[2]:], 0.0)


def test_model_with_host_influence_matches_without():
    """Full backbone: host-precomputed influence == on-device influence to
    bf16 storage noise."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.influence import precompute_influence
    from se3et_tpu.nn.epn import E2PNBackbone, EPNConfig
    import jax
    import jax.numpy as jnp

    item = SyntheticPairDataset(num_pairs=1, num_points=500, seed=1)[0]
    cfg = pipe.PyramidConfig(
        num_stages=3, voxel_size=0.12, search_radius=0.3,
        neighbor_limits=(10, 10, 10), stage_caps=(384, 160, 64),
        # all segments of the largest stage fit -> zero drops by construction
        coarse_point_cap=64,
        window_segments=-(-384 // pipe.WINDOW_SSEG),
    )
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    net = E2PNBackbone(
        input_dim=1, output_dim=16, init_dim=8, init_radius=0.3,
        init_sigma=0.24, group_norm=4,
        config=EPNConfig(kanchor=6, quotient_factor=4),
        num_stages=3, ones_input=True,
    )
    params = net.init(jax.random.PRNGKey(0), data["features"], data)
    ff_ref, fc_ref = net.apply(params, data["features"], data, fused=False)

    class MC:  # minimal model-config view for precompute_influence
        backbone = "e2pn"
        num_stages = 3
        init_radius = 0.3
        init_sigma = 0.24
        kernel_size = 15
        epn = EPNConfig(kanchor=6, quotient_factor=4)

    host = {k: np.asarray(v) for k, v in data.items()}
    precompute_influence(host, MC)
    host = {k: jnp.asarray(v) for k, v in host.items()}
    ff_got, fc_got = net.apply(params, host["features"], host, fused=False)
    # bf16 influence storage (ulp ~4e-3 at 1.0; the production serving
    # precision — the fused kernel emits the same) vs the fp32 unfused
    # fallback, amplified through the GroupNorm stack: thin tail of larger
    # deviations on O(1) outputs.  Same magnitude as the fused-vs-unfused
    # test's double-bf16 bound.
    for got, ref in ((ff_got, ff_ref), (fc_got, fc_ref)):
        diff = np.abs(np.asarray(got) - np.asarray(ref))
        assert np.quantile(diff, 0.999) < 3e-2, np.quantile(diff, 0.999)
        assert diff.max() < 1e-1, diff.max()


def test_influence_signature_guard():
    """verify_influence strips tensors stamped under a different config
    (and accepts a matching stamp / leaves unstamped-but-absent dicts alone)."""
    import warnings

    from se3et_tpu.data.influence import (
        influence_signature,
        verify_influence,
    )
    from se3et_tpu.nn.epn import EPNConfig
    from se3et_tpu.nn.model import ModelConfig

    cfg_a = ModelConfig(init_sigma=0.05)
    cfg_b = ModelConfig(init_sigma=0.06)  # different sigma schedule
    cfg_c = ModelConfig(
        init_sigma=0.05, epn=EPNConfig(kp_influence="gaussian")
    )
    assert not np.array_equal(
        influence_signature(cfg_a), influence_signature(cfg_b)
    )
    assert not np.array_equal(
        influence_signature(cfg_a), influence_signature(cfg_c)
    )

    data = {
        "influence_same_0": np.ones((2, 4, 8, 15), np.float32),
        "influence_sig": influence_signature(cfg_a),
        "points_0": np.zeros((2, 4, 3), np.float32),
    }
    # matching stamp: accepted untouched
    verify_influence(dict(data), cfg_a)
    kept = dict(data)
    verify_influence(kept, cfg_a)
    assert "influence_same_0" in kept

    # mismatched stamp (or a legacy dict with no stamp): stripped with warning
    for bad in (dict(data), {k: v for k, v in data.items() if k != "influence_sig"}):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            verify_influence(bad, cfg_b)
        assert "influence_same_0" not in bad
        assert "influence_sig" not in bad
        assert "points_0" in bad
        assert len(w) == 1

    # no influence keys at all: no-op, no warning
    clean = {"points_0": data["points_0"]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        verify_influence(clean, cfg_b)
    assert not w


def test_conv_kfirst_config_matches_default():
    """KPConvInterSO3 with EPNConfig.wf_kfirst == the default kernel order."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.nn.epn import EPNConfig, KPConvInterSO3

    item = SyntheticPairDataset(num_pairs=1, num_points=700, seed=3)[0]
    cfg = pipe.PyramidConfig(
        num_stages=2, voxel_size=0.1, search_radius=0.25,
        neighbor_limits=(10, 10), stage_caps=(512, 192), coarse_point_cap=192,
        window_segments=6,
    )
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    x = jnp.asarray(np.random.RandomState(3).randn(2, 512, 6, 4), jnp.float32)
    pts = jnp.asarray(data["points_0"])
    nbr = jnp.asarray(data["neighbors_0"])
    window = (
        jnp.asarray(data["neighbors_segs_0"]),
        jnp.asarray(data["neighbors_local_0"]),
        int(data["neighbors_wsseg_0"].shape[-1]),
    )
    conv = KPConvInterSO3(4, 8, radius=0.25, sigma=0.2, config=EPNConfig())
    params = conv.init(jax.random.PRNGKey(0), x, pts, pts, nbr)
    ref = conv.apply(params, x, pts, pts, nbr, window=window)
    conv_k = KPConvInterSO3(
        4, 8, radius=0.25, sigma=0.2, config=EPNConfig(wf_kfirst=True)
    )
    got = conv_k.apply(params, x, pts, pts, nbr, window=window)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_windowed_conv_custom_vjp_matches_xla_grads():
    """windowed_gather_wf_trainable grads == autodiff of the XLA gather
    formulation (f32 exact; d_win via the K-first scatter-transpose kernel)."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(0)
    b, nq, h, k, w, ac = 1, 128, 24, 15, 64, 96
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    infl = jnp.asarray(
        rng.rand(b, nq, h, k) * (np.asarray(local)[..., None] < w), jnp.float32
    )
    windows = jnp.asarray(rng.randn(b, nblk_q, w, ac), jnp.float32)

    def xla_ref(i_, w_):
        loc = jnp.pad(local, ((0, 0), (0, nblk_q * wc.QSEG - nq), (0, 0)),
                      constant_values=w)
        idx = loc.reshape(b, nblk_q, wc.QSEG * h)
        g = jnp.take_along_axis(w_, jnp.clip(idx, 0, w - 1)[..., None], axis=2)
        g = g * (idx[..., None] < w)
        g = g.reshape(b, nblk_q * wc.QSEG, h, ac)[:, :nq]
        return jnp.einsum("bnhk,bnhc->bnkc", i_, g).reshape(b, nq, k * ac)

    ct = jnp.asarray(rng.randn(b, nq, k * ac), jnp.float32)
    gr = jax.grad(lambda i_, w_: jnp.sum(xla_ref(i_, w_) * ct), (0, 1))(
        infl, windows
    )
    gn = jax.grad(
        lambda i_, w_: jnp.sum(
            wc.windowed_gather_wf_trainable(local, i_, w_, False, True) * ct
        ),
        (0, 1),
    )(infl, windows)
    np.testing.assert_allclose(np.asarray(gn[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    scale = float(np.abs(np.asarray(gr[1])).max())
    np.testing.assert_allclose(np.asarray(gn[1]), np.asarray(gr[1]),
                               atol=1e-5 * scale)
    # kfirst forward composes with the same backward
    gk = jax.grad(
        lambda i_, w_: jnp.sum(
            wc.windowed_gather_wf_trainable(local, i_, w_, True, True) * ct
        ),
        (0, 1),
    )(infl, windows)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               atol=1e-5 * scale)


@pytest.mark.slow
def test_backbone_train_fused_conv_grads_match():
    """Backbone param grads: fused_conv_grad (windowed kernels + custom VJP)
    == the XLA gather train path, at a window budget with zero drops."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.nn.epn import E2PNBackbone, EPNConfig

    item = SyntheticPairDataset(num_pairs=1, num_points=500, seed=5)[0]
    cfg = pipe.PyramidConfig(
        num_stages=3, voxel_size=0.12, search_radius=0.3,
        neighbor_limits=(10, 10, 10), stage_caps=(384, 160, 64),
        # all segments of the largest stage fit -> zero drops by construction
        coarse_point_cap=64,
        window_segments=-(-384 // pipe.WINDOW_SSEG),
    )
    pipe.WINDOW_DROP_STATS.clear()
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    assert all(d == 0 for d, _ in pipe.WINDOW_DROP_STATS.values()), (
        pipe.WINDOW_DROP_STATS
    )
    # host-precomputed influence: BOTH paths then consume identical influence
    # tensors, isolating the comparison to the conv gather + custom VJP (the
    # windowed influence kernel's double-bf16 coordinates add ~1e-5 noise
    # that GroupNorm otherwise amplifies across stages)
    from se3et_tpu.data.influence import precompute_influence
    from se3et_tpu.nn.model import ModelConfig

    precompute_influence(
        data,
        ModelConfig(
            backbone="e2pn", init_radius=0.3, init_sigma=0.24,
            epn=EPNConfig(), num_stages=3,
        ),
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    net = E2PNBackbone(
        input_dim=1, output_dim=16, init_dim=8, init_radius=0.3,
        init_sigma=0.24, group_norm=4, config=EPNConfig(), num_stages=3,
        ones_input=True,
    )
    params = net.init(jax.random.PRNGKey(0), data["features"], data)

    def loss(p, **kw):
        ff, fc = net.apply(p, data["features"], data, **kw)
        return jnp.sum(ff**2) + jnp.sum(fc**2)

    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(loss)(params)
    g_new = jax.grad(lambda p: loss(p, fused_conv_grad=True))(params)
    flat_r, _ = ravel_pytree(g_ref)
    flat_n, _ = ravel_pytree(g_new)
    # the two forwards reassociate f32 sums (one-hot matmul vs row gather);
    # GroupNorm amplifies that to ~1e-4 relative in the grads
    scale = float(jnp.max(jnp.abs(flat_r))) + 1e-9
    np.testing.assert_allclose(np.asarray(flat_n), np.asarray(flat_r),
                               rtol=2e-3, atol=1e-3 * scale)


def test_windowed_max_pool_custom_vjp_matches_xla_grads():
    """windowed_max_pool_trainable grads == autodiff of the XLA shadow-zero
    max formulation, including even tie-splitting with dropped shadow shares."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(4)
    b, nq, h, w, ac = 1, 128, 10, 64, 32
    nblk_q = (nq + wc.QSEG - 1) // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, size=(b, nq, h)), jnp.int32)
    # quantized values force ties (incl. negative-only rows maxing at the
    # shadow zero)
    windows = jnp.asarray(
        np.round(rng.randn(b, nblk_q, w, ac) * 2) / 2, jnp.float32
    )

    def xla_ref(w_):
        idx = local.reshape(b, nblk_q, -1)
        g = jnp.take_along_axis(
            w_, jnp.clip(idx, 0, w - 1)[..., None], axis=2
        )
        g = jnp.where((idx[..., None] < w), g, 0.0)
        g = g.reshape(b, nq, h, ac)
        return jnp.max(g, axis=2)

    ct = jnp.asarray(rng.randn(b, nq, ac), jnp.float32)
    # forward parity first
    f_ref = xla_ref(windows)
    f_new = wc.windowed_max_pool_trainable(local, windows, nq, 8, True)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               rtol=1e-6, atol=1e-6)
    g_ref = jax.grad(lambda w_: jnp.sum(xla_ref(w_) * ct))(windows)
    g_new = jax.grad(
        lambda w_: jnp.sum(
            wc.windowed_max_pool_trainable(local, w_, nq, 8, True) * ct
        )
    )(windows)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_backbone_remat_with_fused_conv_grad():
    """Per-stage remat composes with the fused-conv training route (pool_mode
    is a module field, not a call arg — nn.remat rejects non-array args)."""
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.nn.epn import E2PNBackbone, EPNConfig

    item = SyntheticPairDataset(num_pairs=1, num_points=400, seed=5)[0]
    cfg = pipe.PyramidConfig(
        num_stages=3, voxel_size=0.12, search_radius=0.3,
        neighbor_limits=(8, 8, 8), stage_caps=(256, 96, 64),
        coarse_point_cap=64, window_segments=8,
    )
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    net = E2PNBackbone(
        input_dim=1, output_dim=16, init_dim=8, init_radius=0.3,
        init_sigma=0.24, group_norm=4, config=EPNConfig(), num_stages=3,
        ones_input=True, remat=True,
    )
    params = net.init(jax.random.PRNGKey(0), data["features"], data)

    def loss(p):
        ff, fc = net.apply(p, data["features"], data, fused_conv_grad=True)
        return jnp.sum(ff**2) + jnp.sum(fc**2)

    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(jax.grad(loss)(params))
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_capture_and_min_window_budget():
    """capture_window_map_inputs records raw (neighbors, cap_s) per set and
    min_window_budget finds the smallest lane-aligned budget under the drop
    tolerance — including the full-coverage clamp regime (max_segs >
    source-segment count must not crash; round-5 review finding)."""
    from se3et_tpu.data.datasets import SyntheticPairDataset

    item = SyntheticPairDataset(num_pairs=1, num_points=500, seed=5)[0]
    cfg = pipe.PyramidConfig(
        num_stages=2, voxel_size=0.1, search_radius=0.25,
        neighbor_limits=(10, 10), stage_caps=(384, 160), coarse_point_cap=160,
        window_segments=6,
    )
    store = {}
    with pipe.capture_window_map_inputs(store):
        pipe.build_pair_pyramid(
            item["ref_points"], item["src_points"], item["transform"], cfg
        )
    assert set(store) == {"neighbors_0", "neighbors_1", "subsampling_0"}
    assert all(len(v) == 2 for v in store.values())  # both clouds captured
    # hook is inactive outside the context
    pipe.build_window_maps(store["neighbors_0"][0][0], 384, 4, stats_key="t")
    assert len(store["neighbors_0"]) == 2

    rows = store["neighbors_0"]
    budget, rate_at = pipe.min_window_budget(rows, sseg=16, tol=0.005)
    assert budget is not None and budget % (128 // 16) == 0
    assert rate_at[budget] <= 0.005
    # full coverage (cap_s=384 -> nblk_s=24 at sseg=16) never crashes and
    # reaches zero drops
    b0, r0 = pipe.min_window_budget(rows, sseg=16, tol=0.0)
    assert b0 is not None and r0[b0] == 0.0
    # clamp regime directly: more slots than segments exist
    seg_idx, local = pipe.build_window_maps(rows[0][0], 384, 1000)
    assert seg_idx.shape[1] == 24  # clamped to nblk_s
    assert (local < 24 * 16).all() or (local == seg_idx.shape[1] * 16).any()


def test_seg_gather_take_matches_onehot(monkeypatch):
    """SE3ET_SEG_GATHER=take == the one-hot einsum: forward bit-exact for
    bf16 features and f32 coordinates, gradients equal (the take impl's
    custom VJP is the same one-hot transpose einsum)."""
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(7)
    b, ns, ac, nblk_q, s, sseg = 2, 200, 24, 3, 4, 16
    nblk_s = -(-ns // sseg)
    seg_idx = jnp.asarray(rng.randint(0, nblk_s, size=(b, nblk_q, s)),
                          jnp.int32)

    for x, prec_arg in [
        (jnp.asarray(rng.randn(b, ns, ac).astype(np.float32), jnp.bfloat16),
         None),
        (jnp.asarray(rng.randn(b, ns, ac), jnp.float32),
         jax.lax.Precision.HIGHEST),
    ]:
        monkeypatch.delenv("SE3ET_SEG_GATHER", raising=False)
        ref = wc.segment_window_gather(x, seg_idx, precision=prec_arg,
                                       sseg=sseg)
        g_ref = jax.grad(
            lambda x: jnp.sum(wc.segment_window_gather(
                x, seg_idx, precision=prec_arg, sseg=sseg
            ).astype(jnp.float32) ** 2)
        )(x)
        monkeypatch.setenv("SE3ET_SEG_GATHER", "take")
        got = wc.segment_window_gather(x, seg_idx, precision=prec_arg,
                                       sseg=sseg)
        g_got = jax.grad(
            lambda x: jnp.sum(wc.segment_window_gather(
                x, seg_idx, precision=prec_arg, sseg=sseg
            ).astype(jnp.float32) ** 2)
        )(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_allclose(
            np.asarray(g_got, np.float32), np.asarray(g_ref, np.float32),
            rtol=1e-5, atol=1e-5,
        )

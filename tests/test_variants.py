"""Tests for the EQ-attention global-pooling variants, dual_early alignment,
and the anchor_matching model path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3et_tpu.nn.attention import MultiHeadAttentionEQ, RotCompressOutput


def _inputs(b=1, a=6, n=10, m=12, c=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, a, n, c), jnp.float32)
    k = jnp.asarray(rng.randn(b, a, m, c), jnp.float32)
    v = jnp.asarray(rng.randn(b, a, m, c), jnp.float32)
    km = jnp.asarray(rng.rand(b, m) > 0.2)
    qm = jnp.asarray(rng.rand(b, n) > 0.2)
    return q, k, v, km, qm


@pytest.mark.parametrize("mode", ["r_soft", "r_best"])
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(attn_r_summ="double_norm"),
        dict(attn_on_sub=True),
        dict(attn_r_multihead=True),
        dict(attn_r_summ="double_norm", attn_on_sub=True, attn_r_multihead=True),
    ],
)
def test_variant_modes_run_and_are_finite(mode, kwargs):
    q, k, v, km, qm = _inputs()
    attn = MultiHeadAttentionEQ(16, 2, attn_mode=mode, kanchor=6, **kwargs)
    params = attn.init(jax.random.PRNGKey(0), q, k, v, key_masks=km, q_masks=qm)
    out, aux = attn.apply(params, q, k, v, key_masks=km, q_masks=qm)
    assert out.shape == (1, 6, 10, 16)
    assert np.isfinite(np.asarray(out)).all()
    key = "attn_w" if mode == "r_soft" else "attn_idx"
    assert key in aux
    if mode == "r_soft":
        # rotation weights normalized over R
        np.testing.assert_allclose(np.asarray(aux["attn_w"]).sum(-1), 1.0, atol=1e-4)


def _numpy_reference_rsoft(q, k, v, trace, *, positive="sq", summ="mean",
                           on_sub=False, adj0=None, multihead=False,
                           num_corr=256):
    """Direct numpy transcription of the reference r_soft chain
    (``vanilla_transformer.py:284-300`` local scores / on_sub subset,
    ``:379-454`` head-mean -> positive -> mean/double_norm pooling,
    ``:536-575`` rotation fold + normalize, ``:810-846`` softmax ->
    attn_r-weighted sum over rotations).  q, k, v: (B, A, H, N|M, c)."""
    b, a, h, n, c = q.shape
    m = k.shape[3]
    s_ae = np.einsum("bahnc,behmc->baehnm", q, k) / np.sqrt(c)
    sub = [0, adj0] if on_sub else list(range(a))
    s_sub = s_ae[:, sub]
    g = s_sub if multihead else s_sub.mean(3, keepdims=True)
    assert positive == "sq"
    g = g**2
    if summ == "mean":
        attn_ae = g.mean((-2, -1))  # (B, A', E, H')
    else:  # double_norm (vanilla_transformer.py:432-441)
        ref_n = g / g.sum(-1, keepdims=True)
        src_n = g / g.sum(-2, keepdims=True)
        ms = (ref_n * src_n).reshape(*g.shape[:-2], -1)
        kk = min(num_corr, ms.shape[-1])
        top = np.sort(ms, axis=-1)[..., ::-1][..., :kk]
        attn_ae = top.mean(-1)
    nr = trace.shape[0]
    cols = trace[:, sub]  # (R, A')
    attn_ar = np.stack(
        [attn_ae[:, np.arange(len(sub)), cols[r]] for r in range(nr)], axis=1
    )  # (B, R, A', H')
    attn_r = attn_ar.mean(2)  # (B, R, H')
    attn_r = attn_r / attn_r.sum(1, keepdims=True)
    out = np.zeros((b, a, h, n, c))
    for r in range(nr):
        for ai in range(a):
            e = trace[r, ai]
            s = s_ae[:, ai, e]  # (B, H, N, M)
            sm = np.exp(s - s.max(-1, keepdims=True))
            sm = sm / sm.sum(-1, keepdims=True)
            w = attn_r[:, r]  # (B, H') with H'=H or 1
            out[:, ai] += w[:, :, None, None] * np.einsum(
                "bhnm,bhmc->bhnc", sm, v[:, e]
            )
    # merge heads (B, A, N, H*c)
    return np.moveaxis(out, 2, 3).reshape(b, a, n, h * c)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(attn_r_summ="double_norm"),
        dict(attn_on_sub=True),
        dict(attn_r_multihead=True),
        dict(attn_r_summ="double_norm", attn_on_sub=True,
             attn_r_multihead=True),
    ],
)
def test_rsoft_variants_match_reference_transcription(kwargs):
    """Golden semantics check: every variant switch reproduces the reference
    math on a hand-computable case (full rotation expansion, no masks)."""
    from se3et_tpu.core import anchors as anchor_lib

    b, a, n, m, d, h = 1, 6, 4, 5, 8, 2
    rng = np.random.RandomState(7)
    iq = jnp.asarray(rng.randn(b, a, n, d), jnp.float32)
    ik = jnp.asarray(rng.randn(b, a, m, d), jnp.float32)
    iv = jnp.asarray(rng.randn(b, a, m, d), jnp.float32)
    attn = MultiHeadAttentionEQ(d, h, attn_mode="r_soft", kanchor=6,
                                num_correspondences=9, **kwargs)
    params = attn.init(jax.random.PRNGKey(0), iq, ik, iv)
    got, _ = attn.apply(params, iq, ik, iv)

    p = params["params"]
    def project(x, lin):
        y = np.asarray(x) @ np.asarray(p[lin]["kernel"]) + np.asarray(
            p[lin]["bias"]
        )
        # split heads: (B, A, N, H*c) -> (B, A, H, N, c)
        ch = d // h
        y = y.reshape(*y.shape[:-1], h, ch)
        return np.moveaxis(y, -2, -3)

    space = anchor_lib.get_anchor_space(6, 4)
    want = _numpy_reference_rsoft(
        project(iq, "TorchLinear_0"), project(ik, "TorchLinear_1"),
        project(iv, "TorchLinear_2"), np.asarray(space.trace_idx_ori),
        summ=kwargs.get("attn_r_summ", "mean"),
        on_sub=kwargs.get("attn_on_sub", False),
        adj0=int(space.v_adjs[0, 0]),
        multihead=kwargs.get("attn_r_multihead", False),
        num_corr=9,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_double_norm_differs_from_mean_pooling():
    q, k, v, km, qm = _inputs(seed=3)
    out = {}
    for summ in ("mean", "double_norm"):
        attn = MultiHeadAttentionEQ(16, 2, attn_mode="r_soft", kanchor=6,
                                    attn_r_summ=summ)
        params = attn.init(jax.random.PRNGKey(0), q, k, v, key_masks=km)
        _, aux = attn.apply(params, q, k, v, key_masks=km)
        out[summ] = np.asarray(aux["attn_w"])
    assert not np.allclose(out["mean"], out["double_norm"])


def test_variant_defaults_unchanged():
    """Default settings must reproduce the previous (mean, full-anchor,
    head-averaged) behavior exactly."""
    q, k, v, km, qm = _inputs(seed=5)
    base = MultiHeadAttentionEQ(16, 2, attn_mode="r_soft", kanchor=6)
    explicit = MultiHeadAttentionEQ(
        16, 2, attn_mode="r_soft", kanchor=6,
        attn_r_summ="mean", attn_on_sub=False, attn_r_multihead=False,
    )
    p = base.init(jax.random.PRNGKey(1), q, k, v, key_masks=km)
    o1, _ = base.apply(p, q, k, v, key_masks=km)
    o2, _ = explicit.apply(p, q, k, v, key_masks=km)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dual_early_alignment():
    """dual_early concatenates own + aligned anchors (2A) before compression
    (conditional_transformer.py:186-190)."""
    from se3et_tpu.nn.transformer import RPEConditionalTransformer

    b, a, n, c = 1, 6, 8, 16
    rng = np.random.RandomState(0)
    f0 = jnp.asarray(rng.randn(b, a, n, c), jnp.float32)
    f1 = jnp.asarray(rng.randn(b, a, n, c), jnp.float32)
    emb = jnp.asarray(rng.randn(b, n, n, c), jnp.float32)

    tr = RPEConditionalTransformer(
        blocks=("self_eq", "cross_r_soft", "self", "cross"),
        d_model=c, num_heads=2, na=6, align_mode="dual_early",
    )
    params = tr.init(jax.random.PRNGKey(0), f0, f1, emb, emb)
    out0, out1, *_ = tr.apply(params, f0, f1, emb, emb)
    assert out0.shape == (b, n, c) and out1.shape == (b, n, c)
    assert np.isfinite(np.asarray(out0)).all()
    # the rotcompress expand layer sees 2A*C inputs under dual_early
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    dims = [
        v.shape[0] for path, v in flat
        if "rotcompress" in str(path) and "kernel" in str(path)
    ]
    assert 2 * a * c in dims


def test_rotcompress_dual_shape():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 12, 8, 16), jnp.float32)
    mod = RotCompressOutput(16, na=6, dual_align=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (1, 8, 16)


@pytest.mark.slow
def test_anchor_matching_model_path():
    """anchor_matching: PermutationInvariantLayer output replaces the coarse
    features; rot_sup_matrix emitted (se3eti.kitti/model.py:178,247)."""
    import dataclasses

    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.pipeline import PyramidConfig, build_pair_pyramid
    from se3et_tpu.nn.init_util import jit_init
    from se3et_tpu.nn.model import ModelConfig, SE3ETModel

    pc = PyramidConfig(
        num_stages=2, voxel_size=0.2, search_radius=0.5,
        neighbor_limits=(6, 6), stage_caps=(64, 24), coarse_point_cap=24,
    )
    mc = ModelConfig(
        num_stages=2, init_dim=8, output_dim=16, gt_input_dim=16,
        gt_hidden_dim=16, gt_output_dim=16, num_heads=2,
        blocks=("self_eq", "cross"), init_radius=0.5, init_sigma=0.4,
        group_norm=4, num_points_in_patch=4, num_sinkhorn_iterations=3,
        num_targets=4, num_correspondences=6, gt_candidates=4,
        correspondence_limit=16, anchor_matching=True,
    )
    item = SyntheticPairDataset(num_pairs=1, num_points=120, seed=0)[0]
    data = build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], pc
    )
    data = {k: jnp.asarray(v) for k, v in data.items()}
    model = SE3ETModel(mc)
    rngs = {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)}
    params = jit_init(model, rngs, data, train=False, with_registration=False)
    out = jax.jit(
        lambda p, d: model.apply(p, d, train=False, with_registration=False)
    )(params, data)
    assert out["ref_feats_m"].shape[1] == 6  # (B, A, N, C)
    assert out["rot_sup_matrix"].shape == (6, 6)
    assert np.isfinite(np.asarray(out["ref_feats_c"])).all()
    # permutation_invariant params exist
    assert any("permutation_invariant" in str(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(params)[0])


def test_ones_input_conv_collapse():
    """ones_input=True must equal the gather path on all-ones features."""
    from se3et_tpu.nn.epn import EPNConfig, KPConvInterSO3

    rng = np.random.RandomState(0)
    b, n, h, a, cin = 1, 40, 8, 6, 1
    pts = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    nbr = jnp.asarray(rng.randint(0, n + 1, size=(b, n, h)), jnp.int32)
    x = jnp.ones((b, n, a, cin), jnp.float32)
    conv = KPConvInterSO3(cin, 16, radius=1.0, sigma=0.8, config=EPNConfig())
    params = conv.init(jax.random.PRNGKey(0), x, pts, pts, nbr)
    out_gather = conv.apply(params, x, pts, pts, nbr, ones_input=False)
    out_ones = conv.apply(params, x, pts, pts, nbr, ones_input=True)
    np.testing.assert_allclose(
        np.asarray(out_gather), np.asarray(out_ones), atol=1e-5
    )

"""Equivariance and correctness tests for the attention stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3et_tpu.nn import attention as A


@pytest.mark.parametrize("mode", [None, "a_soft", "a_best", "r_soft", "r_best"])
def test_eq_cross_attention_permutation_covariance(mode):
    """When both clouds rotate by the same group element g (features permute by
    trace_idx_rot[g]), EQ cross-attention output permutes identically."""
    rng = np.random.RandomState(0)
    b, a, n, m, c = 1, 6, 10, 12, 16
    attn = A.MultiHeadAttentionEQ(
        d_model=c, num_heads=2, attn_mode=mode, kanchor=a, attn_r_positive="sq"
    )
    q = jnp.asarray(rng.normal(size=(b, a, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), q, k, v)
    out, _ = attn.apply(params, q, k, v)
    out = np.asarray(out)

    space = attn.space
    for g in [1, 9, 17]:
        perm = space.trace_idx_rot[g]
        out_r, _ = attn.apply(params, q[:, perm], k[:, perm], v[:, perm])
        np.testing.assert_allclose(
            np.asarray(out_r), out[:, perm], rtol=1e-3, atol=1e-4,
            err_msg=f"mode={mode} g={g}",
        )


def test_eq_attention_masking():
    """Padded keys must not influence outputs."""
    rng = np.random.RandomState(1)
    b, a, n, m, c = 1, 6, 8, 10, 16
    attn = A.MultiHeadAttentionEQ(
        d_model=c, num_heads=2, attn_mode="a_soft", kanchor=a
    )
    q = jnp.asarray(rng.normal(size=(b, a, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    key_masks = jnp.asarray(np.array([[1] * 7 + [0] * 3], bool))
    q_masks = jnp.asarray(np.ones((b, n), bool))
    params = attn.init(jax.random.PRNGKey(0), q, k, v, key_masks, q_masks)
    out1, _ = attn.apply(params, q, k, v, key_masks, q_masks)
    # perturb masked keys/values: output must not change
    k2 = k.at[:, :, 7:].add(100.0)
    v2 = v.at[:, :, 7:].add(100.0)
    out2, _ = attn.apply(params, q, k2, v2, key_masks, q_masks)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_rpe_attention_folded_projection_equivalence():
    """The folded positional projection equals the direct (q . (emb W + b))."""
    rng = np.random.RandomState(2)
    b, n, c = 1, 12, 16
    attn = A.RPEMultiHeadAttention(d_model=c, num_heads=2)
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(b, n, n, c)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x, x, x, emb)
    out, aux = attn.apply(params, x, x, x, emb)

    # direct computation
    p = params["params"]
    import numpy as onp

    def lin(name, inp):
        return inp @ onp.asarray(p[name]["kernel"]) + onp.asarray(p[name]["bias"])

    q = lin("TorchLinear_0", onp.asarray(x))
    k = lin("TorchLinear_1", onp.asarray(x))
    v = lin("TorchLinear_2", onp.asarray(x))
    wp = onp.asarray(p["proj_p_kernel"])
    bp = onp.asarray(p["proj_p_bias"])
    pe = onp.asarray(emb) @ wp + bp  # (b, n, n, c)
    h, dh = 2, c // 2
    qh = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    ph = pe.reshape(b, n, n, h, dh).transpose(0, 3, 1, 2, 4)
    s = (
        onp.einsum("bhnc,bhmc->bhnm", qh, kh)
        + onp.einsum("bhnc,bhnmc->bhnm", qh, ph)
    ) / onp.sqrt(dh)
    sm = onp.exp(s - s.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    expect = onp.einsum("bhnm,bhmc->bhnc", sm, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-3, atol=1e-4)


def test_eq2inv_normal_path():
    """Conditional transformer with normals: eq2inv uses normal-guided pooling."""
    import jax
    from se3et_tpu.nn.transformer import RPEConditionalTransformer

    rng = np.random.RandomState(5)
    b, a, n, c = 1, 6, 12, 16
    tr = RPEConditionalTransformer(
        blocks=("self_eq", "cross"), d_model=c, num_heads=2, na=a
    )
    feats = jnp.asarray(rng.normal(size=(b, a, n, c)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(b, n, n, c)).astype(np.float32))
    masks = jnp.asarray(np.ones((b, n), bool))
    normals = rng.normal(size=(b, n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.asarray(normals)
    params = tr.init(jax.random.PRNGKey(0), feats, feats, emb, emb, masks, masks,
                     ref_normal=normals, src_normal=normals)
    out = tr.apply(params, feats, feats, emb, emb, masks, masks,
                   ref_normal=normals, src_normal=normals)
    f0 = np.asarray(out[0])
    assert f0.shape == (b, n, c) and np.isfinite(f0).all()
    # without normals the pooled features differ (max-pool path)
    out2 = tr.apply(params, feats, feats, emb, emb, masks, masks)
    assert np.abs(f0 - np.asarray(out2[0])).max() > 1e-5


def test_r_soft_collapse_equals_rotation_expansion():
    """The collapsed r_soft (effective W[a,e]) must equal the brute-force
    rotation-expanded computation of the reference
    (``vanilla_transformer.py:506-577, 839-845``)."""
    rng = np.random.RandomState(9)
    b, a, h, n, m, c = 1, 6, 2, 10, 12, 16
    attn = A.MultiHeadAttentionEQ(
        d_model=c, num_heads=h, attn_mode="r_soft", kanchor=a, attn_r_positive="sq"
    )
    q = jnp.asarray(rng.normal(size=(b, a, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), q, k, v)
    out, aux = attn.apply(params, q, k, v)

    # brute force with the same projections
    p = params["params"]

    def lin(i, x):
        w = np.asarray(p[f"TorchLinear_{i}"]["kernel"])
        bs = np.asarray(p[f"TorchLinear_{i}"]["bias"])
        return np.asarray(x) @ w + bs

    dh = c // h
    def heads(x):
        return x.reshape(b, a, -1, h, dh).transpose(0, 1, 3, 2, 4)

    qh, kh, vh = heads(lin(0, q)), heads(lin(1, k)), heads(lin(2, v))
    s_ae = np.einsum("bahnc,behmc->baehnm", qh, kh) / np.sqrt(dh)
    g = np.mean(s_ae, axis=3) ** 2  # wait: mean over h then square? order matters
    g = np.mean(s_ae, axis=3)
    g = g ** 2
    attn_ae = g.mean(axis=(-2, -1))
    sp = attn.space
    trace = sp.trace_idx_ori
    attn_r = np.stack([
        np.mean([attn_ae[0, aa, trace[r, aa]] for aa in range(a)])
        for r in range(trace.shape[0])
    ])
    attn_r = attn_r / attn_r.sum()
    sm = np.exp(s_ae - s_ae.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    hidden = np.zeros((b, a, h, n, dh), np.float32)
    for r in range(trace.shape[0]):
        for aa in range(a):
            e = trace[r, aa]
            hidden[0, aa] += attn_r[r] * np.einsum(
                "hnm,hmc->hnc", sm[0, aa, e], vh[0, e]
            )
    want = hidden.transpose(0, 1, 3, 2, 4).reshape(b, a, n, c)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("mode,sup", [
    ("a_soft", False), ("r_soft", False), ("r_soft", True),
    ("a_best", False), ("r_best", False), ("r_best", True),
])
def test_flash_eq_attention_matches_xla_path(mode, sup):
    """The Pallas flash route (stats + apply kernels, interpret mode on CPU)
    reproduces the XLA formulation: outputs, pooled weights, and the
    rotation-supervision matrix."""
    rng = np.random.RandomState(3)
    b, a, n, m, c = 1, 6, 24, 28, 16
    attn = A.MultiHeadAttentionEQ(
        d_model=c, num_heads=2, attn_mode=mode, kanchor=a,
        with_rot_supervision=sup,
    )
    q = jnp.asarray(rng.normal(size=(b, a, n, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, a, m, c)).astype(np.float32))
    key_masks = jnp.asarray((np.arange(m) < m - 5)[None])
    q_masks = jnp.asarray((np.arange(n) < n - 3)[None])
    params = attn.init(jax.random.PRNGKey(0), q, k, v, key_masks, q_masks)

    out_ref, aux_ref = attn.apply(params, q, k, v, key_masks, q_masks)
    out_fl, aux_fl = attn.apply(
        params, q, k, v, key_masks, q_masks, use_flash=True
    )
    # padded query rows carry garbage on both paths; compare valid rows
    vr = np.asarray(q_masks[0])
    np.testing.assert_allclose(
        np.asarray(out_fl)[:, :, vr], np.asarray(out_ref)[:, :, vr],
        rtol=2e-4, atol=2e-5,
    )
    if "attn_w" in aux_ref:
        np.testing.assert_allclose(
            np.asarray(aux_fl["attn_w"]), np.asarray(aux_ref["attn_w"]),
            rtol=1e-4, atol=1e-6,
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(aux_fl["attn_idx"]), np.asarray(aux_ref["attn_idx"])
        )
    if sup:
        np.testing.assert_allclose(
            np.asarray(aux_fl["attn_matrix"]),
            np.asarray(aux_ref["attn_matrix"]), rtol=1e-4, atol=1e-6,
        )


@pytest.mark.parametrize("equivariant", [False, True])
def test_flash_rpe_self_attention_matches_xla(equivariant):
    """The flash RPE self-attention route (folded queries, in-kernel degree-1
    SH, online softmax; interpret mode on CPU) == the XLA formulation.

    Row-constant terms (projection biases, degree-0 SH) are dropped by the
    kernel via softmax shift invariance — equality here proves that identity.
    """
    from se3et_tpu.nn.embedding import GeometricStructureEmbedding

    rng = np.random.RandomState(7)
    b, n, c, a, h = 1, 128, 16, 6, 2
    kanchor = a if equivariant else 0
    emb_mod = GeometricStructureEmbedding(
        hidden_dim=c, sigma_d=0.2, sigma_a=15.0, angle_k=3,
        kanchor=a if equivariant else 1, n_level_equiv=2 if equivariant else 0,
    )
    points = jnp.asarray(rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32))
    masks = jnp.asarray(np.arange(n) < n - 9)[None]
    ep = emb_mod.init(jax.random.PRNGKey(0), points, masks)
    emb, eq_emb = emb_mod.apply(ep, points, masks)

    attn = A.RPEMultiHeadAttention(
        d_model=c, num_heads=h, equivariant=equivariant,
        d_equiv_embed=4 if equivariant else 0, kanchor=kanchor,
    )
    shape = (b, a, n, c) if equivariant else (b, n, c)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(1), x, x, x, emb, key_masks=masks,
                       embed_eq=eq_emb)
    ref, _ = attn.apply(params, x, x, x, emb, key_masks=masks,
                        embed_eq=eq_emb)
    got, _ = attn.apply(params, x, x, x, emb, key_masks=masks, points=points,
                        use_flash=True)
    ref, got = np.asarray(ref), np.asarray(got)
    valid = np.asarray(masks)[0]
    np.testing.assert_allclose(
        got[..., valid, :], ref[..., valid, :], rtol=2e-3, atol=2e-4
    )


def test_transformer_flash_self_matches_xla():
    """GeometricTransformer with fused_attention (stacked flash self layers)
    == the XLA path, at a 128-divisible coarse size (SE3ET-E blocks)."""
    from se3et_tpu.nn.transformer import GeometricTransformer

    rng = np.random.RandomState(11)
    b, n, cin, c, a = 1, 128, 24, 16, 6
    model = GeometricTransformer(
        input_dim=cin, output_dim=c, hidden_dim=c, num_heads=2,
        blocks=("self_eq", "cross_a_soft", "self_eq", "cross_r_soft",
                "self", "cross"),
        sigma_d=0.2, sigma_a=15.0, angle_k=3, na=a, n_level_equiv=2,
    )
    ref_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    src_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    ref_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    ref_masks = jnp.asarray(np.arange(n) < n - 5)[None]
    src_masks = jnp.asarray(np.arange(n) < n - 9)[None]
    params = model.init(
        jax.random.PRNGKey(0), ref_points, src_points, ref_feats, src_feats,
        ref_masks, src_masks,
    )
    out_ref = model.apply(params, ref_points, src_points, ref_feats,
                          src_feats, ref_masks, src_masks)
    out_new = model.apply(params, ref_points, src_points, ref_feats,
                          src_feats, ref_masks, src_masks,
                          fused_attention=True)
    for i in (0, 1):
        r = np.asarray(out_ref[i])
        g = np.asarray(out_new[i])
        valid = np.asarray(ref_masks if i == 0 else src_masks)[0]
        scale = np.abs(r).max() + 1e-9
        np.testing.assert_allclose(
            g[:, valid], r[:, valid], atol=5e-3 * scale,
            err_msg=f"output {i}",
        )


def test_transformer_flash_self_grads_match_xla():
    """Param grads through the flash RPE self layers (custom VJP) == the XLA
    path — the training route (train_fused_attention)."""
    from jax.flatten_util import ravel_pytree

    from se3et_tpu.nn.transformer import GeometricTransformer

    rng = np.random.RandomState(13)
    b, n, cin, c, a = 1, 128, 24, 16, 6
    model = GeometricTransformer(
        input_dim=cin, output_dim=c, hidden_dim=c, num_heads=2,
        blocks=("self_eq", "cross_a_soft", "self_eq", "cross_r_soft",
                "self", "cross"),
        sigma_d=0.2, sigma_a=15.0, angle_k=3, na=a, n_level_equiv=2,
    )
    ref_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    src_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    ref_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    ref_masks = jnp.asarray(np.arange(n) < n - 5)[None]
    src_masks = jnp.asarray(np.arange(n) < n - 9)[None]
    params = model.init(
        jax.random.PRNGKey(0), ref_points, src_points, ref_feats, src_feats,
        ref_masks, src_masks,
    )

    def loss(p, **kw):
        o0, o1, *_ = model.apply(p, ref_points, src_points, ref_feats,
                                 src_feats, ref_masks, src_masks, **kw)
        vm0 = ref_masks[..., None]
        vm1 = src_masks[..., None]
        return jnp.sum((o0 * vm0) ** 2) + jnp.sum((o1 * vm1) ** 2)

    g_ref = jax.grad(loss)(params)
    g_new = jax.grad(lambda p: loss(p, fused_attention=True,
                                    fused_attention_cross=False))(params)
    flat_r, _ = ravel_pytree(g_ref)
    flat_n, _ = ravel_pytree(g_new)
    scale = float(jnp.max(jnp.abs(flat_r))) + 1e-9
    np.testing.assert_allclose(np.asarray(flat_n), np.asarray(flat_r),
                               rtol=5e-3, atol=2e-3 * scale)


def test_conditional_transformer_alternates():
    """Vanilla/PE/LRPE conditional transformers (reference
    ``conditional_transformer.py:33-95,393-441``): shapes, finiteness,
    mask handling, and cross-block weight sharing between clouds."""
    from se3et_tpu.nn.transformer import (
        LRPEConditionalTransformer,
        PEConditionalTransformer,
        VanillaConditionalTransformer,
    )

    rng = np.random.RandomState(0)
    b, n, m, c = 2, 24, 20, 32
    f0 = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    f1 = jnp.asarray(rng.randn(b, m, c), jnp.float32)
    m0 = jnp.asarray(np.arange(n)[None, :] < np.array([[n], [n - 4]]))
    m1 = jnp.asarray(np.arange(m)[None, :] < np.array([[m - 2], [m]]))
    blocks = ("self", "cross", "self", "cross")

    v = VanillaConditionalTransformer(blocks, c, 4, return_attention_scores=True)
    params = v.init(jax.random.PRNGKey(0), f0, f1, m0, m1)
    o0, o1, scores = v.apply(params, f0, f1, m0, m1)
    assert o0.shape == (b, n, c) and o1.shape == (b, m, c)
    assert len(scores) == len(blocks)
    assert np.isfinite(np.asarray(o0)).all() and np.isfinite(np.asarray(o1)).all()
    # masked keys receive zero attention
    s_cross0 = np.asarray(scores[1][0])  # feats0 attending feats1 keys
    assert s_cross0[0, :, :, m - 2:].max() < 1e-6

    e0 = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    e1 = jnp.asarray(rng.randn(b, m, c), jnp.float32)
    pe = PEConditionalTransformer(blocks, c, 4)
    params = pe.init(jax.random.PRNGKey(1), f0, f1, e0, e1, m0, m1)
    o0, o1 = pe.apply(params, f0, f1, e0, e1, m0, m1)
    assert o0.shape == (b, n, c) and np.isfinite(np.asarray(o0)).all()
    # the PE projection is shared between q and k within a self layer
    flat = jax.tree_util.tree_leaves_with_path(params)
    pp = [p for p, _ in flat if any("proj_p" in str(k) for k in p)]
    assert pp, "shared proj_p parameter missing"

    idx0 = jnp.asarray(rng.randint(0, 10, (b, n, n)), jnp.int32)
    idx1 = jnp.asarray(rng.randint(0, 10, (b, m, m)), jnp.int32)
    lr = LRPEConditionalTransformer(blocks, c, 4, num_embeddings=10)
    params = lr.init(jax.random.PRNGKey(2), f0, f1, idx0, idx1, m0, m1)
    o0, o1 = lr.apply(params, f0, f1, idx0, idx1, m0, m1)
    assert o0.shape == (b, n, c) and np.isfinite(np.asarray(o0)).all()


def test_flash_femb_matches_materialized_emb():
    """The fused-embedding flash kernel (embedding recomputed IN-KERNEL from
    raw coordinates; interpret mode) == the flash kernel over the
    materialized Chebyshev bf16 embedding.  Dropped projection biases are
    softmax no-ops; the distance comes from the r^2 matmul expansion and the
    angles from the coefficient-row matmuls, so agreement here validates the
    whole geometry folding chain."""
    from se3et_tpu.ops.pallas import rpe_attention as fr
    from se3et_tpu.ops.pallas.embedding import geometric_embedding_pallas

    rng = np.random.RandomState(11)
    b, ah, n, c, cc, ka = 1, 6, 128, 16, 64, 3
    sigma_d, sigma_a = 0.2, 15.0

    pts = rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32)
    # angle_k nearest neighbors, self excluded (embedding-module semantics)
    d2 = ((pts[:, :, None, :] - pts[:, None, :, :]) ** 2).sum(-1)
    knn_idx = np.argsort(d2, axis=2)[:, :, 1:ka + 1]
    knn_pts = np.take_along_axis(
        pts[:, :, None, :], knn_idx[..., None], axis=1
    )
    wd = (rng.normal(size=(cc, cc)) * 0.1).astype(np.float32)
    bd = (rng.normal(size=(cc,)) * 0.1).astype(np.float32)
    wa = (rng.normal(size=(cc, cc)) * 0.1).astype(np.float32)
    ba = (rng.normal(size=(cc,)) * 0.1).astype(np.float32)

    emb = geometric_embedding_pallas(
        jnp.asarray(pts), jnp.asarray(knn_pts), jnp.asarray(wd),
        jnp.asarray(bd), jnp.asarray(wa), jnp.asarray(ba),
        sigma_d=sigma_d, sigma_a=sigma_a, interpret=True,
    )

    q = jnp.asarray(rng.normal(size=(b, ah, n, c)).astype(np.float32))
    qp = jnp.asarray((rng.normal(size=(b, n, ah, cc)) * 0.3)
                     .astype(np.float32))
    km = jnp.asarray(np.arange(n) < n - 7)[None]
    qw = jnp.asarray((rng.normal(size=(b, 3, ah, n)) * 0.3)
                     .astype(np.float32))
    p4 = jnp.asarray(
        np.concatenate([pts, np.zeros((b, n, 1), np.float32)], -1)
        .swapaxes(1, 2)
    )

    ref = fr.rpe_self_attention(
        q, q, q, qp, emb, km, qw, p4, scale=0.25, block_n=16, block_m=128,
        interpret=True,
    )
    got = fr.rpe_self_attention_femb(
        q, q, q, qp, km, qw, p4, jnp.asarray(knn_pts), jnp.asarray(wd),
        jnp.asarray(wa), scale=0.25, sigma_d=sigma_d, sigma_a=sigma_a,
        interpret=True,
    )
    ref, got = np.asarray(ref), np.asarray(got)
    valid = np.asarray(km)[0]
    np.testing.assert_allclose(
        got[..., valid, :], ref[..., valid, :], rtol=3e-3, atol=3e-3
    )


def test_transformer_femb_matches_flash():
    """GeometricTransformer with fused_femb (embedding recomputed inside the
    flash self layers; no (B, N, M, C) tensor) == the flash path over the
    materialized embedding, to embedding-quantization tolerance."""
    from se3et_tpu.nn.transformer import GeometricTransformer

    rng = np.random.RandomState(13)
    b, n, cin, c, a = 1, 128, 24, 16, 6
    model = GeometricTransformer(
        input_dim=cin, output_dim=c, hidden_dim=c, num_heads=2,
        blocks=("self_eq", "cross_a_soft", "self_eq", "cross_r_soft",
                "self", "cross"),
        sigma_d=0.2, sigma_a=15.0, angle_k=3, na=a, n_level_equiv=2,
    )
    ref_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    src_points = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    ref_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    src_feats = jnp.asarray(rng.randn(b, n, a, cin).astype(np.float32))
    ref_masks = jnp.asarray(np.arange(n) < n - 5)[None]
    src_masks = jnp.asarray(np.arange(n) < n - 9)[None]
    params = model.init(
        jax.random.PRNGKey(0), ref_points, src_points, ref_feats, src_feats,
        ref_masks, src_masks,
    )
    out_ref = model.apply(params, ref_points, src_points, ref_feats,
                          src_feats, ref_masks, src_masks,
                          fused_attention=True, fused_embedding=True)
    out_new = model.apply(params, ref_points, src_points, ref_feats,
                          src_feats, ref_masks, src_masks,
                          fused_attention=True, fused_femb=True)
    for i in (0, 1):
        r = np.asarray(out_ref[i])
        g = np.asarray(out_new[i])
        valid = np.asarray(ref_masks if i == 0 else src_masks)[0]
        scale = np.abs(r).max() + 1e-9
        np.testing.assert_allclose(
            g[:, valid], r[:, valid], atol=1e-2 * scale,
            err_msg=f"output {i}",
        )

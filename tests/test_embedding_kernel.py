"""Fused (Chebyshev) geometric-embedding kernel vs the exact XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu import precision as prec
from se3et_tpu.nn.embedding import GeometricStructureEmbedding


def test_fused_embedding_matches_xla():
    rng = np.random.RandomState(2)
    n, c = 64, 64
    pts = jnp.asarray(rng.uniform(0, 2.0, size=(1, n, 3)), jnp.float32)
    masks = jnp.asarray((np.arange(n) < n - 5)[None, :])
    mod = GeometricStructureEmbedding(c, 0.2, 15.0, 3, kanchor=1)
    params = mod.init(jax.random.PRNGKey(0), pts, masks)
    want = np.asarray(mod.apply(params, pts, masks, fused=False)[0], np.float32)
    got = np.asarray(mod.apply(params, pts, masks, fused=True)[0], np.float32)
    # Chebyshev fit error (<1e-3 over the index range) + bf16 kernel output
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-2 * scale, rtol=0)


def test_chebyshev_table_accuracy():
    from se3et_tpu.ops.pallas.embedding import chebyshev_sinusoid_table

    c, x_max = 64, 48.0
    a = chebyshev_sinusoid_table(c, x_max)
    div = np.exp(np.arange(0, c, 2) * (-np.log(10000.0) / c))
    x = np.linspace(0, x_max, 701)
    theta = np.arccos(2 * x / x_max - 1)
    want = np.concatenate(
        [np.sin(x[:, None] * div[None]), np.cos(x[:, None] * div[None])], 1
    )
    got = np.cos(theta[:, None] * np.arange(a.shape[0])[None, :]) @ a
    assert np.abs(got - want).max() < 2e-4


def test_chunked_embedding_matches_unchunked():
    """The train-path row-chunked embedding (lax.map + per-block checkpoint,
    n >= 256) equals the one-shot formulation bit-for-bit up to fp32 noise."""
    from se3et_tpu.ops import geometry

    rng = np.random.RandomState(0)
    b, n, c, k = 2, 256, 32, 3
    pts = jnp.asarray(rng.uniform(-1, 1, size=(b, n, 3)), jnp.float32)
    masks = jnp.asarray(np.ones((b, n), bool))
    mod = GeometricStructureEmbedding(c, 0.2, 15.0, k, kanchor=1)
    params = mod.init(jax.random.PRNGKey(0), pts, masks)
    got = np.asarray(mod.apply(params, pts, masks)[0])  # n=256 -> chunked

    p = params["params"]
    sq = geometry.pairwise_distance(pts, pts)
    dist = jnp.sqrt(sq)
    _, knn = jax.lax.top_k(-sq, k + 1)
    knn_pts = jnp.take_along_axis(
        pts, knn[:, :, 1:].reshape(b, n * k, 1), axis=1
    ).reshape(b, n, k, 3)
    ref_v = knn_pts - pts[:, :, None, :]
    anc = pts[:, None, :, :] - pts[:, :, None, :]
    cross = jnp.cross(ref_v[:, :, None], anc[:, :, :, None])
    ang = jnp.arctan2(
        jnp.linalg.norm(cross, axis=-1),
        (ref_v[:, :, None] * anc[:, :, :, None]).sum(-1),
    ) * (180.0 / (15.0 * np.pi))
    div = jnp.exp(jnp.arange(0, c, 2) * (-np.log(10000.0) / c))

    def sinu(idx):
        a = idx[..., None] * div
        return jnp.concatenate([jnp.sin(a), jnp.cos(a)], -1)

    want = (
        sinu(dist / 0.2) @ p["proj_d_kernel"] + p["proj_d_bias"]
        + (sinu(ang) @ p["proj_a_kernel"] + p["proj_a_bias"]).max(3)
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)


def test_embedding_trainable_grads_match_xla():
    """geometric_embedding_trainable's custom VJP == autodiff of the XLA
    module path, up to the kernel's forward tolerance class (bf16 output +
    <1e-5 Chebyshev fit; wa additionally sees argmax near-tie routing)."""
    import jax.numpy as jnp
    from se3et_tpu.nn.embedding import GeometricStructureEmbedding
    from se3et_tpu.ops.pallas.embedding import geometric_embedding_trainable
    from se3et_tpu.ops import geometry

    rng = np.random.RandomState(2)
    b, n, c, k = 1, 64, 32, 3
    emb_mod = GeometricStructureEmbedding(
        hidden_dim=c, sigma_d=0.2, sigma_a=15.0, angle_k=k
    )
    points = jnp.asarray(rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32))
    params = emb_mod.init(jax.random.PRNGKey(0), points)
    p = params["params"]
    wd, bd, wa, ba = (
        jnp.asarray(p[key])
        for key in ("proj_d_kernel", "proj_d_bias", "proj_a_kernel",
                    "proj_a_bias")
    )
    sq = geometry.pairwise_distance(points, points)
    _, knn_idx = jax.lax.top_k(-sq, k + 1)
    knn_idx = knn_idx[:, :, 1:]
    knn_points = jnp.take_along_axis(
        points, knn_idx.reshape(b, n * k, 1), axis=1
    ).reshape(b, n, k, 3)
    ct = jnp.asarray(rng.randn(b, n, n, c), jnp.float32)

    def loss_xla(wd, bd, wa, ba):
        pp = {"params": {"proj_d_kernel": wd, "proj_d_bias": bd,
                         "proj_a_kernel": wa, "proj_a_bias": ba}}
        emb, _ = emb_mod.apply(pp, points)
        return jnp.sum(emb * ct)

    def loss_ker(wd, bd, wa, ba):
        emb = geometric_embedding_trainable(
            points, knn_points, wd, bd, wa, ba, 0.2, 15.0, 48.0, True
        )
        return jnp.sum(emb.astype(jnp.float32) * ct)

    g_xla = jax.grad(loss_xla, (0, 1, 2, 3))(wd, bd, wa, ba)
    g_ker = jax.grad(loss_ker, (0, 1, 2, 3))(wd, bd, wa, ba)
    tols = {"wd": 5e-3, "bd": 5e-3, "wa": 6e-2, "ba": 5e-3}
    for name, a, bb in zip(("wd", "bd", "wa", "ba"), g_xla, g_ker):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        err = float(jnp.max(jnp.abs(a - bb))) / scale
        assert err < tols[name], (name, err)

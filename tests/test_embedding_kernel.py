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

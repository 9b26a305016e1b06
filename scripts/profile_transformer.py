"""Per-layer timing of the coarse transformer at production 3DMatch shapes.

Times the geometric embedding and one instance of each block type the
SE3ET-E schedule uses (self_eq, cross_a_soft, cross_r_soft, self, cross),
each jitted separately.  N = coarse cap (1024), d_model 256, heads 4, A 6.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=50)
    parser.add_argument("--n", type=int, default=1024)
    parser.add_argument("--d", type=int, default=256)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--a", type=int, default=6)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from se3et_tpu import precision as prec
    from se3et_tpu.nn.attention import RPETransformerLayer, TransformerLayer
    from se3et_tpu.nn.embedding import GeometricStructureEmbedding

    prec.set_compute_dtype("bfloat16")

    n, d, h, a = args.n, args.d, args.heads, args.a
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(0, 3, size=(2, n, 3)), jnp.float32)
    masks = jnp.asarray(np.arange(n)[None, :] < n - 24).repeat(2, 0)
    feats_eq = jnp.asarray(rng.randn(1, a, n, d), jnp.float32)
    feats_inv = jnp.asarray(rng.randn(1, n, d), jnp.float32)

    def bench(name, fn, *inputs):
        red = jax.jit(
            lambda *x: jnp.sum(
                jax.tree_util.tree_leaves(fn(*x))[0].astype(jnp.float32)
            )
        )
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(args.reps):
            out = red(*inputs)
        np.asarray(out)
        ms = (time.time() - t0) / args.reps * 1000.0
        print(f"{name:40s} {ms:8.2f} ms")

    # --- geometric embedding (fused pallas path, both clouds batched) ---
    embedding = GeometricStructureEmbedding(d, 0.2, 15.0, 3, kanchor=a)
    e_params = jax.jit(lambda: embedding.init(jax.random.PRNGKey(0), pts, masks, fused=True))()
    bench(
        "embedding fused (2 clouds)",
        lambda p, m: embedding.apply(e_params, p, m, fused=True)[0], pts, masks,
    )
    # stays on device: a host round-trip of the (1, N, N, 256) tensor both
    # OOMs the chip (fp32 copy) and crawls over the ~100 MB/s relay
    emb = jax.jit(
        lambda p, m: embedding.apply(e_params, p, m, fused=True)[0][:1].astype(
            jnp.float32
        )
    )(pts, masks)

    # --- self_eq: RPE self-attention over (1, A, N, d) ---
    self_eq = RPETransformerLayer(d, h, equivariant=True)
    p_self_eq = jax.jit(lambda: self_eq.init(
        jax.random.PRNGKey(1), feats_eq, feats_eq, emb, masks[:1]
    ))()
    bench(
        "self_eq (RPE, equivariant)",
        lambda f, e, m: self_eq.apply(p_self_eq, f, f, e, m)[0],
        feats_eq, emb, masks[:1],
    )

    # --- plain self: RPE invariant ---
    self_inv = RPETransformerLayer(d, h, equivariant=False)
    p_self = jax.jit(lambda: self_inv.init(
        jax.random.PRNGKey(2), feats_inv, feats_inv, emb, masks[:1]
    ))()
    bench(
        "self (RPE, invariant)",
        lambda f, e, m: self_inv.apply(p_self, f, f, e, m)[0],
        feats_inv, emb, masks[:1],
    )

    # --- EQ cross blocks (XLA path and, for a/r_soft, the flash kernels) ---
    for mode in ("a_soft", "r_soft", "a_best", "r_best"):
        layer = TransformerLayer(d, h, equivariant=True, attn_mode=mode, kanchor=a)
        p_l = jax.jit(lambda layer=layer: layer.init(
            jax.random.PRNGKey(3), feats_eq, feats_eq, None, masks[:1], masks[:1]
        ))()
        bench(
            f"cross_{mode} (EQ)",
            lambda f, m, layer=layer, p_l=p_l: layer.apply(
                p_l, f, f, None, m, m
            )[0],
            feats_eq, masks[:1],
        )
        if mode in ("a_soft", "r_soft"):
            bench(
                f"cross_{mode} (EQ, flash)",
                lambda f, m, layer=layer, p_l=p_l: layer.apply(
                    p_l, f, f, None, m, m, use_flash=True
                )[0],
                feats_eq, masks[:1],
            )

    # --- plain cross (invariant) ---
    cross = TransformerLayer(d, h, equivariant=False)
    p_c = jax.jit(lambda: cross.init(jax.random.PRNGKey(4), feats_inv, feats_inv, None, masks[:1]))()
    bench(
        "cross (invariant)",
        lambda f, m: cross.apply(p_c, f, f, None, m)[0], feats_inv, masks[:1],
    )

    # --- cross with equivariant values (eq<->inv transition blocks) ---
    cross_eqv = TransformerLayer(d, h, equivariant=False)
    p_ce = jax.jit(lambda: cross_eqv.init(
        jax.random.PRNGKey(5), feats_inv, feats_inv, feats_eq, masks[:1]
    ))()
    bench(
        "cross (inv q/k, eq values)",
        lambda f, fe, m: cross_eqv.apply(p_ce, f, f, fe, m)[0],
        feats_inv, feats_eq, masks[:1],
    )


if __name__ == "__main__":
    main()

"""Sixth-level: is the crash '3 live MXU dots combined elementwise'?

Variants:
  s_mul_dpv   — raw s * dpv (no exp/inv): minimal 3-dot elementwise combine
  content_dpv — p from the content dot ONLY (2 live dots) * (dpv - dd)
  no_exp      — (s - mx)*inv * (dpv - dd): 3 dots, no exp
  dpv_input   — dpv PRECOMPUTED outside the kernel, passed as an input
                block; full ds chain (the actionable workaround)

Usage: python scripts/bisect_rpe_bwd6.py [variant ...]
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(names):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from se3et_tpu.ops.pallas import rpe_attention as fr

    cache_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    rng = np.random.RandomState(0)

    b, ah, n, c, cc = 1, 24, 1024, 64, 256
    block_n, block_m = 64, 128
    nb, mb = n // block_n, n // block_m
    scale = 0.125

    q = jnp.asarray(rng.randn(b, ah, n, c), jnp.bfloat16)
    qp = jnp.asarray(rng.randn(b, n, ah, cc), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(b, n, n, cc), jnp.bfloat16)
    km = jnp.asarray((np.arange(n) < 1000).astype(np.float32))[None, None]
    qw = jnp.asarray(rng.randn(b, 3, ah, n), jnp.float32)
    pts = jnp.asarray(rng.randn(b, 4, n), jnp.float32)
    do = jnp.asarray(rng.randn(b, ah, n, c), jnp.float32)
    mx = jnp.asarray(rng.rand(b, ah, n) + 1.0, jnp.float32)
    sm = jnp.asarray(rng.rand(b, ah, n) + 1.0, jnp.float32)
    dd = jnp.asarray(rng.randn(b, ah, n), jnp.float32)

    qw8_b, gn_b, gm = fr._fold_geom(qw, pts, nb, block_n)

    def _nblock(x):
        return (x.reshape(b, ah, nb, block_n).transpose(0, 2, 1, 3)
                .reshape(b * nb, ah, block_n))

    mx_b, sm_b, dd_b = _nblock(mx), _nblock(sm), _nblock(dd)

    common_in = [
        pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
        pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
        pl.BlockSpec((1, ah, block_m, c), lambda bi, i, j: (bi, 0, j, 0)),
        pl.BlockSpec((1, block_n, ah, cc), lambda bi, i, j: (bi, i, 0, 0)),
        pl.BlockSpec((1, block_n, block_m, cc),
                     lambda bi, i, j: (bi, i, j, 0)),
        pl.BlockSpec((1, 1, block_m), lambda bi, i, j: (bi, 0, j)),
        pl.BlockSpec((1, ah, block_n, 8),
                     lambda bi, i, j: (bi * nb + i, 0, 0, 0)),
        pl.BlockSpec((1, 8, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
        pl.BlockSpec((1, 16, block_m), lambda bi, i, j: (bi, 0, j)),
        pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
        pl.BlockSpec((1, ah, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
        pl.BlockSpec((1, ah, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
        pl.BlockSpec((1, ah, block_n), lambda bi, i, j: (bi * nb + i, 0, 0)),
    ]

    def run(name, fn, *a):
        if names and name not in names:
            return
        t0 = time.time()
        try:
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    args = (q, q, q, qp, emb, km, qw8_b, gn_b, gm, do, mx_b, sm_b, dd_b)

    def make(mode):
        def kernel(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                   gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref, o_ref):
            do_ = do_ref[0].astype(jnp.float32)
            dpv = jax.lax.dot_general(
                do_, v_ref[0].astype(jnp.float32),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if mode == "content_dpv":
                s = jax.lax.dot_general(
                    q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
                p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
                o_ref[0] = p * (dpv - dd_ref[0][:, :, None])
                return
            s, _ = fr._scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref,
                              gn_ref, gm_ref, scale=scale, with_eq=False)
            if mode == "s_mul_dpv":
                o_ref[0] = s * dpv
            else:  # no_exp
                inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
                p0 = (s - mx_ref[0][:, :, None]) * inv[:, :, None]
                o_ref[0] = p0 * (dpv - dd_ref[0][:, :, None])

        @jax.jit
        def fn(*a):
            return pl.pallas_call(
                kernel, grid=(b, nb, mb), in_specs=common_in,
                out_specs=[pl.BlockSpec((1, ah, block_n, block_m),
                                        lambda bi, i, j: (bi, 0, i, j))],
                out_shape=[
                    jax.ShapeDtypeStruct((b, ah, n, n), jnp.float32)],
            )(*a)

        return fn

    for mode in ("s_mul_dpv", "content_dpv", "no_exp"):
        run(mode, make(mode), *args)

    # the actionable workaround: dpv precomputed in XLA, input block
    def kernel_dpvin(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                     gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref,
                     dpv_ref, o_ref):
        s, _ = fr._scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref,
                          gn_ref, gm_ref, scale=scale, with_eq=False)
        inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
        p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
        p = p * km_ref[0, 0][None, None, :]
        o_ref[0] = p * (dpv_ref[0] - dd_ref[0][:, :, None])

    @jax.jit
    def fn_dpvin(*a):
        dpv_full = jax.lax.dot_general(
            do.astype(jnp.float32), q.astype(jnp.float32),
            (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)  # (b, ah, n, n)
        return pl.pallas_call(
            kernel_dpvin, grid=(b, nb, mb),
            in_specs=common_in + [
                pl.BlockSpec((1, ah, block_n, block_m),
                             lambda bi, i, j: (bi, 0, i, j))],
            out_specs=[pl.BlockSpec((1, ah, block_n, block_m),
                                    lambda bi, i, j: (bi, 0, i, j))],
            out_shape=[jax.ShapeDtypeStruct((b, ah, n, n), jnp.float32)],
        )(*a, dpv_full)

    run("dpv_input", fn_dpvin, *args)


if __name__ == "__main__":
    main(set(sys.argv[1:]))

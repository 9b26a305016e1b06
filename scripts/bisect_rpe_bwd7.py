"""Seventh-level: with dpv external, which downstream dot still crashes?

The ds chain with an input dpv block lowers (bisect6), but the full bwd
kernels still crash — so at least one of the f32 dots CONSUMING the
derived p/ds tiles is a second trigger.  One variant per dot; plus a bf16
variant of the dv dot (the fwd's bf16-dot-on-derived-p pattern compiles).

Usage: python scripts/bisect_rpe_bwd7.py [variant ...]
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
    dpv = jnp.asarray(rng.randn(b, ah, n, n), jnp.float32)

    qw8_b, gn_b, gm = fr._fold_geom(qw, pts, nb, block_n)

    def _nblock(x):
        return (x.reshape(b, ah, nb, block_n).transpose(0, 2, 1, 3)
                .reshape(b * nb, ah, block_n))

    mx_b, sm_b, dd_b = _nblock(mx), _nblock(sm), _nblock(dd)
    args = (q, q, q, qp, emb, km, qw8_b, gn_b, gm, do, mx_b, sm_b, dd_b,
            dpv)

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
        pl.BlockSpec((1, ah, block_n, block_m),
                     lambda bi, i, j: (bi, 0, i, j)),
    ]

    def run(name, fn):
        if names and name not in names:
            return
        t0 = time.time()
        try:
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    def make(mode):
        qside = mode in ("dq", "dqp", "demb", "dqw")

        def kernel(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                   gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref, dpv_ref,
                   o_ref):
            idx = pl.program_id(2)
            if mode != "demb":

                @pl.when(idx == 0)
                def _init():
                    o_ref[...] = jnp.zeros_like(o_ref)

            s, rinvk = fr._scores(q_ref, k_ref, qp_ref, emb_ref, km_ref,
                                  qw_ref, gn_ref, gm_ref, scale=scale,
                                  with_eq=True)
            inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
            p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
            p = p * km_ref[0, 0][None, None, :]
            ds = p * (dpv_ref[0] - dd_ref[0][:, :, None])
            if mode == "dv":
                do_ = do_ref[0].astype(jnp.float32)
                o_ref[0] += jax.lax.dot_general(
                    p, do_, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "dv_bf16":
                o_ref[0] += jax.lax.dot_general(
                    p.astype(jnp.bfloat16),
                    do_ref[0].astype(jnp.bfloat16),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "dk":
                o_ref[0] += scale * jax.lax.dot_general(
                    ds, q_ref[0].astype(jnp.float32),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "dq":
                o_ref[0] += scale * jax.lax.dot_general(
                    ds, k_ref[0].astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "dqp":
                ds_n = jnp.transpose(ds, (1, 0, 2))
                o_ref[0] += scale * jax.lax.dot_general(
                    ds_n, emb_ref[0].astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "demb":
                ds_n = jnp.transpose(ds, (1, 0, 2))
                o_ref[0] = (scale * jax.lax.dot_general(
                    ds_n, qp_ref[0].astype(jnp.float32),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)).astype(o_ref.dtype)
            else:  # dqw
                dsr = ds * rinvk[None]
                o_ref[0] += scale * jax.lax.dot_general(
                    dsr.reshape(ah * block_n, block_m), gm_ref[0][0:8],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(ah, block_n, 8)

        if mode in ("dv", "dv_bf16", "dk"):
            o_spec = pl.BlockSpec((1, ah, block_m, c),
                                  lambda bi, j, i: (bi, 0, j, 0))
            o_shape = jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32)
            in_specs = [
                pl.BlockSpec(
                    bs.block_shape,
                    (lambda f: (lambda bi, j, i: f(bi, i, j)))(bs.index_map))
                for bs in common_in
            ]
            grid = (b, mb, nb)
        else:
            in_specs = common_in
            grid = (b, nb, mb)
            if mode == "dq":
                o_spec = pl.BlockSpec((1, ah, block_n, c),
                                      lambda bi, i, j: (bi, 0, i, 0))
                o_shape = jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32)
            elif mode == "dqp":
                o_spec = pl.BlockSpec((1, block_n, ah, cc),
                                      lambda bi, i, j: (bi, i, 0, 0))
                o_shape = jax.ShapeDtypeStruct((b, n, ah, cc), jnp.float32)
            elif mode == "demb":
                o_spec = pl.BlockSpec((1, block_n, block_m, cc),
                                      lambda bi, i, j: (bi, i, j, 0))
                o_shape = jax.ShapeDtypeStruct((b, n, n, cc), emb.dtype)
            else:  # dqw
                o_spec = pl.BlockSpec(
                    (1, ah, block_n, 8),
                    lambda bi, i, j: (bi * nb + i, 0, 0, 0))
                o_shape = jax.ShapeDtypeStruct((b * nb, ah, block_n, 8),
                                               jnp.float32)

        @jax.jit
        def fn(*a):
            return pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs,
                out_specs=[o_spec], out_shape=[o_shape],
            )(*a)

        return fn

    for mode in ("dv", "dv_bf16", "dk", "dq", "dqp", "demb", "dqw"):
        run(mode, make(mode))


if __name__ == "__main__":
    main(set(sys.argv[1:]))

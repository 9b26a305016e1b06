"""Finer bisect of the flash-RPE backward Mosaic crash (folded layout).

Round-4 state: eq FORWARD lowers at b=2 (28.7 s) after the (b, nb) fold;
ALL bwd variants (kv pass, q full, q without dqw) still crash the compile
helper.  The shared-suspect constructs are (a) the second-minor-dim
contractions (dv += P.do over bn, dk += dS.q over bn, demb = dS_n.qp over
AH), (b) accumulation into output refs across grid steps, (c) the eq score
recompute in the bwd context.  Each variant here strips the q-side kernel
to ONE output/contraction, with eq on/off.

Usage: python scripts/bisect_rpe_bwd2.py [variant ...]   (default: all)
"""

import functools
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
    args = (q, q, q, qp, emb, km, qw8_b, gn_b, gm, do, mx_b, sm_b, dd_b)

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

    def _common(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
                gm_ref, do_ref, mx_ref, sm_ref, dd_ref, *, with_eq):
        s, rinvk = fr._scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref,
                              gn_ref, gm_ref, scale=scale, with_eq=with_eq)
        inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
        p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
        p = p * km_ref[0, 0][None, None, :]
        do_ = do_ref[0].astype(jnp.float32)
        dpv = jax.lax.dot_general(
            do_, v_ref[0].astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dpv - dd_ref[0][:, :, None])
        return p, ds, do_, rinvk

    def make_q_variant(mode, with_eq):
        """One-output q-side kernel: mode in dq / dqp / demb / dq_noacc."""

        def kernel(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                   gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref, o_ref):
            j = pl.program_id(2)
            if mode != "demb":

                @pl.when(j == 0)
                def _init():
                    o_ref[...] = jnp.zeros_like(o_ref)

            p, ds, do_, _ = _common(
                q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
                gm_ref, do_ref, mx_ref, sm_ref, dd_ref, with_eq=with_eq)
            if mode == "dq":
                o_ref[0] += scale * jax.lax.dot_general(
                    ds, k_ref[0].astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            elif mode == "dq_noacc":
                o_ref[0] = scale * jax.lax.dot_general(
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

        if mode in ("dq", "dq_noacc"):
            o_spec = pl.BlockSpec((1, ah, block_n, c),
                                  lambda bi, i, j: (bi, 0, i, 0))
            o_shape = jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32)
        elif mode == "dqp":
            o_spec = pl.BlockSpec((1, block_n, ah, cc),
                                  lambda bi, i, j: (bi, i, 0, 0))
            o_shape = jax.ShapeDtypeStruct((b, n, ah, cc), jnp.float32)
        else:  # demb
            o_spec = pl.BlockSpec((1, block_n, block_m, cc),
                                  lambda bi, i, j: (bi, i, j, 0))
            o_shape = jax.ShapeDtypeStruct((b, n, n, cc), emb.dtype)

        @jax.jit
        def fn(*args):
            return pl.pallas_call(
                kernel, grid=(b, nb, mb), in_specs=common_in,
                out_specs=[o_spec], out_shape=[o_shape],
            )(*args)

        return fn

    def make_kv_variant(mode, with_eq):
        """One-output kv-side kernel: mode in dv / dk."""

        def kernel(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                   gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref, o_ref):
            i = pl.program_id(2)

            @pl.when(i == 0)
            def _init():
                o_ref[...] = jnp.zeros_like(o_ref)

            p, ds, do_, _ = _common(
                q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref, gn_ref,
                gm_ref, do_ref, mx_ref, sm_ref, dd_ref, with_eq=with_eq)
            if mode == "dv":
                o_ref[0] += jax.lax.dot_general(
                    p, do_, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            else:
                o_ref[0] += scale * jax.lax.dot_general(
                    ds, q_ref[0].astype(jnp.float32),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

        kv_specs = [
            pl.BlockSpec(
                bs.block_shape,
                (lambda f: (lambda bi, j, i: f(bi, i, j)))(bs.index_map))
            for bs in common_in
        ]

        @jax.jit
        def fn(*args):
            return pl.pallas_call(
                kernel, grid=(b, mb, nb), in_specs=kv_specs,
                out_specs=[pl.BlockSpec((1, ah, block_m, c),
                                        lambda bi, j, i: (bi, 0, j, 0))],
                out_shape=[jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32)],
            )(*args)

        return fn

    for with_eq in (False, True):
        tag = "eq" if with_eq else "inv"
        run(f"q dq {tag}", make_q_variant("dq", with_eq))
        run(f"q dq_noacc {tag}", make_q_variant("dq_noacc", with_eq))
        run(f"q dqp {tag}", make_q_variant("dqp", with_eq))
        run(f"q demb {tag}", make_q_variant("demb", with_eq))
        run(f"kv dv {tag}", make_kv_variant("dv", with_eq))
        run(f"kv dk {tag}", make_kv_variant("dk", with_eq))


if __name__ == "__main__":
    main(set(sys.argv[1:]))

"""Bisect the flash-RPE eq BACKWARD Mosaic compile crash on real TPU.

The fwd eq kernel lowers after the matmul-expansion rewrite; `_rpe_bwd`
with ``with_eq=True`` still crashes the compile helper.  Each variant here
compiles one bwd pass with pieces ablated to pinpoint the construct.

Usage: python scripts/bisect_rpe_bwd.py [variant ...]   (default: all)
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
    # (b, 1, n) — matches _rpe_fwd/_rpe_bwd's singleton-axis mask layout
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
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # --- pass 1: dK/dV ---
    def kv_pass(*args):
        kv_specs = [
            pl.BlockSpec(
                bs.block_shape,
                (lambda f: (lambda bi, j, i: f(bi, i, j)))(bs.index_map))
            for bs in common_in
        ]
        return pl.pallas_call(
            functools.partial(fr._bwd_kv_kernel, ah=ah, bn=block_n,
                              bm=block_m, c=c, scale=scale, with_eq=True),
            grid=(b, mb, nb),
            in_specs=kv_specs,
            out_specs=[
                pl.BlockSpec((1, ah, block_m, c),
                             lambda bi, j, i: (bi, 0, j, 0)),
                pl.BlockSpec((1, ah, block_m, c),
                             lambda bi, j, i: (bi, 0, j, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32),
                jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32),
            ],
        )(*args)

    run("bwd kv eq", lambda: jax.jit(kv_pass)(*args))

    # --- pass 2 variants: full and ablated q-side kernels ---
    def q_pass(kernel, with_dqw, *args):
        out_specs = [
            pl.BlockSpec((1, ah, block_n, c), lambda bi, i, j: (bi, 0, i, 0)),
            pl.BlockSpec((1, block_n, ah, cc), lambda bi, i, j: (bi, i, 0, 0)),
            pl.BlockSpec((1, block_n, block_m, cc),
                         lambda bi, i, j: (bi, i, j, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, ah, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, ah, cc), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n, cc), emb.dtype),
        ]
        if with_dqw:
            out_specs.append(pl.BlockSpec(
                (1, ah, block_n, 8),
                lambda bi, i, j: (bi * nb + i, 0, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((b * nb, ah, block_n, 8), jnp.float32))
        return pl.pallas_call(
            functools.partial(kernel, ah=ah, bn=block_n, bm=block_m, c=c,
                              scale=scale, with_eq=True),
            grid=(b, nb, mb),
            in_specs=common_in,
            out_specs=out_specs,
            out_shape=out_shape,
        )(*args)

    run("bwd q eq full",
        lambda: jax.jit(functools.partial(q_pass, fr._bwd_q_kernel, True))(
            *args))

    # ablation: eq scores recomputed, but NO dqw output/accumulation
    def q_kernel_nodqw(q_ref, k_ref, v_ref, qp_ref, emb_ref, km_ref, qw_ref,
                       gn_ref, gm_ref, do_ref, mx_ref, sm_ref, dd_ref,
                       dq_ref, dqp_ref, demb_ref, *, ah, bn, bm, c, scale,
                       with_eq):
        import jax.numpy as jnp  # noqa: PLC0415

        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            dq_ref[...] = jnp.zeros_like(dq_ref)
            dqp_ref[...] = jnp.zeros_like(dqp_ref)

        s, rinvk = fr._scores(q_ref, k_ref, qp_ref, emb_ref, km_ref, qw_ref,
                              gn_ref, gm_ref, scale=scale, with_eq=True)
        inv = 1.0 / jnp.maximum(sm_ref[0], 1e-30)
        p = jnp.exp(s - mx_ref[0][:, :, None]) * inv[:, :, None]
        p = p * km_ref[0, 0][None, None, :]
        do_ = do_ref[0].astype(jnp.float32)
        dpv = jax.lax.dot_general(
            do_, v_ref[0].astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dpv - dd_ref[0][:, :, None])
        dq_ref[0] += scale * jax.lax.dot_general(
            ds, k_ref[0].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds_n = jnp.transpose(ds, (1, 0, 2))
        dqp_ref[0] += scale * jax.lax.dot_general(
            ds_n, emb_ref[0].astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        demb_ref[0] = (scale * jax.lax.dot_general(
            ds_n, qp_ref[0].astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)).astype(demb_ref.dtype)

    run("bwd q eq nodqw",
        lambda: jax.jit(functools.partial(q_pass, q_kernel_nodqw, False))(
            *args))


if __name__ == "__main__":
    main(set(sys.argv[1:]))

"""Mosaic lowering probes for the in-attention fused-embedding design.

The plan (BENCH.md round 4) computes geometric-embedding tiles INSIDE the
flash RPE kernel (deleting the (B, N, M, C) tensor from serving).  Its
novel kernel patterns, each probed in isolation and composition here:

  P1  3-D Chebyshev basis scratch (deg, bn, bm) built by leading-dim
      8-row group writes (the embedding kernel's 2-D trick, one dim up)
  P2  leading-contract 3-D dot: (deg, bn, bm) x (deg, C) -> (bn, bm, C)
  P3  elementwise max/add of two such dot results (the round-4 crash
      class hit f32 dot-derived combines — does this shape survive?)
  P4  final n-batched bf16 contraction with the DERIVED emb tile:
      (bn, AH, C) x (bn, bm, C) -> (bn, AH, bm)

Usage: python scripts/probe_femb_patterns.py [variant ...]
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
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    rng = np.random.RandomState(0)

    b, ah, n, c, cc = 1, 24, 1024, 64, 256
    bn, bm, deg = 16, 128, 40
    nb, mb = n // bn, n // bm

    gn = jnp.asarray(rng.randn(b * nb, 8, bn), jnp.float32)
    gm = jnp.asarray(rng.randn(b, 16, n), jnp.float32)
    gd = jnp.asarray(rng.randn(deg, cc) * 0.05, jnp.float32)
    qp = jnp.asarray(rng.randn(b * nb, bn, ah, cc), jnp.bfloat16)

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

    def _basis(t, scratch):
        """Chebyshev rows (deg, bn, bm) by leading-dim 8-group writes."""
        tk_prev, tk = jnp.ones_like(t), t
        two_t = 2.0 * t
        rows = []
        for j in range(deg):
            rows.append(tk_prev[None])
            tk_prev, tk = tk, two_t * tk - tk_prev
            if len(rows) == 8:
                g = j // 8
                scratch[g * 8:(g + 1) * 8] = jnp.concatenate(rows, axis=0)
                rows = []
        return scratch[0:deg]

    def make(mode):
        def kernel(gn_ref, gm_ref, gd_ref, qp_ref, o_ref, scratch):
            # r^2 via the proven expansion matmul, then t = clip(...)
            r2 = jax.lax.dot_general(
                gn_ref[0], gm_ref[0][8:16], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t = jnp.clip(jnp.sqrt(jnp.maximum(r2, 0.0)) * 0.2 - 1.0,
                         -1.0, 1.0)  # (bn, bm)
            basis = _basis(t, scratch)  # (deg, bn, bm)
            if mode == "p1_basis":
                o_ref[0] = jnp.sum(basis, axis=0)
                return
            demb = jax.lax.dot_general(
                basis, gd_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bn, bm, C)
            if mode == "p2_dot":
                o_ref[0] = jnp.sum(demb, axis=2)
                return
            # second projection from a shifted basis, then combine
            basis2 = scratch[0:deg] * 0.5
            aemb = jax.lax.dot_general(
                basis2, gd_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            emb_t = jnp.maximum(demb, aemb) + demb
            if mode == "p3_combine":
                o_ref[0] = jnp.sum(emb_t, axis=2)
                return
            # p4: final n-batched bf16 contraction with the derived tile
            sp = jax.lax.dot_general(
                qp_ref[0], emb_t.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (bn, AH, bm)
            o_ref[0] = jnp.sum(sp, axis=1)

        @jax.jit
        def fn(gn, gm, gd, qp):
            return pl.pallas_call(
                kernel,
                grid=(b * nb, mb),
                in_specs=[
                    pl.BlockSpec((1, 8, bn), lambda i, j: (i, 0, 0)),
                    pl.BlockSpec((1, 16, bm), lambda i, j: (0, 0, j)),
                    pl.BlockSpec((deg, cc), lambda i, j: (0, 0)),
                    pl.BlockSpec((1, bn, ah, cc), lambda i, j: (i, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, bn, bm), lambda i, j: (i, 0, j)),
                out_shape=jax.ShapeDtypeStruct((b * nb, bn, n), jnp.float32),
                scratch_shapes=[pltpu.VMEM((deg, bn, bm), jnp.float32)],
            )(gn, gm, gd, qp)

        return fn

    for mode in ("p1_basis", "p2_dot", "p3_combine", "p4_full"):
        run(mode, make(mode), gn, gm, gd, qp)


if __name__ == "__main__":
    main(set(sys.argv[1:]))

"""Attribute the fused geometric-embedding kernel's cost at production shapes.

Variants: full kernel (auto degs), forced deg=64 everywhere (round-2 state),
angle_k in {3, 1} (angle-projection share), and a write-floor kernel that
emits zeros through the same grid/blockspec (grid + HBM-write overhead).
"""

import argparse
import functools
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--c", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update(
        "jax_compilation_cache_dir",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from se3et_tpu.ops.pallas import embedding as emb_lib

    b, n, c = 2, args.n, args.c
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(0, 3, (b, n, 3)), jnp.float32)
    knn3 = jnp.asarray(rng.uniform(0, 3, (b, n, 3, 3)), jnp.float32)
    knn1 = knn3[:, :, :1]
    wd = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
    bd = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)

    def bench(name, fn, *inputs):
        red = jax.jit(lambda *a: jnp.sum(fn(*a)[:, ::64].astype(jnp.float32)))
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(args.reps):
            out = red(*inputs)
        np.asarray(out)
        print(f"{name:52s} {(time.time() - t0) / args.reps * 1000:8.2f} ms",
              flush=True)

    run = functools.partial(
        emb_lib.geometric_embedding_pallas, sigma_d=0.2, sigma_a=15.0
    )
    bench("full kernel (auto degs, k=3)",
          lambda p, k3: run(p, k3, wd, bd, wd, bd), pts, knn3)
    bench("full kernel (auto degs, k=1)",
          lambda p, k1: run(p, k1, wd, bd, wd, bd), pts, knn1)

    # forced deg=64 everywhere (round-2 behavior) via a tol that never passes
    orig = emb_lib.pick_deg
    emb_lib.pick_deg = lambda *a, **k: 64
    try:
        bench("forced deg=64 (k=3)",
              lambda p, k3: run(p, k3, wd, bd, wd, bd), pts, knn3)
    finally:
        emb_lib.pick_deg = orig

    # write-floor: same grid/out spec, kernel just writes a constant
    def _zero_kernel(q_ref, out_ref):
        out_ref[0, 0] = (
            jnp.zeros_like(out_ref[0, 0], jnp.float32) + q_ref[0, 0, 0]
        ).astype(out_ref.dtype)

    def write_floor(p):
        return pl.pallas_call(
            _zero_kernel,
            grid=(b, n),
            in_specs=[pl.BlockSpec((1, 8, 3), lambda bi, i: (bi, i // 8, 0))],
            out_specs=pl.BlockSpec((1, 1, n, c), lambda bi, i: (bi, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, n, n, c), jnp.bfloat16),
        )(p)

    bench("write floor (zeros through same grid)", write_floor, pts)

    # multi-row floor: fewer, larger writes (rows query rows per grid step)
    def _zero_kernel_rows(q_ref, out_ref):
        out_ref[0] = (
            jnp.zeros_like(out_ref[0], jnp.float32) + q_ref[0, 0, 0]
        ).astype(out_ref.dtype)

    def write_floor_rows(p, rows):
        return pl.pallas_call(
            _zero_kernel_rows,
            grid=(b, n // rows),
            in_specs=[pl.BlockSpec((1, 8, 3), lambda bi, i, r=rows: (bi, i * r // 8, 0))],
            out_specs=pl.BlockSpec(
                (1, rows, n, c), lambda bi, i: (bi, i, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, n, n, c), jnp.bfloat16),
        )(p)

    for rows in (2, 4, 8):
        bench(f"write floor ({rows} rows/step)",
              lambda p, r=rows: write_floor_rows(p, r), pts)


if __name__ == "__main__":
    main()

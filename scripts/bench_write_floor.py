"""Probe the raw HBM write floor for the geometric-embedding output tensor.

BENCH.md round-3 measured the embedding kernel's pure write floor (zeros
through its (tile_n=8, tile_m) grid) at 5.9 ms for the 1.07 GB bf16
(2, 1024, 1024, 256) output — only ~180 GB/s effective vs the ~800 GB/s
HBM roofline.  This sweeps output blockings to find whether the floor is the
DMA pattern (fixable by re-gridding the kernel) or the chip.
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--c", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b, n, c = 2, args.n, args.c
    nbytes = b * n * n * c * 2

    def bench(name, fn):
        # the jit must RETURN the full array (an in-jit slice lets XLA
        # constant-fold the write away); sync by fetching 4 elements of the
        # materialized output
        red = jax.jit(fn)
        np.asarray(red()[0, 0, 0, :4].astype(jnp.float32))
        t0 = time.time()
        for _ in range(args.reps):
            out = red()
        np.asarray(out[0, 0, 0, :4].astype(jnp.float32))
        ms = (time.time() - t0) / args.reps * 1000.0
        print(f"{name:44s} {ms:8.2f} ms  {nbytes / ms / 1e6:7.1f} GB/s",
              flush=True)

    # XLA baseline: broadcast-zeros write
    bench("xla broadcast zeros", lambda: jnp.zeros((b, n, n, c), jnp.bfloat16))

    def zk(o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

    for tn, tm in [(8, 256), (8, 1024), (32, 256), (64, 256), (64, 1024),
                   (128, 128), (256, 256), (1024, 64)]:
        if n % tn or n % tm:
            continue
        fn = pl.pallas_call(
            zk,
            grid=(b, n // tn, n // tm),
            out_specs=pl.BlockSpec((1, tn, tm, c), lambda bi, i, j: (bi, i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, n, n, c), jnp.bfloat16),
        )
        vmem_mb = tn * tm * c * 2 * 2 / 1e6
        if vmem_mb > 14:
            continue
        bench(f"pallas zeros tn={tn} tm={tm} ({vmem_mb:.1f} MB)",
              functools.partial(fn))


if __name__ == "__main__":
    main()

"""Microbench: conv weight-matmul formulations at s1 production shapes.

The measured 4 ms for a (2,10000,5760)@(5760,384) bf16 einsum is ~9x off the
MXU roofline — attribute it: input layout (wf (B,N,K,AC) vs pre-flattened),
weight-gather/transpose in the graph, dtype, and dot dimension orders.
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"),
    )

    B, N, K, A, CIN, COUT = 2, 10000, 15, 6, 64, 64
    KAC = K * A * CIN
    rng = np.random.RandomState(0)
    wf4 = jax.device_put(jnp.asarray(
        rng.randn(B, N, K, A * CIN).astype(np.float32), jnp.bfloat16))
    wf_flat = jax.device_put(jnp.asarray(
        rng.randn(B, N, KAC).astype(np.float32), jnp.bfloat16))
    rhs = jax.device_put(jnp.asarray(
        rng.randn(KAC, A * COUT).astype(np.float32), jnp.bfloat16))
    weights = jax.device_put(jnp.asarray(
        rng.randn(37, CIN, COUT).astype(np.float32)))  # exact-steer block count
    wg_index = jax.device_put(jnp.asarray(
        rng.randint(0, 37, size=(A, K, A)).astype(np.int32)))

    def bench(name, fn, *inputs):
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(20):
            out = red(*inputs)
        np.asarray(out)
        print(f"{name:56s} {(time.time() - t0) / 20 * 1000:8.2f} ms")

    bench("einsum bnm,mo (pre-flat lhs, static rhs)",
          lambda l, r: jnp.einsum("bnm,mo->bno", l, r), wf_flat, rhs)
    bench("einsum from (B,N,K,AC) with reshape",
          lambda l, r: jnp.einsum(
              "bnm,mo->bno", l.reshape(B, N, KAC), r), wf4, rhs)
    bench("dot_general 2d (B*N, KAC)@(KAC, ACOUT)",
          lambda l, r: jax.lax.dot_general(
              l.reshape(B * N, KAC), r, (((1,), (0,)), ((), ()))),
          wf_flat, rhs)

    def with_gather(l, w):
        wg = w.astype(jnp.bfloat16)[wg_index]  # (A, K, A, CIN, COUT)
        r = jnp.transpose(wg, (1, 2, 3, 0, 4)).reshape(KAC, A * COUT)
        return jnp.einsum("bnm,mo->bno", l, r)

    bench("with in-graph weight gather+transpose (model path)",
          with_gather, wf_flat, weights)

    # f32 accumulate explicitly
    bench("dot_general preferred f32",
          lambda l, r: jax.lax.dot_general(
              l.reshape(B * N, KAC), r, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          wf_flat, rhs)


if __name__ == "__main__":
    main()

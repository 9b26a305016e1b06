"""Microbench: conv weight-matmul formulations at production conv shapes.

Round-3 finding to test: the factored class-reduction path (d463969) cuts
FLOPs 3x but materializes a (B, N, A, O, Cin) intermediate that is ~2x the
wf tensor itself (415 MB at s0/s1) — at 5.5% MFU the model is traffic-bound,
not FLOP-bound, so the single expanded matmul (wf_flat @ Wexp, inner KAC,
no intermediate) may win despite 3x the arithmetic.
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

    K, A, NUM_O = 15, 6, 37  # exact-steer weight block count (27 tied + pads)
    rng = np.random.RandomState(0)

    def bench(name, fn, *inputs):
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(20):
            out = red(*inputs)
        np.asarray(out)
        print(f"{name:56s} {(time.time() - t0) / 20 * 1000:8.2f} ms",
              flush=True)

    # (label, N, CIN, COUT) for every production conv (B=2 pairs of clouds)
    cases = [
        ("s0 n (N=20000, 32->64)", 20000, 32, 64),
        ("s1 sub (N=10000, 32->64)", 10000, 32, 64),
        ("s1 n1/n2 (N=10000, 64->128)", 10000, 64, 128),
        ("s2 n (N=2500, 128->256)", 2500, 128, 256),
        ("s3 n (N=1024, 256->512)", 1024, 256, 512),
    ]
    B = 2
    for label, n, cin, cout in cases:
        kac = K * A * cin
        wf_flat = jax.device_put(jnp.asarray(
            rng.randn(B, n, kac).astype(np.float32), jnp.bfloat16))
        weights = jax.device_put(jnp.asarray(
            rng.randn(NUM_O, cin, cout).astype(np.float32)))
        idx_np = rng.randint(0, NUM_O, size=(A, K, A)).astype(np.int32)
        wg_index = jax.device_put(jnp.asarray(idx_np))
        m = np.zeros((K * A, A * NUM_O), np.float32)
        for r in range(A):
            flat = idx_np[r].reshape(-1)
            m[np.arange(K * A), r * NUM_O + flat] = 1.0
        reduce_m = jax.device_put(jnp.asarray(m))
        print(f"--- {label}: KAC={kac} out={A}x{cout}", flush=True)

        def factored(l, w, rm):
            wf_kac = l.reshape(B, n, K * A, cin)
            red = jnp.einsum(
                "bnxc,xm->bnmc", wf_kac, rm.astype(jnp.bfloat16)
            ).reshape(B, n, A, NUM_O, cin)
            return jnp.einsum(
                "bnroc,ocd->bnrd", red, w.astype(jnp.bfloat16))

        bench("  factored (current model path)", factored,
              wf_flat, weights, reduce_m)

        def expanded(l, w):
            wg = w.astype(jnp.bfloat16)[wg_index]  # (A, K, A, CIN, COUT)
            rhs = jnp.transpose(wg, (1, 2, 3, 0, 4)).reshape(kac, A * cout)
            return jnp.einsum("bnm,mo->bno", l, rhs)

        bench("  expanded single matmul (in-graph gather)", expanded,
              wf_flat, weights)

        rhs_pre = jax.device_put(jnp.asarray(
            rng.randn(kac, A * cout).astype(np.float32), jnp.bfloat16))
        bench("  expanded, rhs precomputed (upper bound)",
              lambda l, r: jnp.einsum("bnm,mo->bno", l, r),
              wf_flat, rhs_pre)


if __name__ == "__main__":
    main()

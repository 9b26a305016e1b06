"""Bisect the femb-v2 Mosaic failure (if the bf16-output/bf16-max fixes of
622632c are not enough): which axis kills the compile — block_n, the eq
path, or the fused accumulation?

Each case compiles rpe_self_attention_femb at the production serving shape
in a SUBPROCESS-free direct call (compile errors surface at first call).

Usage: python scripts/bisect_femb_v2.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 ".jax_cache_bisect"),
    )
    from se3et_tpu.ops.pallas import rpe_attention as fr

    rng = np.random.RandomState(0)
    b, ah, n, c, cc = 2, 24, 1024, 64, 256
    q = jnp.asarray(rng.randn(b, ah, n, c), jnp.bfloat16)
    qp = jnp.asarray(rng.randn(b, n, ah, cc), jnp.bfloat16)
    km = jnp.asarray(np.arange(n) < 1000)[None] & jnp.ones((b, 1), bool)
    qw = jnp.asarray(rng.randn(b, 3, ah, n), jnp.float32)
    pts = jnp.asarray(rng.randn(b, 4, n), jnp.float32)
    knn = jnp.asarray(rng.randn(b, n, 3, 3), jnp.float32)
    wde = jnp.asarray(rng.randn(cc, cc) * 0.05, jnp.float32)

    def run(tag, **kw):
        t0 = time.time()
        try:
            out = fr.rpe_self_attention_femb(
                kw.pop("q", q), q, q, kw.pop("qp", qp), km,
                kw.pop("qw", qw), pts, knn, wde, wde, scale=0.125,
                sigma_d=0.2, sigma_a=15.0, **kw,
            )
            np.asarray(out[..., :1, :1].astype(jnp.float32))
            print(f"OK   {tag} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {tag}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    run("eq bn=32 (v2 design)", block_n=32)
    run("eq bn=16 (current default)")
    run("inv bn=32", qw=None, block_n=32)
    run("inv bn=16", qw=None)
    # AH=4 inv variants (the compile-smoke shape that passed at v2)
    run("inv AH=4 bn=32", q=q[:, :4], qp=qp[:, :, :4], qw=None, block_n=32)
    # round-5 verdict so far: bn=32 crashes IFF AH=24 (eq and inv alike);
    # bn=16 compiles.  bm=64 halves the footprint while keeping bn=32's
    # halved K/V sweep count — probe whether the crash is footprint-driven
    run("eq bn=32 bm=64", block_n=32, block_m=64)
    run("inv bn=32 bm=64", qw=None, block_n=32, block_m=64)
    run("eq bn=32 bm=256", block_n=32, block_m=256)


if __name__ == "__main__":
    main()

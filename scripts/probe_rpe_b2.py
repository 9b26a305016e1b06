"""Probe the flash RPE eq FORWARD at B=2 (stacked-cloud serving layout).

B=1 lowered on real TPU (367 s cold); B=2 crashed the Mosaic compile
helper before the mask-block fix.  This isolates whether the crash was the
mask layout (now (b, 1, n) with (1, 1, block_m) blocks) or b=2 itself.
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from se3et_tpu.ops.pallas import rpe_attention as fr

    cache_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    rng = np.random.RandomState(0)

    ah, n, c, cc = 24, 1024, 64, 256
    for b in ([int(a) for a in sys.argv[1:]] or [1, 2]):
        q = jnp.asarray(rng.randn(b, ah, n, c), jnp.bfloat16)
        qp = jnp.asarray(rng.randn(b, n, ah, cc), jnp.bfloat16)
        emb = jnp.asarray(rng.randn(b, n, n, cc), jnp.bfloat16)
        km = jnp.asarray(np.arange(n) < 1000)[None] & jnp.ones((b, 1), bool)
        qw = jnp.asarray(rng.randn(b, 3, ah, n), jnp.float32)
        pts = jnp.asarray(rng.randn(b, 4, n), jnp.float32)
        t0 = time.time()
        try:
            out = fr.rpe_self_attention(q, q, q, qp, emb, km, qw, pts,
                                        scale=0.125, block_m=128)
            np.asarray(out[..., :1])
            print(f"OK   fwd eq b={b} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"FAIL fwd eq b={b}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""A/B the segment-window materialization: one-hot einsum vs row gather.

``segment_window_gather`` materializes per-block source windows with a
one-hot matmul over segments — chosen in round 2 when large-slice gathers
lowered pathologically.  But its FLOP cost is rows * nblk_s * (sseg * AC),
which at the round-5 stage-0 slot counts is ~300 GFLOP per conv — XLA's
model-FLOP count jumped 1.66 -> 1.89 TFLOP when the per-set sseg budgets
landed, implicating these einsums as a hidden multi-ms block.  The
alternative: reshape to segment rows and ``take_along_axis`` (a row gather
of nblk_q*S rows of sseg*AC width — ~8.4 ns/row + bandwidth).

Prints per production shape: einsum ms, gather ms.  Run on the chip.
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
                 ".jax_cache"),
    )
    from se3et_tpu.ops.pallas import windowed_conv as wc

    rng = np.random.RandomState(0)

    # (label, Ns, nblk_q, S, sseg, AC) — current se3ete.3dmatch serving
    # shapes: stage-0 sets at sseg=8, deeper sets at 16
    cases = [
        ("s0 n  AC=192", 20000, 313, 32, 8, 192),
        ("s0 n  AC=384", 20000, 313, 32, 8, 384),
        ("s0 sub AC=768", 20000, 157, 48, 8, 768),
        ("s1 n  AC=384", 10000, 157, 32, 16, 384),
        ("s1 n  AC=768", 10000, 157, 32, 16, 768),
        ("s1 sub AC=1536", 10000, 40, 48, 16, 1536),
        ("s2 n  AC=768", 2500, 40, 32, 16, 768),
    ]

    def bench(label, fn, *args):
        out = fn(*args)
        np.asarray(jnp.sum(out[..., :1, :1].astype(jnp.float32)))
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jnp.sum(out[..., :1, :1].astype(jnp.float32)))
        ms = (time.time() - t0) / reps * 1000.0
        print(f"  {label:44s} {ms:7.2f} ms", flush=True)
        return ms

    import functools

    for label, ns, nblk_q, s, sseg, ac in cases:
        nblk_s = (ns + sseg - 1) // sseg
        x = jnp.asarray(rng.randn(2, ns, ac).astype(np.float32), jnp.bfloat16)
        seg_idx = jnp.asarray(
            rng.randint(0, nblk_s, size=(2, nblk_q, s)), jnp.int32
        )
        print(f"--- {label}: Ns={ns} rows={nblk_q * s} nblk_s={nblk_s} "
              f"width={sseg * ac}", flush=True)

        onehot = jax.jit(functools.partial(wc.segment_window_gather,
                                           sseg=sseg))
        bench("one-hot einsum (current)", onehot, x, seg_idx)

        @jax.jit
        def takeg(x, seg_idx, ns=ns, sseg=sseg, ac=ac, nblk_s=nblk_s,
                  nblk_q=nblk_q, s=s):
            pad = nblk_s * sseg - ns
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            segs = x.reshape(2, nblk_s, sseg * ac)
            rows = jnp.take_along_axis(
                segs, seg_idx.reshape(2, nblk_q * s, 1), axis=1
            )
            return rows.reshape(2, nblk_q, s * sseg, ac)

        bench("take_along_axis row gather", takeg, x, seg_idx)


if __name__ == "__main__":
    main()

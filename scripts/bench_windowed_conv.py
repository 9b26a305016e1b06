"""Microbenchmark: windowed one-hot conv kernel vs the XLA row-gather path.

Shapes mirror the stage-0 resnet conv of se3ete.3dmatch at production scale:
B=2 clouds, N=19968 points (156 blocks of 128), H=38 neighbors, K=15 kernel
points, A=6 anchors, Cin=32 (AC=192), window S=16 segments of 128 (W=2048).
"""

import argparse
import functools
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=19968)
    parser.add_argument("--h", type=int, default=38)
    parser.add_argument("--k", type=int, default=15)
    parser.add_argument("--ac", type=int, default=192)
    parser.add_argument("--segs", type=int, default=16)
    parser.add_argument("--hc", type=int, default=8)
    parser.add_argument("--reps", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    B, N, H, K, AC = 2, args.n, args.h, args.k, args.ac
    P = 128
    S = args.segs
    W = S * P
    HC = args.hc
    H_pad = ((H + HC - 1) // HC) * HC
    nblk = N // P

    rng = np.random.RandomState(0)
    feats = rng.randn(B, N, AC).astype(np.float32)
    # synthetic local neighbor structure: indices within a window
    nbr_global = np.minimum(
        (rng.rand(B, N, H) * 3000 + np.arange(N)[None, :, None] - 1500).clip(0, N - 1),
        N - 1,
    ).astype(np.int32)
    infl = rng.rand(B, N, H, K).astype(np.float32)
    # window maps: per block, S segments centered on the block
    seg_idx = np.zeros((B, nblk, S), np.int32)
    for b in range(nblk):
        base = np.clip(b - S // 2, 0, nblk - S)
        seg_idx[:, b] = np.arange(base, base + S)
    # local indices: nbr remapped into the window (clip into range for the bench)
    local = np.zeros((B, N, H), np.int32)
    for b in range(nblk):
        base = seg_idx[0, b, 0] * P
        idx = nbr_global[:, b * P:(b + 1) * P] - base
        local[:, b * P:(b + 1) * P] = np.clip(idx, 0, W - 1)
    if H_pad > H:
        local = np.concatenate(
            [local, np.full((B, N, H_pad - H), W, np.int32)], axis=2
        )
        infl = np.concatenate(
            [infl, np.zeros((B, N, H_pad - H, K), np.float32)], axis=2
        )

    feats_j = jax.device_put(jnp.asarray(feats, jnp.bfloat16))
    nbrg_j = jax.device_put(jnp.asarray(nbr_global))
    infl_j = jax.device_put(jnp.asarray(infl, jnp.bfloat16))
    seg_j = jax.device_put(jnp.asarray(seg_idx))
    local_j = jax.device_put(jnp.asarray(local))

    def bench(name, fn, *inputs):
        # output reduced to a scalar IN-GRAPH: fetching big arrays drags them
        # over the ~100 MB/s relay and poisons the timing
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(args.reps):
            out = red(*inputs)
        np.asarray(out)
        ms = (time.time() - t0) / args.reps * 1000.0
        print(f"{name:38s} {ms:8.2f} ms")
        return fn(*inputs)

    # ---------------- baseline: XLA row gather + wf einsum ----------------
    def xla_gather_wf(feats, nbr, infl):
        g = jnp.take_along_axis(
            feats, nbr.reshape(B, -1, 1), axis=1
        ).reshape(B, N, H, AC)
        return jnp.einsum("bnhc,bnhk->bnkc", g, infl[:, :, :H])

    wf_ref = bench("xla row-gather + wf einsum", xla_gather_wf, feats_j, nbrg_j, infl_j)

    # ---------------- segment slice-gather alone ----------------
    def seg_gather(feats, seg_idx):
        segs = feats.reshape(B, nblk, P, AC)
        win = jnp.take_along_axis(
            segs, seg_idx[:, :, :, None, None], axis=1
        )  # wrong shape; use vmap gather instead
        return win

    def seg_gather2(feats, seg_idx):
        # one-hot matmul: out[b, q, s] = segs[b, seg_idx[b,q,s]] expressed as
        # (nblk_q*S, nblk_s) @ (nblk_s, P*AC) — large-slice gathers lower
        # terribly on TPU, a tiny matmul runs at bandwidth
        segs = feats.reshape(B, nblk, P * AC)
        oh = jax.nn.one_hot(seg_idx.reshape(B, nblk * S), nblk, dtype=feats.dtype)
        win = jnp.einsum("bqn,bnd->bqd", oh, segs)
        return win.reshape(B, nblk, S, P, AC)

    win = bench("segment one-hot matmul gather", seg_gather2, feats_j, seg_j)

    # ---------------- pallas windowed one-hot kernel ----------------
    from se3et_tpu.ops.pallas import windowed_conv as wc

    def fused(feats, seg_idx, local, infl):
        win = wc.segment_window_gather(feats, seg_idx)
        win = win.reshape(B, nblk, W, AC)
        return wc.windowed_gather_wf(local, infl, win, hc=HC)

    wf_fused = bench("pallas windowed conv (gather+wf)", fused, feats_j, seg_j,
                     local_j, infl_j)

    # correctness vs a numpy reference on the same local windows
    blk = 3
    win_np = feats[0].reshape(nblk, P, AC)[seg_idx[0, blk]].reshape(W, AC)
    loc_np = local[0, blk * P:(blk + 1) * P]
    inf_np = infl[0, blk * P:(blk + 1) * P]
    valid = loc_np < W
    g_np = win_np[np.clip(loc_np, 0, W - 1)] * valid[..., None]
    ref = np.einsum("phc,phk->pkc", g_np, inf_np)
    got = np.asarray(wf_fused[0, blk * P:(blk + 1) * P]).reshape(P, K, AC)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"relative max error vs numpy: {err:.4f}")


if __name__ == "__main__":
    main()

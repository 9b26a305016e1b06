"""Microbenchmarks for windowed-conv kernel design variants, at stage-0 shapes.

All kernels process MP=32 query rows per grid step (the VMEM-proven layout of
build_m_geo_pallas).  Variants:
  B.  one-hot build + g = oh @ win_feats       (MXU one-hot gather + h-sum)
  C.  B + influence contraction as VPU loop    (wf = sum_h infl * g, per-k)
  C2. B + batched-dot contraction              (current kernel style)
  D.  C + in-kernel influence from hi/lo bf16 coords (fully fused conv)
  E.  existing windowed_gather_wf              (P=128 batched-dot baseline)
"""

import argparse
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
    import ml_dtypes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    B, N, H, K, AC = 2, args.n, args.h, args.k, args.ac
    P, S, HC = 128, args.segs, args.hc
    W = S * P
    H_pad = ((H + HC - 1) // HC) * HC
    nblk = N // P
    MP = 32
    SPB = P // MP  # sub-blocks per window block
    nsub = B * nblk * SPB

    rng = np.random.RandomState(0)
    local = rng.randint(0, W, size=(B, N, H_pad)).astype(np.int32)
    local[:, :, H:] = W
    infl = rng.rand(B, N, H_pad, K).astype(np.float32)
    infl[:, :, H:] = 0
    win_f = rng.randn(B, nblk, W, AC).astype(np.float32)
    win_c = rng.uniform(0, 3, size=(B, nblk, W, 3)).astype(np.float32)
    hi = win_c.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (win_c - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    win_g = np.concatenate([hi, lo, np.zeros_like(hi[..., :2])], -1)  # (.., 8)
    q = rng.uniform(0, 3, size=(B, N, 3)).astype(np.float32)
    kp = rng.uniform(-0.06, 0.06, size=(K, 3)).astype(np.float32)

    local_j = jax.device_put(jnp.asarray(local).reshape(nsub, MP, H_pad))
    infl_j = jax.device_put(
        jnp.asarray(infl, jnp.bfloat16).reshape(nsub, MP, H_pad, K)
    )
    winf_j = jax.device_put(jnp.asarray(win_f, jnp.bfloat16).reshape(B * nblk, W, AC))
    wincat_j = jax.device_put(
        jnp.concatenate(
            [jnp.asarray(win_f, jnp.bfloat16), jnp.asarray(win_g, jnp.bfloat16)], -1
        ).reshape(B * nblk, W, AC + 8)
    )
    q_j = jax.device_put(jnp.asarray(q, jnp.float32).reshape(nsub, MP, 3))
    kp_j = jax.device_put(
        jnp.asarray(np.concatenate([kp.T, [np.sum(kp**2, -1)]], 0))
    )  # (4, K)

    def bench(name, fn, *inputs):
        red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(args.reps):
            out = red(*inputs)
        np.asarray(out)
        ms = (time.time() - t0) / args.reps * 1000.0
        print(f"{name:52s} {ms:8.2f} ms")

    NHC = H_pad // HC

    # ---- B: one-hot gather matmul (+ h-sum so nothing is dead) ----
    def kb(local_ref, win_ref, o_ref):
        win = win_ref[0]
        acc = jnp.zeros((MP, AC), jnp.float32)
        for c in range(NHC):
            loc = local_ref[0, :, c * HC:(c + 1) * HC]
            iw = jax.lax.broadcasted_iota(jnp.int32, (MP, HC, W), 2)
            oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(MP * HC, W)
            g = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            acc += jnp.sum(g.reshape(MP, HC, AC), axis=1)
        o_ref[0] = acc.astype(o_ref.dtype)

    fb = pl.pallas_call(
        kb, grid=(nsub,),
        in_specs=[
            pl.BlockSpec((1, MP, H_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, AC), lambda i: (i // SPB, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, MP, AC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub, MP, AC), jnp.bfloat16),
    )
    bench("B one-hot gather matmul", fb, local_j, winf_j)

    # ---- C: + VPU influence contraction (loop over K) ----
    def kc(local_ref, win_ref, infl_ref, o_ref, acc_ref):
        win = win_ref[0]
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for c in range(NHC):
            loc = local_ref[0, :, c * HC:(c + 1) * HC]
            iw = jax.lax.broadcasted_iota(jnp.int32, (MP, HC, W), 2)
            oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(MP * HC, W)
            g = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            g = g.reshape(MP, HC, AC)
            ic = infl_ref[0, :, c * HC:(c + 1) * HC, :]  # (MP, HC, K)
            for k in range(K):
                acc_ref[:, k, :] += jnp.sum(
                    g * ic[:, :, k].astype(jnp.float32)[:, :, None], axis=1
                )
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    fc = pl.pallas_call(
        kc, grid=(nsub,),
        in_specs=[
            pl.BlockSpec((1, MP, H_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, AC), lambda i: (i // SPB, 0, 0)),
            pl.BlockSpec((1, MP, H_pad, K), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, MP, K, AC), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub, MP, K, AC), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((MP, K, AC), jnp.float32)],
    )
    bench("C + VPU-loop influence contraction", fc, local_j, winf_j, infl_j)

    # ---- C2: batched-dot contraction (current kernel style) ----
    def kc2(local_ref, win_ref, infl_ref, o_ref, acc_ref):
        win = win_ref[0]
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for c in range(NHC):
            loc = local_ref[0, :, c * HC:(c + 1) * HC]
            iw = jax.lax.broadcasted_iota(jnp.int32, (MP, HC, W), 2)
            oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(MP * HC, W)
            g = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            g = g.reshape(MP, HC, AC).astype(win.dtype)
            ic = infl_ref[0, :, c * HC:(c + 1) * HC, :]
            acc_ref[...] += jax.lax.dot_general(
                ic, g, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    fc2 = pl.pallas_call(
        kc2, grid=(nsub,),
        in_specs=[
            pl.BlockSpec((1, MP, H_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, AC), lambda i: (i // SPB, 0, 0)),
            pl.BlockSpec((1, MP, H_pad, K), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, MP, K, AC), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub, MP, K, AC), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((MP, K, AC), jnp.float32)],
    )
    bench("C2 + batched-dot contraction", fc2, local_j, winf_j, infl_j)

    # ---- D: fully fused (influence from hi/lo coords in-kernel) ----
    def kd(local_ref, win_ref, q_ref, kp_ref, o_ref, acc_ref):
        win = win_ref[0]  # (W, AC+8)
        q3 = q_ref[0]  # (MP, 3)
        kp3t = kp_ref[:3]  # (3, K)
        kp2 = kp_ref[3]
        qdotk = jnp.dot(q3, kp3t, preferred_element_type=jnp.float32)  # (MP, K)
        q2 = jnp.sum(q3 * q3, axis=-1)  # (MP,)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        sigma = 0.05
        for c in range(NHC):
            loc = local_ref[0, :, c * HC:(c + 1) * HC]
            iw = jax.lax.broadcasted_iota(jnp.int32, (MP, HC, W), 2)
            oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(MP * HC, W)
            g = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            gf = g[:, :AC].reshape(MP, HC, AC)
            nbr3 = g[:, AC:AC + 3] + g[:, AC + 3:AC + 6]  # hi + lo, (MP*HC, 3)
            n2 = jnp.sum(nbr3 * nbr3, axis=-1).reshape(MP, HC)
            ndq = jnp.sum(nbr3.reshape(MP, HC, 3) * q3[:, None, :], axis=-1)
            rel2 = n2 - 2.0 * ndq + q2[:, None]
            ndk = jnp.dot(nbr3, kp3t, preferred_element_type=jnp.float32)
            ndk = ndk.reshape(MP, HC, K)
            sq = jnp.maximum(
                rel2[:, :, None] - 2.0 * (ndk - qdotk[:, None, :]) + kp2, 0.0
            )
            ic = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
            ic = ic * (loc[:, :, None] < W).astype(jnp.float32)
            for k in range(K):
                acc_ref[:, k, :] += jnp.sum(gf * ic[:, :, k][:, :, None], axis=1)
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    fd = pl.pallas_call(
        kd, grid=(nsub,),
        in_specs=[
            pl.BlockSpec((1, MP, H_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, AC + 8), lambda i: (i // SPB, 0, 0)),
            pl.BlockSpec((1, MP, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, K), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, MP, K, AC), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nsub, MP, K, AC), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((MP, K, AC), jnp.float32)],
    )
    bench("D fully fused (coords+influence in-kernel)", fd, local_j, wincat_j,
          q_j, kp_j)

    # ---- E: existing windowed_gather_wf ----
    from se3et_tpu.ops.pallas import windowed_conv as wc

    local_e = jnp.asarray(local)
    infl_e = jnp.asarray(infl)
    win_e = jnp.asarray(win_f, jnp.bfloat16)
    bench(
        "E existing windowed_gather_wf (P=128)",
        lambda l, i, w: wc.windowed_gather_wf(l[:, :, :H], i[:, :, :H], w, hc=HC),
        local_e, infl_e, win_e,
    )


if __name__ == "__main__":
    main()

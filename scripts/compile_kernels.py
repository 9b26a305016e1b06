"""Standalone Mosaic compile check for the round-3 kernels at production
shapes — catches lowering errors in seconds instead of failing a ~25-min
full-graph bench compile."""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    rng = np.random.RandomState(0)

    def run(name, fn):
        t0 = time.time()
        try:
            out = fn()
            # slice on DEVICE before fetching (some outputs are ~0.5 GB and
            # the relay fetch crawls at ~100 MB/s)
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # flash RPE self-attention, equivariant production shape
    from se3et_tpu.ops.pallas import rpe_attention as fr

    # b=2: the serving path stacks both clouds' self layers into one batch
    b, ah, n, c, cc = 2, 24, 1024, 64, 256
    q = jnp.asarray(rng.randn(b, ah, n, c), jnp.bfloat16)
    qp = jnp.asarray(rng.randn(b, n, ah, cc), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(b, n, n, cc), jnp.bfloat16)
    km = jnp.asarray(np.arange(n) < 1000)[None] & jnp.ones((b, 1), bool)
    qw = jnp.asarray(rng.randn(b, 3, ah, n), jnp.float32)
    pts = jnp.asarray(rng.randn(b, 4, n), jnp.float32)
    run("flash RPE eq (B=2, AH=24, N=1024, C=256)",
        lambda: fr.rpe_self_attention(q, q, q, qp, emb, km, qw, pts,
                                      scale=0.125, block_m=128))
    run("flash RPE inv (AH=4)",
        lambda: fr.rpe_self_attention(q[:, :4], q[:, :4], q[:, :4],
                                      qp[:, :, :4], emb, km,
                                      scale=0.125, block_m=128))

    knn = jnp.asarray(rng.randn(b, n, 3, 3), jnp.float32)
    wde = jnp.asarray(rng.randn(cc, cc) * 0.05, jnp.float32)
    run("flash RPE femb eq (B=2, in-kernel embedding)",
        lambda: fr.rpe_self_attention_femb(
            q, q, q, qp, km, qw, pts, knn, wde, wde, scale=0.125,
            sigma_d=0.2, sigma_a=15.0))
    run("flash RPE femb inv (AH=4)",
        lambda: fr.rpe_self_attention_femb(
            q[:, :4], q[:, :4], q[:, :4], qp[:, :, :4], km, None, pts, knn,
            wde, wde, scale=0.125, sigma_d=0.2, sigma_a=15.0))

    def _rpe_bwd_eq():
        out, mx, sm = fr._rpe_fwd(q, q, q, qp, emb, km, qw, pts, scale=0.125,
                                  block_m=128)
        return fr._rpe_bwd(q, q, q, qp, emb,
                           km.astype(jnp.float32), qw, pts,
                           jnp.ones_like(out), out, mx, sm, scale=0.125,
                           block_n=64, block_m=128, interpret=False,
                           with_eq=True)

    run("flash RPE eq bwd", _rpe_bwd_eq)

    # kfirst conv + backward kernels at a stage-1-like shape
    from se3et_tpu.ops.pallas import windowed_conv as wc

    nq, h, k, w, ac = 9984, 32, 15, 640, 768
    nblk_q = nq // wc.QSEG
    local = jnp.asarray(rng.randint(0, w + 1, (1, nq, h)), jnp.int32)
    infl = jnp.asarray(rng.rand(1, nq, h, k), jnp.bfloat16)
    win = jnp.asarray(rng.randn(1, nblk_q, w, ac), jnp.bfloat16)
    run("wf kfirst (s1-like)",
        lambda: wc.windowed_gather_wf(local, infl, win, kfirst=True))
    d_out = jnp.asarray(rng.randn(1, nq, k * ac), jnp.bfloat16)
    run("wf bwd d_win",
        lambda: wc._wf_bwd_win(local, infl, d_out, nblk_q=nblk_q, w=w, k=k))
    # narrow non-lane-aligned AC (stage-0 training): the in-kernel
    # (MP, K*AC) -> (MP*K, AC) cast was illegal here (round 4)
    d192 = jnp.asarray(rng.randn(2, nq, k * 192), jnp.float32)
    i192 = jnp.asarray(rng.rand(2, nq, h, k), jnp.float32)
    l192 = jnp.asarray(rng.randint(0, 385, (2, nq, h)), jnp.int32)
    run("wf bwd d_win narrow (w=384, ac=192, f32)",
        lambda: wc._wf_bwd_win(l192, i192, d192, nblk_q=nblk_q, w=384, k=k))
    run("maxpool fwd", lambda: wc.windowed_max_pool(local, win, nq))
    try:
        out = wc.windowed_max_pool(local, win, nq)
        run("maxpool bwd",
            lambda: wc._max_bwd_win(local, win, out.astype(jnp.float32),
                                    jnp.ones((1, nq, ac), jnp.float32),
                                    nblk_q=nblk_q, h=h))
    except Exception as e:
        print(f"FAIL maxpool bwd (fwd failed): {str(e)[:200]}", flush=True)
    # fused conv + strided-skip max (round 5): exact production serving
    # shapes of the two fusing strided blocks (se3ete.3dmatch, sseg4 budgets)
    def _wf_max_case(b_, nq_, h_, w_, ac1_, ac2_, kfirst_):
        nblk = (nq_ + wc.QSEG - 1) // wc.QSEG
        l_ = jnp.asarray(rng.randint(0, w_ + 1, (b_, nq_, h_)), jnp.int32)
        i_ = jnp.asarray(rng.rand(b_, nq_, h_, k), jnp.bfloat16)
        w1_ = jnp.asarray(rng.randn(b_, nblk, w_, ac1_), jnp.bfloat16)
        w2_ = jnp.asarray(rng.randn(b_, nblk, w_, ac2_), jnp.bfloat16)
        return lambda: wc.windowed_gather_wf_max(l_, i_, w1_, w2_,
                                                 kfirst=kfirst_)

    run("wf+max fused s0->s1 (w=384, ac=192, ac2=768)",
        _wf_max_case(2, 10000, 24, 384, 192, 768, False))
    run("wf+max fused s1->s2 kfirst (w=640, ac=384, ac2=1536)",
        _wf_max_case(2, 2500, 32, 640, 384, 1536, True))

    # matmul-fused conv (round 5): exact production serving shapes of the
    # two shallow same-level conv families the fits-gate admits
    def _wf_mm_case(b_, nq_, h_, w_, ac_, aco_, kfirst_):
        nblk = (nq_ + wc.QSEG - 1) // wc.QSEG
        l_ = jnp.asarray(rng.randint(0, w_ + 1, (b_, nq_, h_)), jnp.int32)
        i_ = jnp.asarray(rng.rand(b_, nq_, h_, k), jnp.bfloat16)
        w1_ = jnp.asarray(rng.randn(b_, nblk, w_, ac_), jnp.bfloat16)
        r_ = jnp.asarray(rng.randn(k * ac_, aco_) * 0.05, jnp.bfloat16)
        return lambda: wc.windowed_gather_wf_mm(l_, i_, w1_, r_,
                                                kfirst=kfirst_)

    run("wf+mm fused s0 n (w=256, ac=192->192)",
        _wf_mm_case(2, 20000, 24, 256, 192, 192, False))
    run("wf+mm fused s1 n kfirst (w=384, ac=384->384)",
        _wf_mm_case(2, 10000, 32, 384, 384, 384, True))

    def _wf_max_mm_case(b_, nq_, h_, w_, ac1_, ac2_, aco_, kfirst_):
        nblk = (nq_ + wc.QSEG - 1) // wc.QSEG
        l_ = jnp.asarray(rng.randint(0, w_ + 1, (b_, nq_, h_)), jnp.int32)
        i_ = jnp.asarray(rng.rand(b_, nq_, h_, k), jnp.bfloat16)
        w1_ = jnp.asarray(rng.randn(b_, nblk, w_, ac1_), jnp.bfloat16)
        w2_ = jnp.asarray(rng.randn(b_, nblk, w_, ac2_), jnp.bfloat16)
        r_ = jnp.asarray(rng.randn(k * ac1_, aco_) * 0.05, jnp.bfloat16)
        return lambda: wc.windowed_gather_wf_max_mm(l_, i_, w1_, w2_, r_,
                                                    kfirst=kfirst_)

    run("wf+max+mm fused s0->s1 (w=384, ac=192->192, ac2=768)",
        _wf_max_mm_case(2, 10000, 24, 384, 192, 768, 192, False))
    # (s1->s2 strided at w=640/ac2=1536 does NOT fit the mm variant — the
    # fits gate keeps it on windowed_gather_wf_max; no smoke case)

    # deep-stage shapes: the widest training conv backward (w=512, ac=1536)
    ac2 = 1536
    win2 = jnp.asarray(rng.randn(1, nblk_q, 512, ac2), jnp.float32)
    loc2 = jnp.asarray(rng.randint(0, 513, (1, nq, h)), jnp.int32)
    d2 = jnp.asarray(rng.randn(1, nq, k * ac2), jnp.float32)
    i2 = jnp.asarray(rng.rand(1, nq, h, k), jnp.float32)
    run("wf bwd d_win deep (w=512, ac=1536, f32)",
        lambda: wc._wf_bwd_win(loc2, i2, d2, nblk_q=nblk_q, w=512, k=k))

    # embedding backward at production coarse shape
    from se3et_tpu.ops.pallas import embedding as pe

    n2, c2, kk = 1024, 256, 3
    pts2 = jnp.asarray(rng.rand(2, n2, 3), jnp.float32)
    knn = jnp.asarray(rng.rand(2, n2, kk, 3), jnp.float32)
    wd = jnp.asarray(rng.randn(c2, c2) * 0.05, jnp.float32)
    bd = jnp.zeros((c2,), jnp.float32)
    dout = jnp.asarray(rng.randn(2, n2, n2, c2), jnp.bfloat16)
    run("embedding bwd",
        lambda: pe._emb_bwd_call(pts2, knn, wd, wd, dout, sigma_d=0.2,
                                 sigma_a=15.0, d_index_max=48.0,
                                 interpret=False))


if __name__ == "__main__":
    main()

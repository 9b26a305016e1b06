"""Sweep the windowed-conv kernel's neighbor-chunk size (hc) at production shapes.

hc=8 was tuned when windows were W=2048 (SSEG=128); with 32-row segments the
windows are W=512-1024, so a full-H chunk (one big one-hot matmul + one
40-deep batched contraction per invocation, instead of 5 shallow ones) may
now fit VMEM and pipeline much better.  Times the three dominant conv sets
plus the s0->s1 maxpool skip.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--experiment", default="se3ete.3dmatch")
    parser.add_argument("--hcs", default="8,20,40")
    parser.add_argument("--mps", default="auto")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from se3et_tpu import precision as prec
    from se3et_tpu.core import kernel_points as kp_lib
    from se3et_tpu.data import pipeline as pipe
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.ops.pallas import windowed_conv as wc

    prec.set_compute_dtype("bfloat16")
    cfg = make_cfg(args.experiment)
    item = SyntheticPairDataset(num_pairs=1, num_points=cfg.data.point_limit, seed=0)[0]
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg.pipeline
    )
    from se3et_tpu.data.influence import precompute_influence

    precompute_influence(data, cfg.model)
    data = {k: jnp.asarray(v) for k, v in data.items()}

    def bench(name, fn, *inputs):
        red = jax.jit(
            lambda *a: jnp.sum(
                jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)
            )
        )
        np.asarray(red(*inputs))
        t0 = time.time()
        for _ in range(args.reps):
            out = red(*inputs)
        np.asarray(out)
        ms = (time.time() - t0) / args.reps * 1000.0
        print(f"{name:52s} {ms:8.2f} ms", flush=True)
        return ms

    m = cfg.model
    epn = m.epn
    a = epn.kanchor
    r0, s0 = m.init_radius, m.init_sigma
    d = m.init_dim
    rng = np.random.RandomState(0)

    hcs = [None if x == "auto" else int(x) for x in args.hcs.split(",")]
    mps = [None if x == "auto" else int(x) for x in args.mps.split(",")]

    cases = [
        ("s0 neighbors", "neighbors", 0, 0, r0, s0, d // 2),
        ("s1 sub", "subsampling", 1, 0, r0, s0, d // 2),
        ("s1 neighbors", "neighbors", 1, 1, r0 * 2, s0 * 2, d),
        ("s2 neighbors", "neighbors", 2, 2, r0 * 4, s0 * 4, d * 2),
    ]
    for label, set_name, st_q, st_s, radius, sigma, mid in cases:
        q = data[f"points_{st_q}"]
        sup = data[f"points_{st_s}"]
        suffix = str(st_q) if set_name == "neighbors" else str(st_s)
        segs = data[f"{set_name}_segs_{suffix}"]
        local = data[f"{set_name}_local_{suffix}"]
        sseg = int(data[f"{set_name}_wsseg_{suffix}"].shape[-1])
        kp = jnp.asarray(
            kp_lib.equivariant_kernel_points(
                radius, epn.num_kernel_points, epn.kanchor, epn.quotient_factor
            )
        )
        w_width = segs.shape[2] * sseg
        ac = a * mid
        print(f"--- {label}: Nq={q.shape[1]} Ns={sup.shape[1]} H={local.shape[2]} "
              f"W={w_width} AC={ac}", flush=True)

        def infl_fn(local, q, sup):
            win3 = wc.segment_window_gather(
                sup, segs, precision=jax.lax.Precision.HIGHEST, sseg=sseg
            )
            return wc.influence_windowed_pallas(
                local, q, win3, kp, sigma=float(sigma)
            )[0]

        infl = jax.jit(infl_fn)(local, q, sup)
        feats = jnp.asarray(
            rng.randn(2, sup.shape[1], ac).astype(np.float32), jnp.bfloat16
        )
        win = jax.jit(lambda f: wc.segment_window_gather(f, segs, sseg=sseg))(feats)

        for hc in hcs:
            for mp in mps:
                for kfirst in (False, True):
                    def conv_fn(local, infl, win, hc=hc, mp=mp, kf=kfirst):
                        return wc.windowed_gather_wf(local, infl, win, hc=hc,
                                                     mp=mp, kfirst=kf)
                    tag = (f"  wf hc={hc or 'auto'} mp={mp or 'auto'}"
                           f"{' kfirst' if kfirst else ''}")
                    try:
                        bench(tag, conv_fn, local, infl, win)
                    except Exception as e:
                        print(f"{tag:52s} FAIL {type(e).__name__}: "
                              f"{str(e)[:120]}", flush=True)

    # maxpool skip s0->s1
    segs0, local0 = data["subsampling_segs_0"], data["subsampling_local_0"]
    sseg0 = int(data["subsampling_wsseg_0"].shape[-1])
    nq1 = data["points_1"].shape[1]
    x0 = jnp.asarray(
        rng.randn(2, data["points_0"].shape[1], a * d * 2).astype(np.float32),
        jnp.bfloat16,
    )
    win0 = jax.jit(lambda f: wc.segment_window_gather(f, segs0, sseg=sseg0))(x0)
    print(f"--- maxpool s0->s1: AC={a * d * 2} W={segs0.shape[2] * sseg0}",
          flush=True)
    for hc in hcs:
        for mp in mps:
            def max_fn(local, win, hc=hc or 8, mp=mp):
                return wc.windowed_max_pool(local, win, nq1, hc=hc, mp=mp)
            tag = f"  maxpool hc={hc} mp={mp or 'auto'}"
            try:
                bench(tag, max_fn, local0, win0)
            except Exception as e:
                print(f"{tag:52s} FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()

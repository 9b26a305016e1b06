"""Per-piece timing of the E2PN backbone at production 3DMatch shapes.

Times, for every (stage, neighbor set): the windowed influence kernel, the
per-conv window feature gather + fused conv kernel, and the weight matmul;
plus the per-stage GroupNorm / unary / maxpool / upsample costs.  The sum
approximates the backbone section of profile_breakdown.py and attributes it.
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
    from se3et_tpu.nn.epn import max_pool_neighbors
    from se3et_tpu.nn.layers import MaskedGroupNorm
    from se3et_tpu.ops.pallas import windowed_conv as wc

    prec.set_compute_dtype("bfloat16")
    cfg = make_cfg(args.experiment)
    item = SyntheticPairDataset(num_pairs=1, num_points=cfg.data.point_limit, seed=0)[0]
    data = pipe.build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg.pipeline
    )
    from se3et_tpu.data.influence import precompute_influence

    precompute_influence(data, cfg.model)  # serving-path host geometry
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
        print(f"{name:48s} {ms:8.2f} ms")
        return ms

    m = cfg.model
    epn = m.epn
    a = epn.kanchor
    r0, s0 = m.init_radius, m.init_sigma
    d = m.init_dim
    rng = np.random.RandomState(0)

    # (label, set, stage_q, stage_s, radius, sigma, [conv mid-channels])
    cases = [
        ("s0 neighbors", "neighbors", 0, 0, r0, s0, [d // 2]),
        ("s1 sub", "subsampling", 1, 0, r0, s0, [d // 2]),
        ("s1 neighbors", "neighbors", 1, 1, r0 * 2, s0 * 2, [d, d]),
        ("s2 sub", "subsampling", 2, 1, r0 * 2, s0 * 2, [d]),
        ("s2 neighbors", "neighbors", 2, 2, r0 * 4, s0 * 4, [d * 2, d * 2]),
        ("s3 sub", "subsampling", 3, 2, r0 * 4, s0 * 4, [d * 2]),
        ("s3 neighbors", "neighbors", 3, 3, r0 * 8, s0 * 8, [d * 4, d * 4]),
    ]
    total = 0.0
    for label, set_name, st_q, st_s, radius, sigma, mids in cases:
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
        print(f"--- {label}: Nq={q.shape[1]} Ns={sup.shape[1]} H={local.shape[2]} "
              f"W={w_width} mids={mids}")

        def infl_fn(local, q, sup):
            win3 = wc.segment_window_gather(
                sup, segs, precision=jax.lax.Precision.HIGHEST, sseg=sseg
            )
            return wc.influence_windowed_pallas(
                local, q, win3, kp, sigma=float(sigma)
            )[0]

        ms = bench("  influence kernel (once/set)", infl_fn, local, q, sup)
        total += ms
        infl = jax.jit(infl_fn)(local, q, sup)

        for mid in mids:
            ac = a * mid
            feats = jnp.asarray(
                rng.randn(2, sup.shape[1], ac).astype(np.float32), jnp.bfloat16
            )

            def conv_fn(feats, infl):
                win = wc.segment_window_gather(feats, segs, sseg=sseg)
                return wc.windowed_gather_wf(local, infl, win)

            ms = bench(f"  conv windowed (AC={ac})", conv_fn, feats, infl)
            total += ms

            wf = jax.jit(conv_fn)(feats, infl)
            k = epn.num_kernel_points
            rhs = jnp.asarray(
                rng.randn(k * a * mid, a * mid).astype(np.float32), jnp.bfloat16
            )

            def wmat(wf, rhs):
                lhs = prec.cast_feature(wf).reshape(wf.shape[0], wf.shape[1], -1)
                return jnp.einsum("bnm,mo->bno", lhs, rhs)

            ms = bench(f"  weight matmul (KAC={k*a*mid})", wmat, wf, rhs)
            total += ms

    # normalization / glue at the two big stages
    gn = MaskedGroupNorm(m.group_norm)
    for st, ch in ((0, d * 2), (1, d * 4)):
        n = data[f"points_{st}"].shape[1]
        x = jnp.asarray(rng.randn(2, n, a, ch).astype(np.float32))
        msk = data[f"masks_{st}"]
        p = gn.init(jax.random.PRNGKey(0), x, msk)
        ms = bench(f"GroupNorm s{st} (N={n}, C={ch})", lambda x, msk: gn.apply(p, x, msk), x, msk)
        total += ms

    # strided skip maxpool s0->s1
    x0 = jnp.asarray(rng.randn(2, data["points_0"].shape[1], a, d * 2).astype(np.float32), jnp.bfloat16)
    ms = bench("maxpool skip s0->s1 (gather)", lambda x, idx: max_pool_neighbors(x, idx),
               x0, data["subsampling_0"])

    def wmax(x, segs, local):
        b, ns, a_dim, ch = x.shape
        sseg0 = int(data["subsampling_wsseg_0"].shape[-1])
        win = wc.segment_window_gather(x.reshape(b, ns, a_dim * ch), segs,
                                       sseg=sseg0)
        return wc.windowed_max_pool(local, win, data["points_1"].shape[1])

    ms = bench("maxpool skip s0->s1 (windowed)", wmax, x0,
               data["subsampling_segs_0"], data["subsampling_local_0"])
    total += ms

    print(f"{'--- sum of measured pieces':48s} {total:8.2f} ms")


if __name__ == "__main__":
    main()

"""Per-section timing of the SE3ET-E forward at production 3DMatch shapes.

Sections are jitted separately over host-fed intermediates, each synced by a
small host transfer (block_until_ready is unreliable on the remote-TPU
backend).  Prints ms per section; the sum approximates the full forward.

Usage: python scripts/profile_breakdown.py [--reps 10] [--experiment NAME]
"""

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", default="se3ete.3dmatch")
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--num_points", type=int, default=None)
    args = parser.parse_args(argv)

    import jax

    cache_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.pipeline import build_pair_pyramid
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn import matching as matching_lib
    from se3et_tpu.nn.init_util import jit_init
    from se3et_tpu.nn.model import SE3ETModel
    from se3et_tpu.ops import geometry

    cfg = make_cfg(args.experiment)
    c = cfg.model
    num_points = args.num_points or cfg.data.point_limit
    item = SyntheticPairDataset(num_pairs=1, num_points=num_points, seed=0)[0]
    data = build_pair_pyramid(
        item["ref_points"], item["src_points"], item["transform"], cfg.pipeline
    )
    from se3et_tpu.data.influence import precompute_influence

    precompute_influence(data, cfg.model)  # serving-path host geometry
    data = {k: jnp.asarray(v) for k, v in data.items()}

    model = SE3ETModel(c)
    rngs = {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)}
    params = jit_init(model, rngs, data, train=False, with_registration=False)

    def bench(name, fn, *inputs, sync=None, reps=args.reps):
        out = fn(*inputs)
        (sync or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]))(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*inputs)
        (sync or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]))(out)
        ms = (time.time() - t0) / reps * 1000.0
        print(f"{name:34s} {ms:8.2f} ms")
        return out, ms

    coarse = c.num_stages - 1
    fine = 1
    points_c, masks_c = data[f"points_{coarse}"], data[f"masks_{coarse}"]
    points_f, masks_f = data[f"points_{fine}"], data[f"masks_{fine}"]

    total = 0.0

    # 1. point-to-node partition
    @jax.jit
    def p2n_fn(points_f, points_c, masks_f, masks_c):
        return jax.vmap(
            geometry.point_to_node_partition, in_axes=(0, 0, None, 0, 0)
        )(points_f, points_c, c.num_points_in_patch, masks_f, masks_c)

    (p2n, node_masks, knn_idx, knn_masks), ms = bench(
        "point_to_node_partition", p2n_fn, points_f, points_c, masks_f, masks_c
    )
    total += ms

    knn_points = jax.jit(jax.vmap(geometry.gather_with_sentinel))(points_f, knn_idx)

    # 2. gt overlaps (training/eval only; serving skips)
    @jax.jit
    def gt_fn(points_c, knn_points, transform, node_masks, knn_masks):
        return matching_lib.node_correspondences(
            points_c[0], points_c[1], knn_points[0], knn_points[1], transform,
            c.ground_truth_matching_radius, node_masks[0], node_masks[1],
            knn_masks[0], knn_masks[1], num_candidates=c.gt_candidates,
        )

    _, ms = bench("gt node_correspondences", gt_fn, points_c, knn_points,
                  data["transform"], node_masks, knn_masks)
    # not counted in total: bench path uses with_gt=False

    # 3. backbone
    @jax.jit
    def backbone_fn(params, data):
        from se3et_tpu import precision as prec_mod

        prec_mod.set_compute_dtype(c.compute_dtype)
        if c.backbone == "e2pn":
            return model.apply(
                params, data["features"], data,
                method=lambda m, f, d: m.backbone_net(f, d, fused=True),
            )
        return model.apply(
            params, data["features"], data,
            method=lambda m, f, d: m.backbone_net(f, d),
        )

    (feats_f, feats_c), ms = bench("backbone", backbone_fn, params, data)
    total += ms
    feats_f = jax.device_put(np.asarray(feats_f, np.float32))
    feats_c = jax.device_put(np.asarray(feats_c, np.float32))

    # 4. transformer
    normals_c = data.get(f"normals_{coarse}")

    @jax.jit
    def transformer_fn(params, points_c, feats_c, masks_c):
        from se3et_tpu import precision as prec_mod

        prec_mod.set_compute_dtype(c.compute_dtype)
        return model.apply(
            params, points_c, feats_c, masks_c,
            method=lambda m, pc, fc, mc: m.transformer(
                pc[0][None], pc[1][None], fc[0][None], fc[1][None],
                ref_masks=mc[0][None], src_masks=mc[1][None],
                ref_normal=None if normals_c is None else normals_c[0][None],
                src_normal=None if normals_c is None else normals_c[1][None],
                fused_embedding=True,
            ),
        )

    tf_out, ms = bench("transformer", transformer_fn, params, points_c, feats_c,
                       masks_c)
    total += ms
    ref_feats_c = np.asarray(tf_out[0][0], np.float32)
    src_feats_c = np.asarray(tf_out[1][0], np.float32)
    ref_feats_c /= np.linalg.norm(ref_feats_c, axis=-1, keepdims=True) + 1e-12
    src_feats_c /= np.linalg.norm(src_feats_c, axis=-1, keepdims=True) + 1e-12
    ref_feats_c = jax.device_put(ref_feats_c)
    src_feats_c = jax.device_put(src_feats_c)

    # 5. superpoint matching + patch gather + sinkhorn
    @jax.jit
    def match_fn(ref_feats_c, src_feats_c, node_masks, knn_idx, knn_masks,
                 knn_points, feats_f):
        ref_idx, src_idx, corr_scores, corr_valid = matching_lib.superpoint_matching(
            ref_feats_c, src_feats_c, node_masks[0], node_masks[1],
            c.num_correspondences, c.dual_normalization,
        )
        sel_ref_knn_idx = knn_idx[0][ref_idx]
        sel_src_knn_idx = knn_idx[1][src_idx]
        sel_ref_knn_masks = knn_masks[0][ref_idx] & corr_valid[:, None]
        sel_src_knn_masks = knn_masks[1][src_idx] & corr_valid[:, None]
        sel_ref_knn_points = knn_points[0][ref_idx]
        sel_src_knn_points = knn_points[1][src_idx]
        f_ref = geometry.gather_with_sentinel(feats_f[0], sel_ref_knn_idx)
        f_src = geometry.gather_with_sentinel(feats_f[1], sel_src_knn_idx)
        scores = jnp.einsum("pnd,pmd->pnm", f_ref, f_src) / jnp.sqrt(
            jnp.asarray(feats_f.shape[-1], jnp.float32)
        )
        return (scores, sel_ref_knn_points, sel_src_knn_points,
                sel_ref_knn_masks, sel_src_knn_masks)

    (scores, rp, sp, rm, sm), ms = bench(
        "superpoint match + patch gather", match_fn, ref_feats_c, src_feats_c,
        node_masks, knn_idx, knn_masks, knn_points, feats_f,
    )
    total += ms

    from se3et_tpu.nn.matching import LearnableLogOptimalTransport

    ot = LearnableLogOptimalTransport(c.num_sinkhorn_iterations)
    ot_params = ot.init(jax.random.PRNGKey(0), scores, rm, sm)

    @jax.jit
    def sinkhorn_fn(scores, rm, sm):
        return ot.apply(ot_params, scores, rm, sm, use_fused=True)

    matching_scores, ms = bench("sinkhorn (fused)", sinkhorn_fn, scores, rm, sm)
    total += ms

    # 6. LGR
    @jax.jit
    def lgr_fn(rp, sp, rm, sm, matching_scores):
        return matching_lib.local_global_registration(
            rp, sp, rm, sm, matching_scores,
            k=c.fine_topk, acceptance_radius=c.acceptance_radius,
            mutual=c.mutual, confidence_threshold=c.confidence_threshold,
            use_dustbin=c.use_dustbin,
            correspondence_threshold=c.correspondence_threshold,
            correspondence_limit=c.correspondence_limit,
            num_refinement_steps=c.num_refinement_steps,
        )

    _, ms = bench("LGR", lgr_fn, rp, sp, rm, sm, matching_scores)
    total += ms

    print(f"{'--- sum (serving sections)':34s} {total:8.2f} ms")

    # full forward for comparison
    @jax.jit
    def full_fn(params, data):
        return model.apply(params, data, train=False, with_registration=True,
                           with_gt=False)

    bench("full forward (with_gt=False)", full_fn, params, data,
          sync=lambda o: np.asarray(o["estimated_transform"]))


if __name__ == "__main__":
    main()

"""Mosaic pattern probes: compile tiny single-pattern Pallas kernels on the
real TPU to pinpoint which VPU/MXU idiom crashes the compile helper.

Round-4 motivation: the flash-RPE eq path (`ops/pallas/rpe_attention.py`)
fails with an opaque `tpu_compile_helper subprocess exit code 1` while the
inv path lowers.  The eq-only constructs are (a) lane-dim-1 insert + double
broadcast pairwise diffs, (b) a sublane concatenate into (bn, 3, bm), (c) an
n-batched 3-wide dot_general.  Each probe isolates one construct; the "new"
probes validate the matmul-expansion replacements before a rewrite.

Usage: python scripts/mosaic_probe.py [probe ...]   (default: all)
"""

import functools
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

BN, BM, AH = 64, 128, 24


def main(names):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    cache_dir = osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    rng = np.random.RandomState(0)

    a2 = jnp.asarray(rng.randn(BN, BM), jnp.float32)
    vn = jnp.asarray(rng.randn(8, BN), jnp.float32)
    vm = jnp.asarray(rng.randn(16, BM), jnp.float32)
    qw = jnp.asarray(rng.randn(BN, 3, AH), jnp.float32)
    qw8 = jnp.asarray(rng.randn(AH, BN, 8), jnp.float32)
    s3 = jnp.asarray(rng.randn(AH, BN, BM), jnp.float32)

    def probe(name, fn, *args):
        if names and name not in names:
            return
        t0 = time.time()
        try:
            out = pl.pallas_call(
                fn, out_shape=jax.ShapeDtypeStruct((BN, BM), jnp.float32)
            )(*args)
            np.asarray(out[..., :1])
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — diagnostic tool
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # --- suspects (current eq-path constructs) ---

    def k_pairdiff(vn_ref, vm_ref, o_ref):
        # (bn,)[:, None] - (bm,)[None, :]: lane-dim-1 insert, double broadcast
        dx = vn_ref[0][:, None] - vm_ref[0][None, :]
        dy = vn_ref[1][:, None] - vm_ref[1][None, :]
        dz = vn_ref[2][:, None] - vm_ref[2][None, :]
        o_ref[...] = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    probe("pairdiff lane-insert", k_pairdiff, vn, vm)

    def k_concat3(vn_ref, vm_ref, o_ref):
        # concatenate three (bn, 1, bm) slabs into (bn, 3, bm)
        dx = vn_ref[0][:, None] - vm_ref[0][None, :]
        sh = jnp.concatenate(
            [dx[:, None, :], (dx * 2)[:, None, :], (dx * 3)[:, None, :]],
            axis=1,
        )
        o_ref[...] = jnp.sum(sh, axis=1)

    probe("concat3 (bn,3,bm)", k_concat3, vn, vm)

    def k_batcheddot(qw_ref, a_ref, o_ref):
        # n-batched (3, ah) x (3, bm) dot_general, 64 tiny batches
        sh = jnp.stack([a_ref[...], a_ref[...] * 2, a_ref[...] * 3], axis=1)
        r = jax.lax.dot_general(
            qw_ref[...], sh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bn, ah, bm)
        o_ref[...] = jnp.sum(r, axis=1)

    probe("batched dot (bn,3,ah)x(bn,3,bm)", k_batcheddot, qw, a2)

    # --- replacements (matmul-expansion formulation) ---

    def k_geomm(vn_ref, vm_ref, o_ref):
        # r^2 via one (8, bn)^T @ (8, bm) matmul — no inserts
        r2 = jax.lax.dot_general(
            vn_ref[...], vm_ref[8:16], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = jnp.sqrt(jnp.maximum(r2, 0.0))

    probe("geom matmul r2", k_geomm, vn, vm)

    def k_foldmm(qw8_ref, vm_ref, o_ref):
        # (ah*bn, 8) @ (8, bm) with leading-dim merge + split
        pre = jax.lax.dot_general(
            qw8_ref[...].reshape(AH * BN, 8), vm_ref[0:8],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(AH, BN, BM)
        o_ref[...] = jnp.sum(pre, axis=0)

    probe("folded matmul (ah*bn,8)@(8,bm)", k_foldmm, qw8, vm)

    def k_leadbcast(qw8_ref, vm_ref, a_ref, o_ref):
        # rinv[None] leading-insert broadcast against (ah, bn, bm)
        pre = jax.lax.dot_general(
            qw8_ref[...].reshape(AH * BN, 8), vm_ref[0:8],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(AH, BN, BM)
        o_ref[...] = jnp.sum(a_ref[None] * pre, axis=0)

    probe("leading broadcast rinv[None]*pre", k_leadbcast, qw8, vm, a2)

    def k_bwdfold(s3_ref, a_ref, vm_ref, o_ref):
        # bwd: (ah*bn, bm) @ (8, bm)^T contraction -> (ah, bn, 8)
        dsr = s3_ref[...] * a_ref[None]
        d8 = jax.lax.dot_general(
            dsr.reshape(AH * BN, BM), vm_ref[0:8],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(AH, BN, 8)
        o_ref[...] = jnp.zeros((BN, BM), jnp.float32) + jnp.sum(
            d8, axis=(0, 2)
        )[:, None]

    probe("bwd fold (ah*bn,bm)@(8,bm)^T", k_bwdfold, s3, a2, vm)


if __name__ == "__main__":
    main(set(sys.argv[1:]))

r"""E2PN anchor-equivariant KPConv backbone (flax.linen, TPU-first).

TPU-native re-design of ``geotransformer/modules/e2pn/blocks_epn.py``.  The
reference implements the E2PN convolution with per-layer index gathers over the
weight tensor (``kidx_rot``/``ridx_rot``/``kridx_rot_lin``, four alternative
code paths).  Here the entire rotate-by-permute machinery is folded at
construction time into a **single static gather index** ``wg_index[r, k, a] ->
fold(kidx_rot[r,k]) * A + ridx_rot[a,r]`` so the forward pass is:

1. one neighbor gather + one influence-weight matmul (distances to the K kernel
   points),
2. one einsum  ``wf[b,n,k,a,c] = sum_m x[nbr] * w``,
3. one big MXU matmul ``(B*N, K*A*Cin) @ (K*A*Cin, R*Cout)`` against the
   gathered weight — the kernel-permutation, anchor-permutation, and
   steerability-fold logic all live inside the gather that builds the RHS.

Derivation (matches the reference permute path, ``blocks_epn.py:497-514``):

    out[p, r, d] = sum_{k,a,c} wf[p,k,a,c] * W[fold(kidx_rot[r,k]), ridx_rot[a,r], c, d]

where ``kidx_rot[r,k1] = k2`` s.t. ``kernel[k2] = R_r^{-1} kernel[k1]`` and
``ridx_rot[a,r] = b`` s.t. ``R_r R_b ∈ R_a H`` (H the quotient subgroup).
Equivalence with the rotate path (``feat_gather_by_rot``) follows from the two
permutation substitutions; the group-closure asserts are enforced at table
construction (:mod:`se3et_tpu.core.anchors`) and by tests.

All feature tensors carry a leading cloud/batch axis: ``x (B, N, A, C)``,
``neighbors (B, N, K_nb)`` with per-cloud sentinel ``N``.
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.core import kernel_points as kp_lib
from se3et_tpu import precision as prec
from se3et_tpu.nn.layers import MaskedGroupNorm, TorchLinear, UnaryBlock

_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class EPNConfig:
    """Equivariant-conv hyperparameters (cf. ``config.py`` `_C.epn`)."""

    kanchor: int = 6
    quotient_factor: int = 4
    num_kernel_points: int = 15
    non_sep_conv: bool = True
    rot_by_permute: bool = True
    fixed_kernel_points: str = "center"
    ignore_steer_constraint: bool = False
    # 'exact': weights tied over joint H-orbits of (kernel pt, rel anchor) —
    # exactly equivariant (improvement over the reference).  'relaxed': the
    # reference's parametrization (kernel-orbit fold only, approximately
    # equivariant, cf. blocks_epn.py:236-258).
    steerability: str = "exact"
    epn_kernel: bool = False
    att_pooling: bool = False
    att_permute: bool = False
    dual_feature: bool = False
    kp_influence: str = "linear"
    aggregation_mode: str = "sum"
    # windowed-conv contraction order: K-first scatters influence into the
    # window axis before the gather matmul — MP*K rows instead of MP*HC on
    # the dominant matmul (ops/pallas/windowed_conv._wf_kernel_kfirst).
    # ``wf_kfirst`` forces it everywhere; ``wf_kfirst_min_ac`` auto-enables
    # it per conv when the gathered channel width A*Cin reaches the
    # threshold — the round-4 chip A/B (scripts/bench_wf_hc.py) showed
    # kfirst wins only on wide sets (AC=384: 4.80->4.65 ms, AC=768:
    # 3.15->2.64) and loses on narrow ones (AC=192: 5.81->6.22); 0 = never.
    wf_kfirst: bool = False
    wf_kfirst_min_ac: int = 384

    @property
    def space(self) -> anchor_lib.AnchorSpace:
        return anchor_lib.get_anchor_space(self.kanchor, self.quotient_factor)


def _influence_weights(
    q_points, s_points, neighbor_indices, kernel_points, sigma, influence="linear"
):
    """Kernel-point influence weights w[b, n, h, k], shadow neighbors zeroed.

    Reference: ``blocks_epn.py:341-366`` (linear influence
    ``clamp(1 - d/sigma, 0)``).
    """
    num_s = s_points.shape[1]
    safe = jnp.clip(neighbor_indices, 0, num_s - 1)
    nbr = jnp.take_along_axis(
        s_points, safe.reshape(safe.shape[0], -1, 1), axis=1
    ).reshape(safe.shape + (3,))
    valid = neighbor_indices < num_s
    rel = nbr - q_points[:, :, None, :]  # (B, Nq, H, 3)
    # |rel - kp|^2 = |rel|^2 - 2 rel.kp + |kp|^2   (avoids a 5-D diff tensor)
    rel2 = jnp.sum(rel**2, axis=-1, keepdims=True)
    cross = jnp.einsum("bnhc,kc->bnhk", rel, kernel_points, precision=_PREC)
    kp2 = jnp.sum(kernel_points**2, axis=-1)
    sq = jnp.maximum(rel2 - 2.0 * cross + kp2, 0.0)
    if influence == "linear":
        w = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
    elif influence == "constant":
        w = jnp.ones_like(sq)
    elif influence == "gaussian":
        sig2 = (sigma * 0.3) ** 2
        w = jnp.exp(-sq / (2.0 * sig2))
    else:
        raise ValueError(influence)
    return w * valid[..., None]


class KPConvInterSO3(nn.Module):
    """E2PN inter-point equivariant convolution (non-separable, permute path)."""

    in_channels: int
    out_channels: int
    radius: float
    sigma: float
    config: EPNConfig

    def setup(self):
        cfg = self.config
        space = cfg.space
        if cfg.kanchor == 1:
            kp = kp_lib.load_kernels(
                self.radius, cfg.num_kernel_points, fixed=cfg.fixed_kernel_points
            )
            self.kernel_points = jnp.asarray(kp)
            self.num_k_real = cfg.num_kernel_points
            self.wg_index = None
        elif cfg.fixed_kernel_points == "verticals":
            # EPN/E2PN SO(2) mode: C_m-symmetric kernel about z
            m = cfg.kanchor * cfg.quotient_factor
            kp = kp_lib.so2_symmetric_kernel_points(
                self.radius, cfg.num_kernel_points, m
            )
            kidx_rot, fold, num_real = kp_lib.kernel_permutation_tables(
                kp, space, cfg.ignore_steer_constraint, radius=self.radius
            )
            a = cfg.kanchor
            idx = fold[kidx_rot][:, :, None] * a + space.ridx_rot.T[:, None, :]
            self.num_weight_blocks = num_real * a
            self.kernel_points = jnp.asarray(kp)
            self.num_k_real = num_real
            self.wg_index = jnp.asarray(idx.astype(np.int32))
        else:
            kp = kp_lib.equivariant_kernel_points(
                self.radius, cfg.num_kernel_points, cfg.kanchor, cfg.quotient_factor
            )
            kidx_rot, fold, num_real = kp_lib.kernel_permutation_tables(
                kp, space, cfg.ignore_steer_constraint, radius=self.radius
            )
            a = cfg.kanchor
            if cfg.steerability == "exact" and cfg.non_sep_conv:
                class_idx, num_classes = kp_lib.joint_steerability_classes(kp, space)
                # wg_index[r, k, a] = class(kidx_rot[r,k], ridx_rot[a,r])
                idx = class_idx[kidx_rot[:, :, None], space.ridx_rot.T[:, None, :]]
                self.num_weight_blocks = num_classes
            else:
                # reference parametrization: fold(kidx) x free anchor axis
                idx = fold[kidx_rot][:, :, None] * a + space.ridx_rot.T[:, None, :]
                self.num_weight_blocks = num_real * a
            self.kernel_points = jnp.asarray(kp)
            self.num_k_real = num_real
            self.wg_index = jnp.asarray(idx.astype(np.int32))  # (R=A, K, A)

        if cfg.kanchor != 1 and cfg.non_sep_conv:
            # (KA, R*O) 0/1 class-reduction matrix for the factored weight
            # contraction: column r*O+o selects the (k, a) pairs whose tied
            # weight block is o for output anchor r.  Built from the numpy
            # table (setup may run under trace; jnp attrs become tracers).
            idx_np = idx.astype(np.int64)  # (R, K, A)
            r_dim, kk, aa = idx_np.shape
            num_o = self.num_weight_blocks
            m = np.zeros((kk * aa, r_dim * num_o), np.float32)
            for r in range(r_dim):
                flat = idx_np[r].reshape(-1)  # (KA,) in (k, a) order
                m[np.arange(kk * aa), r * num_o + flat] = 1.0
            self.reduce_mats = jnp.asarray(m)

        k = cfg.num_kernel_points
        a = cfg.kanchor
        if cfg.kanchor == 1 or not cfg.non_sep_conv:
            w_shape = (k, self.in_channels, self.out_channels)
            fan_in = self.in_channels * self.out_channels
        else:
            w_shape = (self.num_weight_blocks, self.in_channels, self.out_channels)
            # match the reference's kaiming bound on (K_real, A, Cin, Cout):
            # torch fan_in = prod(shape[1:]) = A * Cin * Cout
            fan_in = a * self.in_channels * self.out_channels
        bound = 1.0 / np.sqrt(fan_in)
        self.weights = self.param(
            "weights",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            w_shape,
        )

    def _expanded_rhs(self, k, a, a_dim, cin):
        """(K*A*Cin, A*Cout) expanded effective weight for the one-matmul
        contraction (path (a) below) — flat (k, a, c) major order matches
        the windowed kernels' flat wf output."""
        wg = prec.cast_feature(self.weights)[self.wg_index]
        return jnp.transpose(wg, (1, 2, 3, 0, 4)).reshape(
            k * a_dim * cin, a * self.out_channels
        )

    def __call__(self, x, q_points, s_points, neighbor_indices, influence=None,
                 ones_input=False, window=None, max_payload=None,
                 fuse_wmm=False):
        """x: (B, Ns, A, Cin) -> (B, Nq, A, Cout).

        ``fuse_wmm``: serving-only — when the windowed path, the expanded
        weight contraction (kanchor>1, non_sep_conv, cin<256) and the VMEM
        fit (:func:`windowed_conv.windowed_wf_mm_fits`) all apply, run the
        conv as ONE matmul-fused kernel
        (:func:`windowed_conv.windowed_gather_wf_mm`): the (B, Nq, K*A*Cin)
        wf intermediate is never written to HBM.  No VJP — callers pass it
        only on the serving route (``pool_mode == 'fused'``).

        ``max_payload``: optional (B, Ns, AC2) flat features to skip-max-pool
        over the SAME window maps inside the conv kernel
        (:func:`windowed_conv.windowed_gather_wf_max` — the strided
        bottleneck's skip path shares the conv's neighbor one-hots).  When
        given, the call returns ``(out, pooled (B, Nq, AC2))``; the caller
        must gate on ``windowed_wf_max_fits`` and pass it only on the
        serving path (the fused kernel has no VJP).

        ``window``: optional ``(seg_idx (B, nblk_q, S), local (B, Nq, H),
        sseg)`` per-set window maps from ``pipeline.build_window_maps``
        (``sseg`` = the static segment granularity they were built at) — the neighbor
        gather + influence contraction run as the fused windowed Pallas kernel
        (:func:`se3et_tpu.ops.pallas.windowed_conv.windowed_gather_wf`): a
        segment one-hot matmul materializes per-block source windows, then the
        kernel builds neighbor one-hots in VMEM and contracts with the
        influence weights — no per-row gathers anywhere (XLA row gathers cost
        ~8.4 ns/row regardless of width; see BENCH.md).  A shared per-set
        dense gather-matrix variant (``M[p,k,w] = sum_h onehot*infl``, conv =
        ``M @ window``) was built and measured slower: the M build is
        dominated by per-row batched tiny dots (31 ms at stage-0 production
        shapes) and M apply by its 2.4 GB HBM footprint (19 ms vs 13 ms for
        this kernel).

        ``influence``: optional precomputed (B, Nq, H, K) kernel-point weights —
        geometry-only, so the backbone computes them once per (stage, neighbor
        set) and shares them across the convs of that stage.

        ``ones_input``: the input features are the constant 1 (the reference
        feeds all-ones input features, ``dataset.py ref_feats=ones``) — the
        neighbor gather and the wf einsum collapse to a sum of influence
        weights over valid neighbors, skipping ~N*H row gathers entirely.
        """
        cfg = self.config
        num_s = s_points.shape[1]
        a_dim, cin = x.shape[2], x.shape[3]
        pooled = None
        w = influence
        if w is None:
            w = _influence_weights(
                q_points, s_points, neighbor_indices, self.kernel_points,
                self.sigma, cfg.kp_influence,
            )  # (B, Nq, H, K)
        w = prec.cast_feature(w)
        if ones_input:
            # x == 1 and invalid-neighbor weights are already zero:
            # wf[b,n,k,a,c] = sum_h w[b,n,h,k]
            inf_sum = jnp.sum(w, axis=2)  # (B, Nq, K)
            wf = jnp.broadcast_to(
                inf_sum[:, :, :, None, None],
                inf_sum.shape + (a_dim, cin),
            )
            wf_flat = None
        elif window is not None:
            from se3et_tpu.ops.pallas import windowed_conv as wc

            seg_idx, local = window[0], window[1]
            x = prec.cast_feature(x)
            win = wc.segment_window_gather(
                x.reshape(x.shape[0], num_s, a_dim * cin), seg_idx,
                sseg=_win_sseg(window),
            )
            kfirst = cfg.wf_kfirst or (
                0 < cfg.wf_kfirst_min_ac <= a_dim * cin
            )
            pooled = None
            if (fuse_wmm and max_payload is None and cfg.kanchor > 1
                    and cfg.non_sep_conv and cin < 256
                    and os.environ.get("SE3ET_WF_MM", "on") != "off"):
                kk, a = cfg.num_kernel_points, cfg.kanchor
                rhs = self._expanded_rhs(kk, a, a_dim, cin)
                if wc.windowed_wf_mm_fits(
                    win.shape[2], a_dim * cin, rhs.shape[1],
                    local.shape[2], kk, kfirst,
                ):
                    wc.TRACE_MM_FLOPS.append(
                        2.0 * x.shape[0] * local.shape[1]
                        * rhs.shape[0] * rhs.shape[1]
                    )
                    out = wc.windowed_gather_wf_mm(
                        local, w, win, rhs, kfirst=kfirst,
                        interpret=jax.default_backend() != "tpu",
                    )  # (B, Nq, A*Cout) f32
                    return out.reshape(
                        out.shape[0], out.shape[1], a, self.out_channels
                    )
            if max_payload is not None:
                win2 = wc.segment_window_gather(
                    prec.cast_feature(max_payload), seg_idx,
                    sseg=_win_sseg(window),
                )
                if (fuse_wmm and cfg.kanchor > 1 and cfg.non_sep_conv
                        and cin < 256
                        and os.environ.get("SE3ET_WF_MM", "on") != "off"):
                    kk, a = cfg.num_kernel_points, cfg.kanchor
                    rhs = self._expanded_rhs(kk, a, a_dim, cin)
                    if wc.windowed_wf_max_mm_fits(
                        win.shape[2], a_dim * cin, win2.shape[3],
                        rhs.shape[1], local.shape[2], kk, kfirst,
                    ):
                        wc.TRACE_MM_FLOPS.append(
                            2.0 * x.shape[0] * local.shape[1]
                            * rhs.shape[0] * rhs.shape[1]
                        )
                        out, pooled = wc.windowed_gather_wf_max_mm(
                            local, w, win, win2, rhs, kfirst=kfirst,
                            interpret=jax.default_backend() != "tpu",
                        )
                        out = out.reshape(
                            out.shape[0], out.shape[1], a, self.out_channels
                        )
                        return out, pooled
                wf_flat, pooled = wc.windowed_gather_wf_max(
                    local, w, win, win2, kfirst=kfirst,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                wf_flat = wc.windowed_gather_wf_trainable(
                    local, w, win, kfirst,
                    jax.default_backend() != "tpu",
                )  # (B, Nq, K*A*Cin), already weight-matmul-ready
                # (custom VJP: training differentiates through the fused
                # kernel — backward-by-features is the K-first
                # scatter-transpose matmul)
            wf_flat = prec.cast_feature(wf_flat)
            wf = None  # only materialized (relayout!) on the shared-weight path
        else:
            safe = jnp.clip(neighbor_indices, 0, num_s - 1)
            x = prec.cast_feature(x)
            flat = x.reshape(x.shape[0], num_s, a_dim * cin)
            nbr_x = jnp.take_along_axis(
                flat,
                safe.reshape(safe.shape[0], -1, 1).astype(jnp.int32),
                axis=1,
            ).reshape(safe.shape + (a_dim, cin))
            nbr_x = jnp.where(
                (neighbor_indices < num_s)[..., None, None], nbr_x, 0.0
            )

            # wf[b, n, k, a, c] = sum_h nbr_x[b,n,h,a,c] * w[b,n,h,k]
            # (host-precomputed influence may carry zero h-padding)
            wf = jnp.einsum(
                "bnhac,bnhk->bnkac", nbr_x,
                w[:, :, : neighbor_indices.shape[2]],
                precision=prec.feature(),
            )
            wf_flat = None

        k, a = cfg.num_kernel_points, cfg.kanchor
        if cfg.kanchor == 1 or not cfg.non_sep_conv:
            # kanchor==1 (plain KPConv) or separable EPN: shared anchor weights
            if wf is None:
                wf = wf_flat.reshape(wf_flat.shape[:2] + (k, a_dim, cin))
            out = jnp.einsum(
                "bnkac,kcd->bnad", wf, prec.cast_feature(self.weights),
                precision=prec.feature(),
            ).astype(jnp.float32)
            return (out, pooled) if max_payload is not None else out

        # Two equivalent weight contractions (regrouped summation; identical
        # math, equivalence-tested in test_epn_equivariance.py):
        #
        # (a) EXPANDED: one matmul against the gathered effective weight,
        #     out[n, (r d)] = wf_flat[n, (k a c)] @ Wg[(k a c), (r d)] with
        #     Wg = W[wg_index] — inner dim K*A*Cin, 3x the FLOPs of (b) but
        #     NO large intermediate.
        # (b) FACTORED via steerability classes:
        #     out[n,r,d] = sum_{o,c} (sum_{ka: idx[r,ka]=o} wf[n,ka,c]) W[o,c,d]
        #     — 3x fewer FLOPs (inner O*Cin, O=27 exact / 36 relaxed vs KA=90),
        #     but the class-reduced intermediate (B, N, A, O, Cin) is ~2x the
        #     wf tensor (415 MB at production s0/s1) and its HBM round-trip
        #     dominates at 5% MFU.
        #
        # Measured (scripts/bench_weight_matmul.py, one v5e chip): expanded
        # wins 1.3-3.6 ms/conv for Cin <= 128 (s0 5.19 -> 1.98, s1 6.01 ->
        # 2.44, s2 4.33 -> 3.38); factored wins only at Cin = 256 (s3 3.72
        # vs 4.29) where the 3x FLOP cut finally outweighs the traffic.
        if wf_flat is None:
            wf_flat = wf.reshape(wf.shape[0], wf.shape[1], k * a * cin)
        if cin < 256:
            rhs = self._expanded_rhs(k, a, a_dim, cin)
            out = jnp.einsum(
                "bnm,mo->bno", wf_flat, rhs, precision=prec.feature()
            ).astype(jnp.float32)
            out = out.reshape(out.shape[0], out.shape[1], a,
                              self.out_channels)
            return (out, pooled) if max_payload is not None else out
        num_o = self.num_weight_blocks
        wf_kac = wf_flat.reshape(wf_flat.shape[:2] + (k * a, cin))
        reduce_m = prec.cast_feature(self.reduce_mats)  # (KA, R*O)
        red = jnp.einsum(
            "bnxc,xm->bnmc", wf_kac, reduce_m, precision=prec.feature()
        ).reshape(wf_flat.shape[:2] + (a, num_o, cin))
        # contract (o, c) as two dot dims — a flattened (O*Cin) axis forces
        # XLA to relayout the reduce output (measured ~1.3 ms/conv copies)
        out = jnp.einsum(
            "bnroc,ocd->bnrd", red, prec.cast_feature(self.weights),
            precision=prec.feature(),
        ).astype(jnp.float32)
        return (out, pooled) if max_payload is not None else out


class KPConvIntraSO3(nn.Module):
    """Anchor-dimension convolution (EPN separable mode, ``blocks_epn.py:554-596``)."""

    out_channels: int
    config: EPNConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, N, A, C) -> (B, N, A, Cout)."""
        space = self.config.space
        intra = jnp.asarray(space.intra_idx)  # (A, Ki)
        ki = intra.shape[1]
        cin = x.shape[-1]
        fan_in = cin * self.out_channels
        bound = 1.0 / np.sqrt(fan_in)
        w = self.param(
            "weights",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (ki, cin, self.out_channels),
        )
        gathered = x[:, :, intra]  # (B, N, A, Ki, C)
        return jnp.einsum("bnakc,kcd->bnad", gathered, w, precision=prec.feature())



def _win_sseg(window) -> int:
    """Static segment granularity of a window tuple.

    The third element is the pipeline's zero-cost shape-carrier ARRAY (its
    trailing dim = sseg) — an array rather than a python int so the value
    survives ``nn.remat``, which traces non-array call args (a raw int
    became a tracer and broke the padded-shape arithmetic, round 5).  A
    plain int is still accepted for hand-built tuples.
    """
    ss = window[2]
    return ss if isinstance(ss, int) else int(ss.shape[-1])


def max_pool_neighbors(x, neighbor_indices):
    """Max over neighbor features with zero shadow rows.

    Reference: ``e2pn/blocks.py max_pool`` (zero pad row participates in max).
    x: (B, Ns, ...) -> (B, Nq, ...)
    """
    num_s = x.shape[1]
    safe = jnp.clip(neighbor_indices, 0, num_s - 1)
    tail = x.shape[2:]
    flat = x.reshape(x.shape[0], num_s, -1)
    g = jnp.take_along_axis(
        flat, safe.reshape(safe.shape[0], -1, 1), axis=1
    ).reshape(neighbor_indices.shape + tail)
    g = jnp.where(
        (neighbor_indices < num_s).reshape(neighbor_indices.shape + (1,) * len(tail)),
        g,
        0.0,
    )
    return jnp.max(g, axis=2)


def nearest_upsample(x, upsample_indices):
    """Copy each query's nearest coarse neighbor (first, distance-sorted, column).

    Reference: ``kpconv/functional.py:6-22``.
    x: (B, Ncoarse, C); upsample_indices: (B, Nfine, K) -> (B, Nfine, C)
    """
    num_s = x.shape[1]
    idx = upsample_indices[:, :, 0]
    safe = jnp.clip(idx, 0, num_s - 1)
    out = jnp.take_along_axis(x, safe[..., None], axis=1)
    return jnp.where((idx < num_s)[..., None], out, 0.0)


def knn_interpolate(s_feats, q_points, s_points, neighbor_indices, k,
                    eps=1e-8):
    """Inverse-squared-distance KNN feature interpolation (the reference's
    ``KNNInterpolate`` k>1 decoder mode, ``kpconv/functional.py:25-52``;
    k=1 is :func:`nearest_upsample`).

    s_feats: (B, M, C); q_points: (B, N, 3); s_points: (B, M, 3);
    neighbor_indices: (B, N, X) distance-sorted with sentinel M -> (B, N, C).
    """
    num_s = s_feats.shape[1]
    idx = neighbor_indices[:, :, :k]
    safe = jnp.clip(idx, 0, num_s - 1)
    knn_points = jnp.take_along_axis(
        s_points, safe.reshape(idx.shape[0], -1, 1), axis=1
    ).reshape(*idx.shape, 3)
    knn_feats = jnp.take_along_axis(
        s_feats, safe.reshape(idx.shape[0], -1, 1), axis=1
    ).reshape(*idx.shape, s_feats.shape[-1])
    sq = jnp.sum((q_points[:, :, None, :] - knn_points) ** 2, axis=-1)
    w = (idx < num_s).astype(s_feats.dtype) / (sq + eps)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    return jnp.sum(knn_feats * w[..., None], axis=2)


class KPConvInterSO3Block(nn.Module):
    """Conv -> GroupNorm -> LeakyReLU (``blocks_epn.py:703-743``)."""

    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    group_norm: int
    config: EPNConfig

    @nn.compact
    def __call__(self, x, q_points, s_points, neighbor_indices, q_mask=None,
                 influence=None, ones_input=False, window=None,
                 max_payload=None, fuse_wmm=False):
        x = KPConvInterSO3(
            self.in_dim, self.out_dim, self.radius, self.sigma, self.config
        )(x, q_points, s_points, neighbor_indices, influence=influence,
          ones_input=ones_input, window=window, max_payload=max_payload,
          fuse_wmm=fuse_wmm)
        pooled = None
        if max_payload is not None:
            x, pooled = x
        x = MaskedGroupNorm(self.group_norm)(x, q_mask)
        x = jax.nn.leaky_relu(x, 0.1)
        return (x, pooled) if max_payload is not None else x


class SimpleBlockEPN(nn.Module):
    """First encoder block (``blocks_epn.py:770-796``)."""

    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    group_norm: int
    config: EPNConfig

    @nn.compact
    def __call__(self, x, q_points, s_points, neighbor_indices, q_mask=None,
                 influence=None, ones_input=False, window=None,
                 fuse_wmm=False):
        x = KPConvInterSO3Block(
            self.in_dim, self.out_dim, self.radius, self.sigma, self.group_norm,
            self.config,
        )(x, q_points, s_points, neighbor_indices, q_mask, influence=influence,
          ones_input=ones_input, window=window, fuse_wmm=fuse_wmm)
        if not self.config.non_sep_conv:
            x = KPConvIntraSO3(self.out_dim, self.config)(x)
        x = MaskedGroupNorm(self.group_norm)(x, q_mask)
        return jax.nn.leaky_relu(x, 0.1)


class ResnetBottleneckBlockEPN(nn.Module):
    """Bottleneck residual block, optionally strided (``blocks_epn.py:798-852``)."""

    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    group_norm: int
    config: EPNConfig
    strided: bool = False
    # strided-skip pooling route: 'fused' = forward-only windowed kernel
    # (serving), 'grad' = windowed kernel + custom VJP (training), 'xla' =
    # gather formulation (fallback / deep wide-channel stages)
    pool_mode: str = "fused"

    @nn.compact
    def __call__(self, x, q_points, s_points, neighbor_indices, q_mask=None,
                 s_mask=None, influence=None, window=None):
        if s_mask is None:
            s_mask = q_mask if not self.strided else None
        mid = self.out_dim // 4
        skip = x
        if self.in_dim != mid:
            h = UnaryBlock(mid, self.group_norm)(x, s_mask)
        else:
            h = x

        # serving: fuse the strided-skip max-pool INTO the conv kernel when
        # it fits — the conv (over h) and the skip max (over x) ride the
        # same neighbor set and window maps, so one one-hot build serves
        # both payloads (windowed_conv._wf_max_kernel; measured BENCH.md r5)
        fuse_skip = False
        if self.strided and window is not None and self.pool_mode == "fused":
            from se3et_tpu.ops.pallas import windowed_conv as wc

            a_dim, ch = skip.shape[2], skip.shape[3]
            w_width = window[0].shape[2] * _win_sseg(window)
            ac1 = h.shape[2] * h.shape[3]
            kfirst = self.config.wf_kfirst or (
                0 < self.config.wf_kfirst_min_ac <= ac1
            )
            fuse_skip = wc.windowed_wf_max_fits(
                w_width, ac1, a_dim * ch, window[1].shape[2],
                self.config.num_kernel_points, kfirst,
            )
        if fuse_skip:
            payload = prec.cast_feature(skip).reshape(
                skip.shape[0], skip.shape[1], a_dim * ch
            )
            h, pooled = KPConvInterSO3Block(
                mid, mid, self.radius, self.sigma, self.group_norm,
                self.config,
            )(h, q_points, s_points, neighbor_indices, q_mask,
              influence=influence, window=window, max_payload=payload,
              fuse_wmm=True)
            skip = pooled.reshape(
                skip.shape[0], q_points.shape[1], a_dim, ch
            ).astype(jnp.float32)
        else:
            h = KPConvInterSO3Block(
                mid, mid, self.radius, self.sigma, self.group_norm,
                self.config,
            )(h, q_points, s_points, neighbor_indices, q_mask,
              influence=influence, window=window,
              fuse_wmm=self.pool_mode == "fused")
        if not self.config.non_sep_conv:
            h = KPConvIntraSO3(mid, self.config)(h)
        h = MaskedGroupNorm(self.group_norm)(h, q_mask)
        h = jax.nn.leaky_relu(h, 0.1)
        h = UnaryBlock(self.out_dim, self.group_norm, no_relu=True)(h, q_mask)

        if self.strided and not fuse_skip:
            from se3et_tpu.ops.pallas import windowed_conv as wc

            a_dim, ch = skip.shape[2], skip.shape[3]
            w_width = (0 if window is None
                       else window[0].shape[2] * _win_sseg(window))
            pool_mode = self.pool_mode
            if (
                window is not None
                and pool_mode in ("fused", "grad")
                and wc.windowed_max_pool_fits(w_width, a_dim * ch)
                and (pool_mode != "grad"
                     or wc.windowed_max_pool_bwd_fits(w_width, a_dim * ch))
            ):
                seg_idx, local = window[0], window[1]
                b, ns = skip.shape[0], skip.shape[1]
                flat = prec.cast_feature(skip).reshape(b, ns, a_dim * ch)
                win = wc.segment_window_gather(flat, seg_idx,
                                               sseg=_win_sseg(window))
                interp = jax.default_backend() != "tpu"
                if pool_mode == "grad":
                    pooled = wc.windowed_max_pool_trainable(
                        local, win, q_points.shape[1], 8, interp
                    )
                else:
                    pooled = wc.windowed_max_pool(
                        local, win, q_points.shape[1], interpret=interp
                    )
                skip = pooled.reshape(
                    b, q_points.shape[1], a_dim, ch
                ).astype(jnp.float32)
            else:
                skip = max_pool_neighbors(skip, neighbor_indices)
        if self.in_dim != self.out_dim:
            skip = UnaryBlock(self.out_dim, self.group_norm, no_relu=True)(skip, q_mask)
        return jax.nn.leaky_relu(h + skip, 0.1)


class InvOutBlockEPN(nn.Module):
    """Equivariant -> invariant pooling over anchors (``blocks_epn.py:854-926``).

    Modes: plain anchor max-pool (default), attentive pooling (``att_pooling``),
    attentive permutation pooling (``att_permute``), and ``dual_feature``.
    """

    in_dim: int
    config: EPNConfig

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.config
        if cfg.att_pooling or cfg.att_permute:
            attn = TorchLinear(self.in_dim)(x)
            attn = jax.nn.relu(attn)
            attn = TorchLinear(1)(attn)  # (B, N, A, 1)
            attn_w = jax.nn.softmax(attn, axis=2)
            if cfg.att_pooling:
                fused = jnp.sum(x * attn_w, axis=2)
            else:  # att_permute: weight over full-permutation expansions
                ridx_rot = jnp.asarray(cfg.space.ridx_rot)  # (A, A)
                xp = x[:, :, ridx_rot]  # (B, N, A, A, C): [.., r, a, c]
                xp = xp.reshape(x.shape[0], x.shape[1], x.shape[2], -1)
                fused = jnp.sum(xp * attn_w, axis=2)
            if cfg.dual_feature:
                return jnp.max(x, axis=2), fused
            return fused
        return jnp.max(x, axis=2)


class NormalInvOutBlockEPN(nn.Module):
    """Normal-guided anchor selection (``blocks_epn.py:928-957``): pick the
    anchor whose vertex best aligns with the point normal."""

    config: EPNConfig
    weighted: bool = False

    @nn.compact
    def __call__(self, x, normals=None):
        if normals is None:
            return jnp.max(x, axis=2)
        verts = jnp.asarray(self.config.space.vertices)  # (A, 3)
        sim = jnp.einsum("bnc,ac->bna", normals, verts)
        if self.weighted:  # NormalWeightedInvOutBlockEPN (blocks_epn.py:959-990)
            w = jax.nn.sigmoid(sim)[..., None]
            return jnp.sum(x * w, axis=2)
        idx = jnp.argmax(sim, axis=-1)  # (B, N)
        return jnp.take_along_axis(x, idx[..., None, None], axis=2)[:, :, 0]


def lift_features(x: jnp.ndarray, kanchor: int) -> jnp.ndarray:
    """(B, N, C) -> (B, N, A, C) by broadcast (``LiftBlockEPN``, blocks_epn.py:993)."""
    return jnp.broadcast_to(
        x[:, :, None, :], x.shape[:2] + (kanchor,) + x.shape[-1:]
    )


class _EPNStage0(nn.Module):
    """Stage-0 encoder pair (simple + bottleneck) as one remat unit."""

    in_dim: int
    out_dim: int
    radius: float
    sigma: float
    group_norm: int
    config: EPNConfig
    ones_input: bool = False
    pool_mode: str = "fused"

    @nn.compact
    def __call__(self, x, pts, nbs, msk, influence, window):
        d = self.out_dim
        x = SimpleBlockEPN(
            self.in_dim, d, self.radius, self.sigma, self.group_norm,
            self.config,
        )(x, pts, pts, nbs, msk, influence=influence,
          ones_input=self.ones_input, window=window,
          fuse_wmm=self.pool_mode == "fused")
        x = ResnetBottleneckBlockEPN(
            d, d * 2, self.radius, self.sigma, self.group_norm, self.config,
            pool_mode=self.pool_mode,
        )(x, pts, pts, nbs, msk, influence=influence, window=window)
        return x


class _EPNStage(nn.Module):
    """One encoder stage (strided + 2 same-level bottlenecks) as one remat
    unit.  ``radius``/``sigma`` are the *strided* (previous-level) values; the
    two same-level blocks use 2x."""

    in_dim: int
    radius: float
    sigma: float
    group_norm: int
    config: EPNConfig
    pool_mode: str = "fused"

    @nn.compact
    def __call__(self, x, q_pts, s_pts, sub_idx, nbr_idx, q_msk, s_msk,
                 inf_sub, inf_same, win_sub, win_same):
        in_dim, r, s = self.in_dim, self.radius, self.sigma
        x = ResnetBottleneckBlockEPN(
            in_dim, in_dim, r, s, self.group_norm, self.config, strided=True,
            pool_mode=self.pool_mode,
        )(x, q_pts, s_pts, sub_idx, q_msk, s_mask=s_msk, influence=inf_sub,
          window=win_sub)
        # pool_mode is also the serving marker for the matmul-fused conv
        # (fuse_wmm) — thread it to the non-strided blocks too
        x = ResnetBottleneckBlockEPN(
            in_dim, in_dim * 2, r * 2, s * 2, self.group_norm, self.config,
            pool_mode=self.pool_mode,
        )(x, q_pts, q_pts, nbr_idx, q_msk, influence=inf_same, window=win_same)
        x = ResnetBottleneckBlockEPN(
            in_dim * 2, in_dim * 2, r * 2, s * 2, self.group_norm, self.config,
            pool_mode=self.pool_mode,
        )(x, q_pts, q_pts, nbr_idx, q_msk, influence=inf_same, window=win_same)
        return x


class E2PNBackbone(nn.Module):
    """4- or 5-stage E2PN encoder + invariant FPN decoder.

    Port of ``experiments/se3ete.3dmatch/backbone.py`` (4-stage) and
    ``experiments/se3eti.kitti/backbone.py`` (5-stage).  Output:
    ``(feats_f, feats_c_equiv)`` — invariant fine features at stage 1 and
    equivariant coarse features at the last stage.
    """

    input_dim: int
    output_dim: int
    init_dim: int
    init_radius: float
    init_sigma: float
    group_norm: int
    config: EPNConfig
    num_stages: int = 4
    # input features are the constant 1 (true for every shipped experiment:
    # the datasets emit all-ones features) -> the first conv skips its
    # neighbor gather entirely
    ones_input: bool = False
    # per-stage jax.checkpoint: the backward pass recomputes each stage's
    # block internals (feature windows, one-hots, wf tensors) instead of
    # saving them — the difference between the production se3ete.3dmatch
    # train step fitting the 16 GB chip or OOMing (BENCH.md round 2: plain
    # OOMs by 0.36 GB; naive whole-model remat by 1.42 GB — stage boundaries
    # are the right granularity).  No effect on forward-only inference.
    remat: bool = False

    @nn.compact
    def __call__(self, feats, pyramid, fused=False, stop_stage=-1,
                 fused_conv_grad=False):
        # ``stop_stage`` >= 0: early-return after encoder stage i (prefix
        # profiling, scripts/profile_prefix.py --backbone)
        # ``fused_conv_grad``: training route — convs and max-pool skips take
        # the windowed kernels, differentiable via the custom VJPs
        # (windowed_gather_wf_trainable / windowed_max_pool_trainable)
        cfg = self.config
        d = self.init_dim
        r, s = self.init_radius, self.init_sigma
        pts = [pyramid[f"points_{i}"] for i in range(self.num_stages)]
        msk = [pyramid[f"masks_{i}"] for i in range(self.num_stages)]
        nbs = [pyramid[f"neighbors_{i}"] for i in range(self.num_stages)]
        subs = [pyramid[f"subsampling_{i}"] for i in range(self.num_stages - 1)]
        ups = [pyramid[f"upsampling_{i}"] for i in range(self.num_stages - 1)]

        def make_kp(radius):
            if cfg.kanchor == 1:
                kp = kp_lib.load_kernels(radius, cfg.num_kernel_points,
                                         fixed=cfg.fixed_kernel_points)
            elif cfg.fixed_kernel_points == "verticals":
                kp = kp_lib.so2_symmetric_kernel_points(
                    radius, cfg.num_kernel_points, cfg.kanchor * cfg.quotient_factor
                )
            else:
                kp = kp_lib.equivariant_kernel_points(
                    radius, cfg.num_kernel_points, cfg.kanchor, cfg.quotient_factor
                )
            return jnp.asarray(kp)

        def make_window(set_name, st):
            """Per-(stage, set) window maps for the fused conv kernel.

            Returns ``(seg_idx, local, sseg)``; ``sseg`` (the segment
            granularity the maps were built at) is read off the zero-cost
            shape-carrier array the pipeline emits, so the model needs no
            config knowledge of the per-set calibration."""
            if not (fused or fused_conv_grad):
                return None
            segs = pyramid.get(f"{set_name}_segs_{st}")
            local = pyramid.get(f"{set_name}_local_{st}")
            if segs is None:
                return None
            from se3et_tpu.ops.pallas import windowed_conv as wc

            carrier = pyramid.get(f"{set_name}_wsseg_{st}")
            if carrier is None:
                import jax.numpy as _jnp

                carrier = _jnp.zeros((wc.SSEG,), _jnp.int8)
            return (segs, local, carrier)

        def make_influence(radius, sigma, q, sup, idx, win, key=None):
            """Influence weights, shared by all convs of a (stage, set).

            Host-precomputed path (``data/influence.py``, geometry-only like
            the p2n partition): the pipeline ships (B, Nq, H, K) fp16
            tensors — zero device cost, fp32-exact geometry.  Fused path:
            computed by the windowed Pallas kernel from the per-block
            coordinate windows — no per-row coordinate gathers.  Fallback:
            XLA formulation (row gathers, ~8.4 ns/row).
            """
            pre = None if key is None else pyramid.get(key)
            if (
                pre is not None
                and pre.shape[:2] == idx.shape[:2]
                and pre.shape[2] >= idx.shape[2]  # H padded to hc on host
                and pre.shape[-1] == cfg.num_kernel_points
            ):
                return prec.cast_feature(pre)
            if win is not None:
                from se3et_tpu.ops.pallas import windowed_conv as wc

                segs, local = win[0], win[1]
                win3 = wc.segment_window_gather(
                    sup, segs, precision=jax.lax.Precision.HIGHEST,
                    sseg=_win_sseg(win),
                )
                infl, _ = wc.influence_windowed_pallas(
                    local, q, win3, make_kp(radius), sigma=float(sigma),
                    influence=cfg.kp_influence,
                    interpret=jax.default_backend() != "tpu",
                    out_dtype=prec.compute_dtype() or jnp.float32,
                )
                return infl
            return _influence_weights(q, sup, idx, make_kp(radius), sigma,
                                      cfg.kp_influence)

        # Geometry-only conv state shared by all convs on the same
        # (stage, neighbor set, radius): window maps (fused path) +
        # influence-weight tensors.
        win_same = [make_window("neighbors", st) for st in range(self.num_stages)]
        win_sub = [None] + [
            make_window("subsampling", st - 1) for st in range(1, self.num_stages)
        ]
        inf_same = [None] * self.num_stages
        inf_sub = [None] * self.num_stages
        inf_same[0] = make_influence(r, s, pts[0], pts[0], nbs[0], win_same[0],
                                     key="influence_same_0")
        for st in range(1, self.num_stages):
            mult = 2 ** (st - 1)
            inf_sub[st] = make_influence(
                r * mult, s * mult, pts[st], pts[st - 1], subs[st - 1],
                win_sub[st], key=f"influence_sub_{st}",
            )
            inf_same[st] = make_influence(
                r * mult * 2, s * mult * 2, pts[st], pts[st], nbs[st],
                win_same[st], key=f"influence_same_{st}",
            )

        Stage0 = nn.remat(_EPNStage0) if self.remat else _EPNStage0
        Stage = nn.remat(_EPNStage) if self.remat else _EPNStage

        x = lift_features(feats, cfg.kanchor)
        x = Stage0(
            self.input_dim, d, r, s, self.group_norm, cfg,
            ones_input=self.ones_input and self.input_dim == 1,
            pool_mode="fused" if fused
            else ("grad" if fused_conv_grad else "xla"),
        )(x, pts[0], nbs[0], msk[0], inf_same[0], win_same[0])
        if stop_stage == 0:
            return x, x

        stage_feats = [x]
        dims = [d * 2]
        for st in range(1, self.num_stages):
            mult = 2 ** (st - 1)
            in_dim = dims[-1]
            x = Stage(
                in_dim, r * mult, s * mult, self.group_norm, cfg,
                pool_mode="fused" if fused
                else ("grad" if fused_conv_grad else "xla"),
            )(
                x, pts[st], pts[st - 1], subs[st - 1], nbs[st], msk[st],
                msk[st - 1], inf_sub[st], inf_same[st], win_sub[st],
                win_same[st],
            )
            stage_feats.append(x)
            dims.append(in_dim * 2)
            if stop_stage == st:
                return x, x

        # invariant features per stage (anchor pooling)
        inv_feats = [
            InvOutBlockEPN(dims[i], cfg)(stage_feats[i], msk[i])
            for i in range(1, self.num_stages)
        ]
        feats_c_equiv = stage_feats[-1]  # (B, Nc, A, d*2^{S})

        # FPN decoder on invariant features down to stage 1 (the fine level)
        latent = inv_feats[-1]
        for st in range(self.num_stages - 2, 0, -1):
            latent = nearest_upsample(latent, ups[st])
            latent = jnp.concatenate([latent, inv_feats[st - 1]], axis=-1)
            if st > 1:
                latent = UnaryBlock(dims[st], self.group_norm)(latent, msk[st])
            else:
                latent = TorchLinear(self.output_dim)(latent)
        feats_f = latent  # (B, N1, output_dim)
        return feats_f, feats_c_equiv

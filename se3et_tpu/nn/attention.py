r"""Multi-head attention layers: invariant, RPE, and anchor-equivariant.

TPU-native port of ``geotransformer/modules/transformer/{vanilla_transformer,
rpe_transformer,output_layer}.py``.  Faithful to the reference semantics,
including the ``attn_on_sub`` / ``attn_r_multihead`` / ``attn_r_summ``
equivariant-attention knobs (dropout stays identity — the shipped reference
configs leave it ``None``), plus:

* **Valid-mask convention**: ``key_masks`` is True for *valid* keys (the
  reference uses True = ignored); all global poolings are masked.
* **Folded positional projections**: the RPE positional term and the
  equivariant-SH term contract the projection into the query first
  (``scores_p = (q W_p^T) . emb``), avoiding the reference's
  (B, [A], N, M, d_model) materializations (``rpe_transformer.py:60,78``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from se3et_tpu import precision as prec
from se3et_tpu.core import anchors as anchor_lib
from se3et_tpu.nn.layers import LayerNorm, TorchLinear, build_activation

_NEG = -1e9


def _split_heads(x, num_heads):
    """(..., N, H*C) -> (..., H, N, C)"""
    *lead, n, d = x.shape
    x = x.reshape(*lead, n, num_heads, d // num_heads)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x):
    """(..., H, N, C) -> (..., N, H*C)"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, n, h, c = x.shape
    return x.reshape(*lead, n, h * c)


def _positive(x, mode: Optional[str]):
    """Non-negativity transforms for global anchor/rotation attention
    (``vanilla_transformer.py:387-417``)."""
    if mode is None:
        return x
    if mode == "sq":
        return x**2
    if mode == "abs":
        return jnp.abs(x)
    if mode == "relu":
        return jax.nn.relu(x)
    if mode == "sigmoid":
        return jax.nn.sigmoid(x)
    if mode == "leakyrelu":
        return jax.nn.leaky_relu(x, 0.1)
    if mode == "softplus":
        return jax.nn.softplus(x)
    if mode == "minus":
        return (x + 1.0) / 2.0
    raise ValueError(mode)


class MultiHeadAttention(nn.Module):
    """Vanilla invariant attention; values may be equivariant (B, A, M, C).

    Reference: ``vanilla_transformer.py:23-85`` (4-D value support at :60-61,
    77-80 — used for the SE3ET-I invariant-cross/equivariant-value blocks).
    """

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, key_masks=None):
        h = self.num_heads
        q = _split_heads(TorchLinear(self.d_model)(input_q), h)  # (B, H, N, c)
        k = _split_heads(TorchLinear(self.d_model)(input_k), h)
        v = _split_heads(TorchLinear(self.d_model)(input_v), h)  # (B,[A],H,M,c)

        dh = self.d_model // h
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k, precision=prec.feature()) / np.sqrt(dh)
        if key_masks is not None:
            scores = jnp.where(key_masks[:, None, None, :], scores, _NEG)
        scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)

        if input_v.ndim == 4:  # equivariant values (B, A, M, C)
            hidden = jnp.einsum("bhnm,bahmc->bahnc", scores, v, precision=prec.feature())
        else:
            hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v, precision=prec.feature())
        return _merge_heads(hidden), {"scores": scores}


class RPEMultiHeadAttention(nn.Module):
    """Self-attention with geometric relative positional embedding, optionally
    anchor-equivariant with an extra SH-embedding score term.

    Reference: ``rpe_transformer.py:18-131``.
    """

    d_model: int
    num_heads: int
    equivariant: bool = False
    d_equiv_embed: int = 0
    kanchor: int = 0

    def _flash_path(self, q, k, v, wp_h, we_h, embed_qk, key_masks, points,
                    femb_pack=None):
        """Flash-kernel route (serving): folded-query streaming softmax.

        Projection biases and the degree-0 SH term are per-query constants —
        softmax shift invariance makes them no-ops, so only ``q @ W^T`` folds
        are passed (``ops/pallas/rpe_attention.py``).  Exactness-tested
        against the XLA formulation (tests/test_attention.py).

        ``femb_pack = (knn_points, wd, wa, sigma_d, sigma_a)`` switches to
        the fused-embedding kernel: the geometric embedding is recomputed
        in-kernel from raw coordinates and ``embed_qk`` may be None — the
        (B, N, M, C) tensor never exists in the serving graph.
        """
        from se3et_tpu.ops.pallas import rpe_attention as flash

        cdtype = embed_qk.dtype if embed_qk is not None else jnp.bfloat16
        lead = q.shape[:-3]  # (B, A) or (B,)
        b = q.shape[0]
        n, dh = q.shape[-2:]
        ah = int(np.prod(lead[1:])) * q.shape[-3]  # A*H (or H)
        qf = q.reshape(b, ah, n, dh)
        kf = k.reshape(b, ah, n, dh)
        vf = v.reshape(b, ah, n, dh)
        qp = jnp.einsum(
            "...hnc,dhc->...hnd", q, wp_h, precision=prec.feature()
        ).reshape(b, ah, n, self.d_model)
        qp = jnp.swapaxes(qp, 1, 2)  # (B, N, AH, C)
        qw = None
        pts4 = None
        if we_h is not None:
            from se3et_tpu.core import anchors as anchor_lib
            from se3et_tpu.core import harmonics

            qe = jnp.einsum(
                "bahnc,dhc->bahnd", q, we_h, precision=prec.feature()
            )  # (B, A, H, N, 4)
            space = anchor_lib.get_anchor_space(
                self.kanchor, {4: 3, 6: 4, 12: 5}.get(self.kanchor, 1)
            )
            wd1 = harmonics.anchor_wigner_d([0, 1], space.anchors)[1]
            qw = flash.fold_equivariant_query(qe, wd1)
            pts4 = jnp.concatenate(
                [points, jnp.zeros(points.shape[:-1] + (1,), points.dtype)],
                axis=-1,
            ).swapaxes(1, 2).astype(jnp.float32)  # (B, 4, N)
        km = (key_masks if key_masks is not None
              else jnp.ones((b, n), bool))
        if femb_pack is not None:
            knn_points, wd, wa, sigma_d, sigma_a = femb_pack
            if pts4 is None:
                pts4 = jnp.concatenate(
                    [points,
                     jnp.zeros(points.shape[:-1] + (1,), points.dtype)],
                    axis=-1,
                ).swapaxes(1, 2).astype(jnp.float32)
            # tile-shape overrides for chip A/Bs (bn=32 crashes Mosaic at
            # AH=24 — scripts/bisect_femb_v2.py probes alternatives)
            import os as _os

            hidden = flash.rpe_self_attention_femb(
                qf.astype(cdtype), kf.astype(cdtype), vf.astype(cdtype),
                qp.astype(cdtype), km, qw, pts4, knn_points, wd, wa,
                scale=1.0 / float(np.sqrt(dh)), sigma_d=float(sigma_d),
                sigma_a=float(sigma_a),
                block_n=int(_os.environ.get("SE3ET_FEMB_BN", "16")),
                block_m=int(_os.environ.get("SE3ET_FEMB_BM", "128")),
                interpret=jax.default_backend() != "tpu",
            ).astype(v.dtype)
            return _merge_heads(hidden.reshape(q.shape)), {}
        # block_m=128 keeps the double-buffered (bn, bm, C) embedding tile
        # within the ~16 MB VMEM budget at C=256 (256-wide tiles alone need
        # 16.8 MB).  The trainable wrapper == the forward kernel when no
        # gradient is taken (serving); under jax.grad its custom VJP runs the
        # two-pass flash backward (scores never materialize either way).
        hidden = flash.rpe_self_attention_trainable(
            qf.astype(embed_qk.dtype), kf.astype(embed_qk.dtype),
            vf.astype(embed_qk.dtype), qp.astype(embed_qk.dtype), embed_qk,
            km, qw, pts4, 1.0 / float(np.sqrt(dh)), 64, 128,
            jax.default_backend() != "tpu",
        ).astype(v.dtype)
        return _merge_heads(hidden.reshape(q.shape)), {}

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_qk, key_masks=None,
                 embed_eq=None, points=None, use_flash=False,
                 femb_pack=None):
        h = self.num_heads
        dh = self.d_model // h
        q = _split_heads(TorchLinear(self.d_model)(input_q), h)
        k = _split_heads(TorchLinear(self.d_model)(input_k), h)
        v = _split_heads(TorchLinear(self.d_model)(input_v), h)
        # (B,[A],H,N,c)

        # positional scores with the projection folded into q:
        #   p = emb @ Wp + bp ;  s_p = q . p  =  (q @ Wp^T) . emb + q . bp
        wp = self.param(
            "proj_p_kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / np.sqrt(shape[0]), 1.0 / np.sqrt(shape[0])
            ),
            (self.d_model, self.d_model),
        )
        bp = self.param(
            "proj_p_bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / np.sqrt(self.d_model), 1.0 / np.sqrt(self.d_model)
            ),
            (self.d_model,),
        )
        wp_h = wp.reshape(self.d_model, h, dh)
        bp_h = bp.reshape(h, dh)

        with_eq_term = self.equivariant and self.d_equiv_embed > 0
        we = be = None
        if with_eq_term:
            de = self.d_equiv_embed
            we = self.param(
                "proj_eq_kernel",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -1.0 / np.sqrt(de), 1.0 / np.sqrt(de)
                ),
                (de, self.d_model),
            )
            be = self.param(
                "proj_eq_bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -1.0 / np.sqrt(de), 1.0 / np.sqrt(de)
                ),
                (self.d_model,),
            )

        n, m = q.shape[-2], k.shape[-2]
        flash_ok = (
            use_flash
            and n == m
            and n % 128 == 0
            and (embed_qk.shape[-3] == n if femb_pack is None
                 else points is not None)
            and (not with_eq_term
                 or (points is not None and self.d_equiv_embed == 4
                     and self.kanchor > 1))
        )
        if flash_ok:
            return self._flash_path(
                q, k, v, wp_h,
                we.reshape(self.d_equiv_embed, h, dh) if with_eq_term else None,
                embed_qk, key_masks, points, femb_pack=femb_pack,
            )

        if self.equivariant:
            qp = jnp.einsum("bahnc,dhc->bahnd", q, wp_h, precision=prec.feature())
            s_p = jnp.einsum("bahnd,bnmd->bahnm", qp, embed_qk, precision=prec.feature())
            s_p = s_p + jnp.einsum("bahnc,hc->bahn", q, bp_h)[..., None]
            s_e = jnp.einsum("bahnc,bahmc->bahnm", q, k, precision=prec.feature())
        else:
            qp = jnp.einsum("bhnc,dhc->bhnd", q, wp_h, precision=prec.feature())
            s_p = jnp.einsum("bhnd,bnmd->bhnm", qp, embed_qk, precision=prec.feature())
            s_p = s_p + jnp.einsum("bhnc,hc->bhn", q, bp_h)[..., None]
            s_e = jnp.einsum("bhnc,bhmc->bhnm", q, k, precision=prec.feature())

        scores = s_e + s_p
        if with_eq_term:
            assert embed_eq is not None, "equivariant embedding required"
            # eq = embed_eq @ We + be ;  s_eq = q . eq folded likewise
            de = self.d_equiv_embed
            we_h = we.reshape(de, h, dh)
            qe = jnp.einsum("bahnc,dhc->bahnd", q, we_h, precision=prec.feature())
            s_eq = jnp.einsum("bahnd,banmd->bahnm", qe, embed_eq, precision=prec.feature())
            s_eq = s_eq + jnp.einsum("bahnc,hc->bahn", q, be.reshape(h, dh))[..., None]
            scores = scores + s_eq

        scores = scores / np.sqrt(dh)
        if key_masks is not None:
            km = key_masks[:, None, None, :]
            if self.equivariant:
                km = key_masks[:, None, None, None, :]
            scores = jnp.where(km, scores, _NEG)
        scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        hidden = jnp.einsum("...nm,...mc->...nc", scores, v, precision=prec.feature())
        return _merge_heads(hidden), {"scores": scores}


class MultiHeadAttentionEQ(nn.Module):
    """Equivariant cross attention over anchor pairs with four global modes.

    Reference: ``vanilla_transformer.py:87-870`` (``cross_anchor_attn_aa``).
    Modes:
      * ``a_soft``: weight key anchors per query anchor (normalized global attn)
      * ``a_best``: pick the best key anchor per query anchor
      * ``r_soft``: fold anchor pairs into rotations via the vertex-trace table
        and weight rotations softly
      * ``r_best``: pick the best rotation and permute keys/values accordingly
      * ``None``: plain all-anchor-pair attention
    """

    d_model: int
    num_heads: int
    attn_mode: Optional[str] = None
    kanchor: int = 4
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    with_rot_supervision: bool = False
    # global-pooling variants (reference code-level switches,
    # ``vanilla_transformer.py:131-134``):
    # 'mean' point-mean pooling | 'double_norm' dual-normalized top-k pooling
    # (``vanilla_transformer.py:424-454``)
    attn_r_summ: str = "mean"
    # compute the global rotation weight from the 2-anchor subset
    # {0, adj(0)} only (``vanilla_transformer.py:284-287,510-537``)
    attn_on_sub: bool = False
    # keep a per-head rotation weight instead of head-averaging
    # (``vanilla_transformer.py:516-521``)
    attn_r_multihead: bool = False
    num_correspondences: int = 256  # double_norm top-k budget

    @property
    def space(self):
        quotient = {3: 1, 4: 3, 6: 4, 12: 5}[self.kanchor]
        return anchor_lib.get_anchor_space(self.kanchor, quotient)

    def _flash_path(self, q, k, v, key_masks, q_masks, trace_ori):
        """Flash-kernel route for a_soft / r_soft (mean pooling, all-anchor,
        head-averaged): stats pass -> tiny (A, E) weight math -> apply pass.
        Exactness-tested against the XLA formulation (test_attention.py)."""
        from se3et_tpu.ops.pallas import eq_attention as flash

        a = self.kanchor
        qs, ks, vs = q[0], k[0], v[0]  # (A, H, N/M, c)
        qm = (q_masks[0] if q_masks is not None
              else jnp.ones((q.shape[-2],), bool))
        km = (key_masks[0] if key_masks is not None
              else jnp.ones((k.shape[-2],), bool))
        interp = jax.default_backend() != "tpu"
        aux = {}

        if self.with_rot_supervision:
            iq = 1.0 / (jnp.linalg.norm(q, axis=(-2, -1)) + 1e-9)  # (1, A, H)
            ik = 1.0 / (jnp.linalg.norm(k, axis=(-2, -1)) + 1e-9)
            rowmax, rowsum, attn_ae, sup = flash.eq_attention_stats(
                qs, ks, qm, km, iq[0][..., None], ik[0][..., None],
                positive=self.attn_r_positive, with_sup=True,
                interpret=interp,
            )
            aux["attn_matrix"] = _positive(
                sup, self.attn_r_positive_rot_supervise
            )[None]
        else:
            rowmax, rowsum, attn_ae = flash.eq_attention_stats(
                qs, ks, qm, km, positive=self.attn_r_positive,
                interpret=interp,
            )

        # all four modes collapse to ONE weighted-apply form
        #   hidden[a] = sum_e w_ae[a, e] softmax(s[a, e]) @ v[e]
        # (soft modes: normalized pooled weights; best modes: one-hot of the
        # argmax anchor/rotation — softmax commutes with the gather)
        if self.attn_mode == "a_soft":
            w_ae = attn_ae / (jnp.sum(attn_ae, axis=1, keepdims=True) + 1e-9)
            aux["attn_w"] = w_ae[None]
        elif self.attn_mode == "a_best":
            idx = jnp.argmax(attn_ae, axis=1)  # (A,)
            w_ae = jax.nn.one_hot(idx, a, dtype=jnp.float32)
            aux["attn_idx"] = idx[None]
        elif self.attn_mode == "r_best":
            nr = trace_ori.shape[0]
            a_ids = jnp.broadcast_to(jnp.arange(a)[None, :], (nr, a))
            attn_r = jnp.mean(attn_ae[a_ids, trace_ori], axis=1)  # (R,)
            perm = trace_ori[jnp.argmax(attn_r)]  # (A,)
            w_ae = jax.nn.one_hot(perm, a, dtype=jnp.float32)
            aux["attn_idx"] = perm[None]
        else:  # r_soft: fold anchor pairs into rotations via the trace table
            nr = trace_ori.shape[0]
            a_ids = jnp.broadcast_to(jnp.arange(a)[None, :], (nr, a))
            attn_r = jnp.mean(attn_ae[a_ids, trace_ori], axis=1)  # (R,)
            attn_r = attn_r / (jnp.sum(attn_r) + 1e-9)
            onehot = jax.nn.one_hot(trace_ori, a, dtype=attn_r.dtype)
            w_ae = jnp.einsum("r,rae->ae", attn_r, onehot)
            aux["attn_w"] = attn_r[None]

        hidden = flash.eq_attention_apply(
            qs, ks, vs, w_ae, rowmax, rowsum, km, interpret=interp
        ).astype(v.dtype)[None]
        return _merge_heads(hidden), aux

    @nn.compact
    def __call__(self, input_q, input_k, input_v, key_masks=None, q_masks=None,
                 use_flash=False):
        """inputs: (B, A, N/M, C); key_masks/q_masks: (B, M)/(B, N) True=valid.

        ``use_flash`` (serving path): route a_soft/r_soft through the Pallas
        flash kernels (``ops/pallas/eq_attention.py``) — no (A, E, H, N, M)
        score materialization.  Falls back to the XLA formulation for modes
        the kernel does not cover (and always for training, which needs
        autodiff through this block).
        """
        h = self.num_heads
        dh = self.d_model // h
        a = self.kanchor
        space = self.space
        trace_ori = jnp.asarray(space.trace_idx_ori)  # (R, A)
        nr = space.trace_idx_ori.shape[0]

        q = _split_heads(TorchLinear(self.d_model)(input_q), h)  # (B,A,H,N,c)
        k = _split_heads(TorchLinear(self.d_model)(input_k), h)
        v = _split_heads(TorchLinear(self.d_model)(input_v), h)

        scale = 1.0 / np.sqrt(dh)

        flash_ok = (
            use_flash
            and self.attn_mode in ("a_soft", "r_soft", "a_best", "r_best")
            and self.attn_r_summ == "mean"
            and not self.attn_on_sub
            and not self.attn_r_multihead
            and q.shape[0] == 1
            and (not self.with_rot_supervision
                 or self.attn_mode in ("r_soft", "r_best"))
        )
        if flash_ok:
            return self._flash_path(q, k, v, key_masks, q_masks, trace_ori)
        s_ae = jnp.einsum("bahnc,behmc->baehnm", q, k, precision=prec.feature()) * scale

        pair_mask = None
        if key_masks is not None or q_masks is not None:
            qm = q_masks if q_masks is not None else jnp.ones(q.shape[:1] + q.shape[-2:-1], bool)
            km = key_masks if key_masks is not None else jnp.ones(k.shape[:1] + k.shape[-2:-1], bool)
            pair_mask = qm[:, :, None] & km[:, None, :]  # (B, N, M)

        aux = {}
        if self.attn_mode is None:
            scores = s_ae.astype(jnp.float32)
            if key_masks is not None:
                scores = jnp.where(key_masks[:, None, None, None, None, :], scores, _NEG)
            scores = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            hidden = jnp.einsum("baehnm,behmc->bahnc", scores, v, precision=prec.feature())
            return _merge_heads(hidden), aux

        # ---- global attention: [head-mean ->] positive -> masked pooling ----
        if self.attn_on_sub:
            # rotation weight from query anchors {0, adj(0)} only — every
            # rotation is already determined by where two adjacent vertices go
            assert self.attn_mode in ("r_soft", "r_best"), self.attn_mode
            assert space.v_adjs is not None, (
                "attn_on_sub requires vertex-quotient anchors (kanchor 4/6/12)"
            )
            sub_idx = np.asarray([0, int(space.v_adjs[0, 0])])
            s_sub = s_ae[:, jnp.asarray(sub_idx)]  # (B, 2, E, H, N, M)
        else:
            sub_idx = None
            s_sub = s_ae
        if self.attn_r_multihead:
            g = s_sub  # (B, A', E, H, N, M)
        else:
            g = jnp.mean(s_sub, axis=3, keepdims=True)  # (B, A', E, 1, N, M)
        g = _positive(g, self.attn_r_positive)

        if self.attn_r_summ == "mean":
            if pair_mask is not None:
                m = pair_mask[:, None, None, None].astype(g.dtype)
                attn_ae_h = jnp.sum(g * m, axis=(-2, -1)) / (
                    jnp.sum(m, axis=(-2, -1)) + 1e-9
                )
            else:
                attn_ae_h = jnp.mean(g, axis=(-2, -1))  # (B, A', E, H')
        elif self.attn_r_summ == "double_norm":
            # dual-normalized matching scores, top-k mean
            # (``vanilla_transformer.py:430-441``)
            if pair_mask is not None:
                g = g * pair_mask[:, None, None, None].astype(g.dtype)
            ref_n = g / (jnp.sum(g, axis=-1, keepdims=True) + 1e-9)
            src_n = g / (jnp.sum(g, axis=-2, keepdims=True) + 1e-9)
            ms = (ref_n * src_n).reshape(g.shape[:-2] + (-1,))
            kk = min(self.num_correspondences, ms.shape[-1])
            topk, _ = jax.lax.top_k(ms, kk)
            attn_ae_h = jnp.mean(topk, axis=-1)  # (B, A', E, H')
        else:
            raise ValueError(self.attn_r_summ)
        # head-averaged view for the anchor (a_*) modes and aux outputs
        attn_ae = jnp.mean(attn_ae_h, axis=-1)  # (B, A', E)

        if self.with_rot_supervision:
            # normalized-feature anchor similarity for the rotation loss
            qn = q / (jnp.linalg.norm(
                q, axis=(-2, -1), keepdims=True) + 1e-9)
            kn = k / (jnp.linalg.norm(k, axis=(-2, -1), keepdims=True) + 1e-9)
            s_sup = jnp.einsum("bahnc,behmc->baehnm", qn, kn, precision=prec.feature()) * scale
            if self.attn_mode in ("r_soft", "r_best"):
                if pair_mask is not None:
                    s_sup = jnp.where(pair_mask[:, None, None, None], s_sup, _NEG)
                sup = jnp.max(jnp.mean(s_sup, axis=3), axis=(-2, -1))  # (B, A, E)
            else:
                sup = jnp.mean(jnp.mean(s_sup, axis=3), axis=(-2, -1))
            aux["attn_matrix"] = _positive(sup, self.attn_r_positive_rot_supervise)

        def masked_softmax_m(s):
            s = s.astype(jnp.float32)
            if key_masks is not None:
                km = key_masks.reshape(
                    key_masks.shape[0], *(1,) * (s.ndim - 3), 1, key_masks.shape[1]
                )
                s = jnp.where(km, s, _NEG)
            return jax.nn.softmax(s, axis=-1).astype(v.dtype)

        if self.attn_mode == "a_soft":
            w = attn_ae / (jnp.sum(attn_ae, axis=2, keepdims=True) + 1e-9)
            scores = masked_softmax_m(s_ae)
            scores = scores * w[:, :, :, None, None, None]
            hidden = jnp.einsum("baehnm,behmc->bahnc", scores, v, precision=prec.feature())
            aux["attn_w"] = w
        elif self.attn_mode == "a_best":
            idx = jnp.argmax(attn_ae, axis=2)  # (B, A)
            s_best = jnp.take_along_axis(
                s_ae, idx[:, :, None, None, None, None], axis=2
            )[:, :, 0]  # (B, A, H, N, M)
            scores = masked_softmax_m(s_best)
            v_perm = jnp.take_along_axis(v, idx[:, :, None, None, None], axis=1)
            hidden = jnp.einsum("bahnm,bahmc->bahnc", scores, v_perm, precision=prec.feature())
            aux["attn_idx"] = idx
        elif self.attn_mode == "r_soft":
            # attn_r[b, r] = mean_a' attn_ae[b, a', trace_ori[r, a']] over the
            # pooled query anchors (all A, or the {0, adj0} subset)
            cols = trace_ori if sub_idx is None else trace_ori[:, jnp.asarray(sub_idx)]
            na_sub = cols.shape[1]
            a_ids = jnp.broadcast_to(jnp.arange(na_sub)[None, :], (nr, na_sub))
            attn_ar = attn_ae_h[:, a_ids, cols]  # (B, R, A', H')
            attn_r_h = jnp.mean(attn_ar, axis=2)  # (B, R, H')
            attn_r_h = attn_r_h / (
                jnp.sum(attn_r_h, axis=1, keepdims=True) + 1e-9
            )
            # The rotation-expanded form
            #   hidden = sum_r attn_r[r] softmax(s_ae[a, tr(r,a)]) @ v[tr(r,a)]
            # collapses EXACTLY to the anchor-pair form with the effective
            # weight W[a, e] = sum_r attn_r[r] * 1[trace_ori[r, a] == e]
            # (softmax over keys commutes with the e-gather) — no (B,R,A,H,N,M)
            # materialization needed.
            onehot = jax.nn.one_hot(trace_ori, a, dtype=attn_r_h.dtype)  # (R, A, E)
            w_ae = jnp.einsum("brh,rae->baeh", attn_r_h, onehot)  # (B, A, E, H')
            scores = masked_softmax_m(s_ae)
            scores = scores * w_ae[:, :, :, :, None, None].astype(scores.dtype)
            hidden = jnp.einsum(
                "baehnm,behmc->bahnc", scores, v, precision=prec.feature()
            )
            aux["attn_w"] = jnp.mean(attn_r_h, axis=-1)  # (B, R)
        elif self.attn_mode == "r_best":
            cols = trace_ori if sub_idx is None else trace_ori[:, jnp.asarray(sub_idx)]
            na_sub = cols.shape[1]
            a_ids = jnp.broadcast_to(jnp.arange(na_sub)[None, :], (nr, na_sub))
            attn_ar = attn_ae[:, a_ids, cols]  # (B, R, A')
            attn_r = jnp.mean(attn_ar, axis=2)  # (B, R)
            r_idx = jnp.argmax(attn_r, axis=1)  # (B,)
            perm = trace_ori[r_idx]  # (B, A)
            k_perm = jnp.take_along_axis(k, perm[:, :, None, None, None], axis=1)
            scores = jnp.einsum("bahnc,bahmc->bahnm", q, k_perm, precision=prec.feature()) * scale
            scores = masked_softmax_m(scores)
            v_perm = jnp.take_along_axis(v, perm[:, :, None, None, None], axis=1)
            hidden = jnp.einsum("bahnm,bahmc->bahnc", scores, v_perm, precision=prec.feature())
            aux["attn_idx"] = perm
        else:
            raise ValueError(self.attn_mode)

        return _merge_heads(hidden), aux


class AttentionOutput(nn.Module):
    """FFN block: expand -> act -> squeeze -> LN residual
    (``output_layer.py:7-22``)."""

    d_model: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, x):
        h = TorchLinear(self.d_model * 2)(x)
        h = build_activation(self.activation_fn)(h)
        h = TorchLinear(self.d_model)(h)
        return LayerNorm()(x + h)


class RotCompressOutput(nn.Module):
    """Anchor-axis compression: concat A*C -> MLP -> + anchor-max residual
    (``output_layer.py:24-47``)."""

    d_model: int
    na: int
    activation_fn: str = "ReLU"
    dual_align: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, A, N, C) -> (B, N, C)"""
        x_max = jnp.max(x, axis=1)
        b, a, n, c = x.shape
        flat = jnp.moveaxis(x, 1, 2).reshape(b, n, a * c)
        h = TorchLinear(self.d_model * 2)(flat)
        h = build_activation(self.activation_fn)(h)
        h = TorchLinear(self.d_model)(h)
        return LayerNorm()(x_max + h)


class AttentionLayer(nn.Module):
    """Attention + linear + LN residual (``vanilla_transformer.py:872-912``)."""

    d_model: int
    num_heads: int
    equivariant: bool = False
    attn_mode: Optional[str] = None
    kanchor: int = 4
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    with_rot_supervision: bool = False
    attn_r_summ: str = "mean"
    attn_on_sub: bool = False
    attn_r_multihead: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, value_states=None,
                 memory_masks=None, q_masks=None, use_flash=False):
        if value_states is None:
            value_states = memory_states
        if self.equivariant:
            attention = MultiHeadAttentionEQ(
                self.d_model, self.num_heads, attn_mode=self.attn_mode,
                kanchor=self.kanchor, attn_r_positive=self.attn_r_positive,
                attn_r_positive_rot_supervise=self.attn_r_positive_rot_supervise,
                with_rot_supervision=self.with_rot_supervision,
                attn_r_summ=self.attn_r_summ, attn_on_sub=self.attn_on_sub,
                attn_r_multihead=self.attn_r_multihead,
            )
            hidden, aux = attention(
                input_states, memory_states, value_states,
                key_masks=memory_masks, q_masks=q_masks, use_flash=use_flash,
            )
        else:
            attention = MultiHeadAttention(self.d_model, self.num_heads)
            hidden, aux = attention(
                input_states, memory_states, value_states, key_masks=memory_masks
            )
        hidden = TorchLinear(self.d_model)(hidden)
        if hidden.ndim == input_states.ndim + 1:
            # equivariant output from invariant input: broadcast residual over A
            input_states = input_states[:, None]
        out = LayerNorm()(hidden + input_states)
        return out, aux


class TransformerLayer(nn.Module):
    """AttentionLayer + AttentionOutput (``vanilla_transformer.py:915-946``)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    equivariant: bool = False
    attn_mode: Optional[str] = None
    kanchor: int = 4
    attn_r_positive: Optional[str] = "sq"
    attn_r_positive_rot_supervise: Optional[str] = "sigmoid"
    with_rot_supervision: bool = False
    attn_r_summ: str = "mean"
    attn_on_sub: bool = False
    attn_r_multihead: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, value_states=None,
                 memory_masks=None, q_masks=None, use_flash=False):
        hidden, aux = AttentionLayer(
            self.d_model, self.num_heads, equivariant=self.equivariant,
            attn_mode=self.attn_mode, kanchor=self.kanchor,
            attn_r_positive=self.attn_r_positive,
            attn_r_positive_rot_supervise=self.attn_r_positive_rot_supervise,
            with_rot_supervision=self.with_rot_supervision,
            attn_r_summ=self.attn_r_summ, attn_on_sub=self.attn_on_sub,
            attn_r_multihead=self.attn_r_multihead,
        )(input_states, memory_states, value_states, memory_masks, q_masks,
          use_flash=use_flash)
        return AttentionOutput(self.d_model, self.activation_fn)(hidden), aux


class PEMultiHeadAttention(nn.Module):
    """Additive-positional-embedding attention (``pe_transformer.py:15-76``):
    a shared projection ``proj_p`` adds the embedding into both query and key
    before the standard scaled dot-product.  ``key_masks``: True = valid."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k,
                 key_masks=None):
        h = self.num_heads
        proj_p = TorchLinear(self.d_model, name="proj_p")
        q = _split_heads(TorchLinear(self.d_model)(input_q) + proj_p(embed_q), h)
        k = _split_heads(TorchLinear(self.d_model)(input_k) + proj_p(embed_k), h)
        v = _split_heads(TorchLinear(self.d_model)(input_v), h)
        dh = self.d_model // h
        scores = jnp.einsum(
            "bhnc,bhmc->bhnm", q, k, precision=prec.feature()
        ) / np.sqrt(dh)
        if key_masks is not None:
            scores = jnp.where(key_masks[:, None, None, :], scores, _NEG)
        scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v, precision=prec.feature())
        return _merge_heads(hidden), {"scores": scores}


class PEAttentionLayer(nn.Module):
    """PE attention + linear + LN residual (``pe_transformer.py:79-107``)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_states, memory_states, input_embeddings,
                 memory_embeddings, memory_masks=None):
        hidden, aux = PEMultiHeadAttention(self.d_model, self.num_heads)(
            input_states, memory_states, memory_states, input_embeddings,
            memory_embeddings, key_masks=memory_masks,
        )
        hidden = TorchLinear(self.d_model)(hidden)
        return LayerNorm()(hidden + input_states), aux


class PETransformerLayer(nn.Module):
    """PE attention layer + FFN (``pe_transformer.py:108-132``)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, input_embeddings,
                 memory_embeddings, memory_masks=None):
        hidden, aux = PEAttentionLayer(self.d_model, self.num_heads)(
            input_states, memory_states, input_embeddings, memory_embeddings,
            memory_masks,
        )
        return AttentionOutput(self.d_model, self.activation_fn)(hidden), aux


class LRPEMultiHeadAttention(nn.Module):
    """Learnable relative positional embedding attention
    (``lrpe_transformer.py:20-105``): a learned bank of ``num_embeddings``
    position vectors scores against the query, gathered per pair by integer
    relative-position indices.  ``key_masks``: True = valid."""

    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, emb_indices_qk,
                 key_masks=None):
        h = self.num_heads
        dh = self.d_model // h
        q = _split_heads(TorchLinear(self.d_model)(input_q), h)  # (B, H, N, c)
        k = _split_heads(TorchLinear(self.d_model)(input_k), h)
        v = _split_heads(TorchLinear(self.d_model)(input_v), h)
        bank = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.num_embeddings, self.d_model),
        ).reshape(self.num_embeddings, h, dh)
        # (B, H, N, P) scores against the whole bank, then gather per (n, m)
        sp_all = jnp.einsum("bhnc,phc->bhnp", q, bank, precision=prec.feature())
        idx = jnp.broadcast_to(
            emb_indices_qk[:, None],
            (q.shape[0], h) + emb_indices_qk.shape[1:],
        )
        sp = jnp.take_along_axis(sp_all, idx, axis=-1)  # (B, H, N, M)
        se = jnp.einsum("bhnc,bhmc->bhnm", q, k, precision=prec.feature())
        scores = (se + sp) / np.sqrt(dh)
        if key_masks is not None:
            scores = jnp.where(key_masks[:, None, None, :], scores, _NEG)
        scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v, precision=prec.feature())
        return _merge_heads(hidden), {"scores": scores}


class LRPEAttentionLayer(nn.Module):
    """LRPE attention + linear + LN residual (``lrpe_transformer.py:108-124``)."""

    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, input_states, memory_states, position_states,
                 memory_masks=None):
        hidden, aux = LRPEMultiHeadAttention(
            self.d_model, self.num_heads, self.num_embeddings
        )(input_states, memory_states, memory_states, position_states,
          key_masks=memory_masks)
        hidden = TorchLinear(self.d_model)(hidden)
        return LayerNorm()(hidden + input_states), aux


class LRPETransformerLayer(nn.Module):
    """LRPE attention layer + FFN (``lrpe_transformer.py:126-148``)."""

    d_model: int
    num_heads: int
    num_embeddings: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, position_states,
                 memory_masks=None):
        hidden, aux = LRPEAttentionLayer(
            self.d_model, self.num_heads, self.num_embeddings
        )(input_states, memory_states, position_states, memory_masks)
        return AttentionOutput(self.d_model, self.activation_fn)(hidden), aux


class RPEAttentionLayer(nn.Module):
    """RPE attention + linear + LN residual (``rpe_transformer.py:134-165``)."""

    d_model: int
    num_heads: int
    equivariant: bool = False
    d_equiv_embed: int = 0
    kanchor: int = 0

    @nn.compact
    def __call__(self, input_states, memory_states, position_states,
                 memory_masks=None, equiv_states=None, points=None,
                 use_flash=False, femb_pack=None):
        hidden, aux = RPEMultiHeadAttention(
            self.d_model, self.num_heads, equivariant=self.equivariant,
            d_equiv_embed=self.d_equiv_embed, kanchor=self.kanchor,
        )(input_states, memory_states, memory_states, position_states,
          key_masks=memory_masks, embed_eq=equiv_states, points=points,
          use_flash=use_flash, femb_pack=femb_pack)
        hidden = TorchLinear(self.d_model)(hidden)
        return LayerNorm()(hidden + input_states), aux


class RPETransformerLayer(nn.Module):
    """RPE attention layer + FFN (``rpe_transformer.py:168-195``)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    equivariant: bool = False
    d_equiv_embed: int = 0
    kanchor: int = 0

    @nn.compact
    def __call__(self, input_states, memory_states, position_states,
                 memory_masks=None, equiv_states=None, points=None,
                 use_flash=False, femb_pack=None):
        hidden, aux = RPEAttentionLayer(
            self.d_model, self.num_heads, equivariant=self.equivariant,
            d_equiv_embed=self.d_equiv_embed, kanchor=self.kanchor,
        )(input_states, memory_states, position_states, memory_masks,
          equiv_states, points=points, use_flash=use_flash,
          femb_pack=femb_pack)
        return AttentionOutput(self.d_model, self.activation_fn)(hidden), aux

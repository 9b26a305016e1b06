r"""Pallas TPU kernel: windowed one-hot neighbor gather + influence contraction.

The E2PN/KPConv convolutions are *gather-bound* on TPU: XLA row gathers cost
~8.4 ns/row regardless of width, and each conv fetches ``B*N*H`` feature rows
(~13 ms for the production stage-0 conv alone).  This kernel replaces the
row gather + the ``wf`` einsum (``epn.py KPConvInterSO3.__call__``) with dense
MXU work over per-block source windows:

1. Host side (``pipeline.build_window_maps``): points are Morton-ordered, so
   the neighbors of each 128-query block live in <= ~18 source segments of 128
   rows; the pipeline emits per-block segment lists and window-local neighbor
   indices.
2. ``segment_window_gather`` (XLA): materializes the per-block windows with a
   tiny one-hot matmul over *segments* — (nblk_q*S, nblk_s) @ (nblk_s, 128*AC)
   runs at HBM bandwidth, unlike large-slice gathers which lower pathologically.
3. The kernel: per query block, builds neighbor one-hots in VMEM chunk-by-chunk
   and computes ``wf[p,k,ac] = sum_h infl[p,h,k] * win[local[p,h], ac]`` with
   two MXU matmuls per chunk — no per-row fetches anywhere.

Inference-path only (no custom VJP); training keeps the XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 128  # must match pipeline.WINDOW_SEG
P = 128  # query rows per kernel block


def segment_window_gather(x, seg_idx):
    """x: (B, Ns, AC); seg_idx: (B, nblk_q, S) -> windows (B, nblk_q, S*SEG, AC).

    One-hot segment matmul — see module docstring.  ``Ns`` is zero-padded up
    to a multiple of SEG.
    """
    b, ns, ac = x.shape
    nblk_s = (ns + SEG - 1) // SEG
    pad = nblk_s * SEG - ns
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    segs = x.reshape(b, nblk_s, SEG * ac)
    nblk_q, s = seg_idx.shape[1:]
    oh = jax.nn.one_hot(seg_idx.reshape(b, nblk_q * s), nblk_s, dtype=x.dtype)
    win = jnp.einsum("bqn,bnd->bqd", oh, segs)
    return win.reshape(b, nblk_q, s * SEG, ac)


MP = 32  # query rows per M-construction kernel block (VMEM-bound)


def _m_kernel(local_ref, infl_ref, out_ref, acc, *, hc, n_hc, w, k):
    """M[p, k, w] = sum_h infl[p,h,k] * onehot(local[p,h])[w].

    M is *feature-independent*: the backbone builds it once per
    (stage, neighbor set) and every conv on that set reduces to a plain
    batched matmul ``wf = M @ window`` (XLA, MXU-shaped).
    """
    acc[...] = jnp.zeros_like(acc)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (MP, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(jnp.bfloat16)  # (MP, HC, W)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        acc[...] += jax.lax.dot_general(
            ic, oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, W)
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w", "hc", "interpret", "out_dtype")
)
def build_m_pallas(local, infl, *, w, hc=8, interpret=False,
                   out_dtype=jnp.bfloat16):
    """Build the per-block gather matrices M (B, nblk128, 128, K, W) bf16.

    local: (B, Nq, H) int32 window-local neighbor idx (sentinel = w);
    infl: (B, Nq, H, K).  ``w`` must equal the window width used by
    :func:`segment_window_gather` for the same neighbor set.
    """
    b, nq, h = local.shape
    k = infl.shape[3]
    nblk_q = (nq + SEG - 1) // SEG
    q_pad = nblk_q * SEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, 0), (0, h_pad - h), (0, 0)))

    nsub = nblk_q * (SEG // MP)
    mdtype = jnp.dtype(out_dtype)
    kernel = functools.partial(_m_kernel, hc=hc, n_hc=h_pad // hc, w=w, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, MP, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, MP, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, MP, k, w), lambda bi, i: (bi, i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nsub, MP, k, w), mdtype),
        scratch_shapes=[pltpu.VMEM((MP, k, w), jnp.float32)],
        interpret=interpret,
    )(
        local.reshape(b, nsub, MP, h_pad),
        infl.reshape(b, nsub, MP, h_pad, k).astype(mdtype),
    )
    return out.reshape(b, nblk_q, SEG, k, w)


def m_apply(m, windows, nq):
    """wf[b, n, k, ac] = sum_w M[b, blk(n), n%128, k, w] * win[b, blk(n), w, ac].

    Plain XLA batched matmul — MXU-shaped (128*K, W) @ (W, AC) per block.
    """
    b, nblk, seg, k, w = m.shape
    ac = windows.shape[-1]
    wf = jax.lax.dot_general(
        m.reshape(b, nblk, seg * k, w), windows,
        ((( 3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (B, nblk, SEG*K, AC)
    return wf.reshape(b, nblk * seg, k, ac)[:, :nq]


def _wf_kernel(local_ref, infl_ref, win_ref, out_ref, acc, *, hc, n_hc, w, k, ac):
    """Per (b, block): wf[p, k, ac] = sum_h infl[p,h,k] * win[local[p,h], ac].

    The accumulator stays (P, K, AC): merging the trailing dims would be a
    lane-breaking reshape Mosaic cannot lower.
    """
    acc[...] = jnp.zeros_like(acc)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (P, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (P, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(P * hc, w)
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32)  # (P*HC, AC)
        g = g.reshape(P, hc, ac).astype(win.dtype)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (P, HC, K)
        acc[...] += jax.lax.dot_general(
            ic, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (P, K, AC)
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hc", "interpret"))
def windowed_gather_wf(local, infl, windows, *, hc=8, interpret=False):
    """Fused neighbor gather + influence contraction.

    local:   (B, Nq, H) int32 window-local neighbor idx, sentinel = W
    infl:    (B, Nq, H, K) influence weights (invalid h already zeroed)
    windows: (B, nblk_q, W, AC) per-block source windows
    returns  wf (B, Nq, K, AC) float32

    Equivalent to ``einsum('bnhac,bnhk->bnkac')`` over sentinel-masked
    gathered neighbors (``epn.py:208-209``), without the row gather.
    """
    b, nq, h = local.shape
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    assert nblk_q * P >= nq, (nq, nblk_q)
    q_pad = nblk_q * P - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, 0), (0, h_pad - h), (0, 0)))

    dtype = windows.dtype
    kernel = functools.partial(
        _wf_kernel, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nblk_q),
        in_specs=[
            pl.BlockSpec((1, 1, P, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, P, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, w, ac), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, P, k, ac), lambda bi, i: (bi, i, 0, 0, 0)
        ),
        # bf16 output halves the double-buffered out-block VMEM footprint
        # (the f32 accumulator scratch keeps the summation exact)
        out_shape=jax.ShapeDtypeStruct((b, nblk_q, P, k, ac), dtype),
        scratch_shapes=[pltpu.VMEM((P, k, ac), jnp.float32)],
        interpret=interpret,
    )(
        local.reshape(b, nblk_q, P, h_pad),
        infl.reshape(b, nblk_q, P, h_pad, k).astype(dtype),
        windows,
    )
    return out.reshape(b, nblk_q * P, k, ac)[:, :nq].astype(jnp.float32)

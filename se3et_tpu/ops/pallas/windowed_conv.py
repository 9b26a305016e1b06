r"""Pallas TPU kernel: windowed one-hot neighbor gather + influence contraction.

The E2PN/KPConv convolutions are *gather-bound* on TPU: XLA row gathers cost
~8.4 ns/row regardless of width, and each conv fetches ``B*N*H`` feature rows
(~13 ms for the production stage-0 conv alone).  This kernel replaces the
row gather + the ``wf`` einsum (``epn.py KPConvInterSO3.__call__``) with dense
MXU work over per-block source windows:

1. Host side (``pipeline.build_window_maps``): points are Morton-ordered, so
   the neighbors of each QSEG=64-query block live in a handful of source
   segments of SSEG=16 rows (8 on per-set-calibrated stage-0 sets — each
   granularity halving has cut the summed window width 15-35% at matched
   drop rates, and kernel cost is linear in W); the pipeline emits per-block
   segment lists and window-local neighbor indices.
2. ``segment_window_gather`` (XLA): materializes the per-block windows with a
   tiny one-hot matmul over *segments* — (nblk_q*S, nblk_s) @ (nblk_s, 64*AC)
   runs at HBM bandwidth, unlike large-slice gathers which lower pathologically.
3. The kernel: per query block, builds neighbor one-hots in VMEM chunk-by-chunk
   and computes ``wf[p,k,ac] = sum_h infl[p,h,k] * win[local[p,h], ac]`` with
   two MXU matmuls per chunk — no per-row fetches anywhere.

Inference-path only (no custom VJP); training keeps the XLA gather.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QSEG = 64  # query rows per window block; must match pipeline.WINDOW_QSEG
SSEG = 16  # source rows per window segment; must match pipeline.WINDOW_SSEG

# Trace-time ledger of MODEL FLOPs executed inside the fused kernels: the
# compiled executable's ``cost_analysis()`` cannot see into Mosaic custom
# calls, so once the expanded weight matmuls moved in-kernel (wf_mm,
# BENCH.md round 5) the serving bench under-reported model TFLOPs/MFU by
# ~1 TFLOP/pair.  The CALLER (``nn/epn.py``) appends each fused conv's
# weight-matmul FLOPs here at trace time — the mm wrappers themselves are
# inner-jitted, so their Python bodies run once per distinct shape, not
# per call.  Consumers (bench.py) clear the list immediately before
# tracing the forward and sum it afterwards.  Only the *weight* matmul
# counts — the one-hot gather/contraction matmuls are implementation
# traffic, not model FLOPs (they were never XLA-counted).
TRACE_MM_FLOPS: list[float] = []


def pick_hc(h: int) -> int:
    """Neighbor-chunk size for the windowed kernels.

    Fewest chunks whose width is a sublane multiple, capped at 40: at the
    production H=36-40 a single full-H chunk (one big one-hot matmul + one
    40-deep batched contraction per block) measured 5-10% faster than the
    old hc=8 (5 shallow chunk iterations) on every conv set — see BENCH.md
    round-3 hc sweep.  Must stay in sync with the host influence pre-pad
    (``data/influence.py``).
    """
    n_chunks = (h + 39) // 40
    per = (h + n_chunks - 1) // n_chunks
    return ((per + 7) // 8) * 8


@jax.custom_vjp
def _seg_gather_rows(segs, idx):
    """rows[b, r] = segs[b, idx[b, r]] — exact row gather of segment rows.

    Forward: ``take_along_axis`` (~8.4 ns/row + bandwidth — no FLOPs; the
    one-hot einsum it replaces costs rows * nblk_s * row_width MACs, a
    hidden multi-GFLOP block per conv at production slot counts).
    Backward: the one-hot transpose einsum (d_segs = oh^T @ d_rows), i.e.
    scatter-add expressed as ONE matmul — XLA's native gather transpose is
    a serialized scatter, the exact pathology the fused-conv custom VJPs
    exist to avoid.
    """
    return jnp.take_along_axis(segs, idx[:, :, None], axis=1)


def _seg_gather_rows_fwd(segs, idx):
    return _seg_gather_rows(segs, idx), (idx, segs.shape[1])


def _seg_gather_rows_bwd(res, d_rows):
    idx, nblk_s = res
    oh = jax.nn.one_hot(idx, nblk_s, dtype=d_rows.dtype)
    d_segs = jnp.einsum("bqn,bqd->bnd", oh, d_rows)
    return d_segs, np.zeros(idx.shape, jax.dtypes.float0)


_seg_gather_rows.defvjp(_seg_gather_rows_fwd, _seg_gather_rows_bwd)


def segment_window_gather(x, seg_idx, precision=None, sseg=SSEG):
    """x: (B, Ns, AC); seg_idx: (B, nblk_q, S) -> windows (B, nblk_q, S*sseg, AC).

    One-hot segment matmul — see module docstring.  ``Ns`` is zero-padded up
    to a multiple of ``sseg`` (the per-set segment granularity the window
    maps were built at — default :data:`SSEG`).  Pass
    ``precision=jax.lax.Precision.HIGHEST`` when gathering fp32
    *coordinates* (the TPU default matmul precision would round them to
    bf16).

    The implementation is chosen PER SHAPE (override with
    ``SE3ET_SEG_GATHER=take|onehot``): the row gather
    (:func:`_seg_gather_rows` — bit-exact selection in any dtype, zero
    FLOPs forward, one-hot-transpose matmul backward) for segment rows up
    to 6144 elements wide, the one-hot matmul above.  Measured crossover
    (chip A/B, scripts/bench_seg_gather.py, BENCH.md round 5): take wins
    -0.5..-2.7 ms per call at widths <= 6144 (the gather is
    row-count-cheap and moves only W useful rows; the one-hot pays
    rows*nblk_s*width MACs), ties at 12288, loses +1.0 ms at 24576 (wide
    rows amortize the MXU pass while the gather goes descriptor-bound).
    """
    import os

    b, ns, ac = x.shape
    nblk_s = (ns + sseg - 1) // sseg
    pad = nblk_s * sseg - ns
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    segs = x.reshape(b, nblk_s, sseg * ac)
    nblk_q, s = seg_idx.shape[1:]
    mode = os.environ.get("SE3ET_SEG_GATHER", "auto")
    if mode == "auto":
        mode = "take" if sseg * ac <= 6144 else "onehot"
    if mode == "take":
        win = _seg_gather_rows(segs, seg_idx.reshape(b, nblk_q * s))
        return win.reshape(b, nblk_q, s * sseg, ac)
    oh = jax.nn.one_hot(seg_idx.reshape(b, nblk_q * s), nblk_s, dtype=x.dtype)
    win = jnp.einsum("bqn,bnd->bqd", oh, segs, precision=precision)
    return win.reshape(b, nblk_q, s * sseg, ac)


def _infl_kernel(local_ref, q4_ref, win_ref, kp_ref, out_ref, is_ref, isacc,
                 *, mp, hc, n_hc, w, k, sigma, influence):
    """Influence weights from window coordinates (no per-row gathers).

    Per MP-row query block:
      infl[p, h, k] = f_sigma(|win[local[p,h]] - q[p] - kernel_point[k]|)
      inf_sum[p, k] = sum_h infl[p,h,k]     (the all-ones first conv's wf)

    The squared kernel-point distance is expanded as ``|rel|^2 - 2 rel.kp +
    |kp|^2`` with ``rel = nbr - q`` and ``|rel|^2 = |nbr|^2 - 2 nbr.q +
    |q|^2``.  Neighbor coordinates are gathered through a bf16 one-hot
    matmul over a DOUBLE-bf16 window ``[hi | lo]`` (x = hi + lo with
    hi = bf16(x), lo = bf16(x - hi)): one-hot selection is exact in bf16 and
    the reconstruction error is ~2^-18 relative — fp32-grade geometry at
    half the matmul cost of an f32 one-hot (f32 MXU passes dominated the
    kernel: 8.5 ms at the stage-0 production set).
    """
    q4 = q4_ref[0, 0]  # (MP, 4): x, y, z, |q|^2
    win = win_ref[0, 0]  # (W, 8) bf16: hi3, lo3, 0, 0
    kp4t = kp_ref[...]  # (4, K): rows x, y, z, |kp|^2
    kp3t = kp4t[:3]
    kp2 = kp4t[3]
    q3 = q4[:, :3]
    q2 = q4[:, 3]
    qdotk = jnp.dot(q3, kp3t, preferred_element_type=jnp.float32)  # (MP, K)
    isacc[...] = jnp.zeros_like(isacc)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(jnp.bfloat16)  # (MP, HC, W)
        g = jnp.dot(
            oh.reshape(mp * hc, w), win, preferred_element_type=jnp.float32
        )  # (MP*HC, 8) fp32
        nbr3 = g[:, :3] + g[:, 3:6]  # hi + lo
        n2 = jnp.sum(nbr3 * nbr3, axis=-1).reshape(mp, hc)
        ndotq = jnp.sum(nbr3.reshape(mp, hc, 3) * q3[:, None, :], axis=-1)
        rel2 = n2 - 2.0 * ndotq + q2[:, None]
        ncrossk = jnp.dot(
            nbr3, kp3t, preferred_element_type=jnp.float32
        ).reshape(mp, hc, k)
        sq = jnp.maximum(
            rel2[:, :, None] - 2.0 * (ncrossk - qdotk[:, None, :]) + kp2, 0.0
        )
        if influence == "linear":
            infl = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
        elif influence == "constant":
            infl = jnp.ones_like(sq)
        elif influence == "gaussian":
            sig2 = (sigma * 0.3) ** 2
            infl = jnp.exp(-sq / (2.0 * sig2))
        else:
            raise ValueError(influence)
        # sentinel / overflow neighbors (minor-dim insertion must happen on
        # the 32-bit operand — Mosaic cannot reshape i1 vectors)
        infl = infl * (loc[:, :, None] < w).astype(jnp.float32)
        isacc[...] += jnp.sum(infl, axis=1)
        out_ref[0, 0, :, c * hc:(c + 1) * hc, :] = infl.astype(out_ref.dtype)
    is_ref[0, 0] = isacc[...].astype(is_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "influence", "hc", "interpret", "out_dtype"),
)
def influence_windowed_pallas(local, q_points, win_points, kernel_points, *,
                              sigma, influence="linear", hc=None,
                              interpret=False, out_dtype=jnp.bfloat16):
    """Windowed influence-weight computation: geometry -> (infl, inf_sum).

    local:         (B, Nq, H) int32 window-local neighbor idx (sentinel = W)
    q_points:      (B, Nq, 3) fp32 query coordinates (padded rows are zero;
                   their ``local`` rows are all-sentinel so they produce 0)
    win_points:    (B, nblk_q, W, 3) fp32 per-block source-coordinate windows
                   (``segment_window_gather`` at HIGHEST precision)
    kernel_points: (K, 3) fp32
    returns        infl (B, Nq, H, K) ``out_dtype``, inf_sum (B, Nq, K) fp32

    Replaces the XLA influence path (``epn._influence_weights``), whose
    neighbor-coordinate fetch pays the ~8.4 ns/row TPU gather cost for
    B*N*H rows per (stage, neighbor set).
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    nblk_q, w, _ = win_points.shape[1:]
    k = kernel_points.shape[0]
    assert nblk_q * QSEG >= nq, (nq, nblk_q)
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        q_points = jnp.pad(q_points, ((0, 0), (0, q_pad), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)

    q4 = jnp.concatenate(
        [q_points, jnp.sum(q_points**2, axis=-1, keepdims=True)], axis=-1
    )
    hi = win_points.astype(jnp.bfloat16)
    lo = (win_points - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    win8 = jnp.concatenate(
        [hi, lo, jnp.zeros(win_points.shape[:-1] + (2,), jnp.bfloat16)],
        axis=-1,
    )
    kp4t = jnp.concatenate(
        [kernel_points, jnp.sum(kernel_points**2, axis=-1, keepdims=True)],
        axis=-1,
    ).T.astype(jnp.float32)  # (4, K)

    # 32 query rows per invocation: measured best overall (MP = QSEG showed a
    # pathological 42 ms outlier at the stage-3 subsampling set and no gain
    # elsewhere — the kernel is VPU-layout-bound, not refetch-bound)
    mp = 32
    sub_per_blk = QSEG // mp
    nsub = nblk_q * sub_per_blk
    kernel = functools.partial(
        _infl_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k,
        sigma=float(sigma), influence=influence,
    )
    infl, inf_sum = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, 4), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, 8),
                lambda bi, i, spb=sub_per_blk: (bi, i // spb, 0, 0),
            ),
            pl.BlockSpec((4, k), lambda bi, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, mp, k), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nsub, mp, h_pad, k), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((b, nsub, mp, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((mp, k), jnp.float32)],
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        q4.reshape(b, nsub, mp, 4),
        win8,
        kp4t,
    )
    infl = infl.reshape(b, nblk_q * QSEG, h_pad, k)[:, :nq, :h]
    inf_sum = inf_sum.reshape(b, nblk_q * QSEG, k)[:, :nq]
    return infl, inf_sum


def _wf_kernel(local_ref, infl_ref, win_ref, out_ref, acc, *, mp, hc, n_hc, w,
               k, ac):
    """Per (b, sub-block): wf[p, k, ac] = sum_h infl[p,h,k] * win[local[p,h], ac].

    The accumulator stays (MP, K, AC) (merging the trailing dims would be a
    lane-breaking reshape Mosaic cannot lower), but the HBM output is written
    FLAT (MP, K*AC) via per-k lane-slice copies: the consumer is the conv
    weight matmul over (K*A*Cin,) and an XLA reshape of a (..., 15, AC) bf16
    tensor repacks sublane tiles (~1.5 ms per conv at stage-1 production
    shapes).
    """
    acc[...] = jnp.zeros_like(acc)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(mp * hc, w)
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32)  # (MP*HC, AC)
        g = g.reshape(mp, hc, ac).astype(win.dtype)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        acc[...] += jax.lax.dot_general(
            ic, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, AC)
    for kk in range(k):
        out_ref[0, 0, :, kk * ac:(kk + 1) * ac] = acc[:, kk, :].astype(
            out_ref.dtype
        )


def _wf_mm_epilogue(out_kac, rhs_ref, k, ac, cast_dtype):
    """(MP, K, AC) f32 conv accumulator -> (MP, AC_out) f32 block output.

    Applies the conv's expanded weight matmul (``epn.py KPConvInterSO3``,
    the cin<256 EXPANDED contraction) INSIDE the kernel as K lane-sliced
    matmuls — the flat (MP, K*AC) reshape Mosaic cannot lower is never
    needed because the weight is consumed per kernel point.  The per-k
    bf16 cast matches the XLA path's bf16 ``wf`` rounding exactly: the
    fused result differs from the unfused one only by skipping the
    (B, N, K*AC) HBM round-trip (write + matmul re-read — the largest
    intermediate of the backbone's serving graph, 230 MB per stage-1
    conv at production 3DMatch shapes).
    """
    o = None
    for kk in range(k):
        lhs = out_kac[:, kk, :].astype(cast_dtype)
        d = jnp.dot(lhs, rhs_ref[kk * ac:(kk + 1) * ac, :],
                    preferred_element_type=jnp.float32)
        o = d if o is None else o + d
    return o


def _wf_kernel_mm(local_ref, infl_ref, win_ref, rhs_ref, out_ref, acc, *, mp,
                  hc, n_hc, w, k, ac):
    """:func:`_wf_kernel` + fused weight matmul (see ``_wf_mm_epilogue``)."""
    acc[...] = jnp.zeros_like(acc)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(mp * hc, w)
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32)  # (MP*HC, AC)
        g = g.reshape(mp, hc, ac).astype(win.dtype)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        acc[...] += jax.lax.dot_general(
            ic, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, AC)
    o = _wf_mm_epilogue(acc[...], rhs_ref, k, ac, win.dtype)
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _wf_kernel_kfirst_mm(local_ref, infl_ref, win_ref, rhs_ref, out_ref, sacc,
                         iacc, *, mp, hc, n_hc, w, k, ac):
    """:func:`_wf_kernel_kfirst` + fused weight matmul.

    The s@win intermediate is STAGED THROUGH SCRATCH (``iacc``) before the
    epilogue consumes it: Mosaic crashes on an in-kernel dot consuming
    another dot's register value directly (the round-4 flash-RPE-backward
    crash class, BENCH.md), but a scratch store/load between them compiles
    (the pattern :func:`_wf_kernel_kfirst` already relies on for ``sacc``).
    """
    sacc[...] = jnp.zeros_like(sacc)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(jnp.bfloat16)  # (MP, HC, W)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        sacc[...] += jax.lax.dot_general(
            ic, oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, W)
    s = sacc[...].astype(win.dtype).reshape(mp * k, w)
    iacc[...] = jnp.dot(
        s, win, preferred_element_type=jnp.float32
    ).reshape(mp, k, ac)
    o = _wf_mm_epilogue(iacc[...], rhs_ref, k, ac, win.dtype)
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _wf_kernel_kfirst(local_ref, infl_ref, win_ref, out_ref, sacc, *, mp, hc,
                      n_hc, w, k, ac):
    """K-first variant: contract influence with the one-hot BEFORE the window.

    Per (b, sub-block):
      S[p, k, w']   = sum_h infl[p,h,k] * 1[local[p,h] == w']   (scatter)
      wf[p, k, ac]  = S[p, k, :] @ win                          (gather matmul)

    The gather matmul's row count drops from MP*HC to MP*K — with K=15
    kernel points vs HC=24-40 neighbor columns that is 1.6-2.7x fewer MACs
    on the kernel's dominant term (the scatter is a tiny batched matmul,
    MP x (K, HC) @ (HC, W)).  Mathematically identical to ``_wf_kernel``
    up to bf16 rounding of the scattered influence sums (same rounding
    class as the original's bf16 gathered-feature rounding).
    """
    sacc[...] = jnp.zeros_like(sacc)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(jnp.bfloat16)  # (MP, HC, W)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        sacc[...] += jax.lax.dot_general(
            ic, oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, W)
    s = sacc[...].astype(win.dtype).reshape(mp * k, w)
    out = jnp.dot(s, win, preferred_element_type=jnp.float32)  # (MP*K, AC)
    out = out.reshape(mp, k, ac)  # leading-dim split: free
    for kk in range(k):  # flat (MP, K*AC) write via per-k lane slices
        out_ref[0, 0, :, kk * ac:(kk + 1) * ac] = out[:, kk, :].astype(
            out_ref.dtype
        )


def _wf_bwd_win_kernel(local_ref, infl_ref, dout_ref, dwin_ref, sacc, *, mp,
                       hc, n_hc, w, k, ac, spb):
    """d_windows[w', ac] = sum_{p,k} S[p,k,w'] * d_out[p,k,ac].

    S is the K-first scatter matrix (``_wf_kernel_kfirst``); its transpose
    turns the conv's backward-by-features into ONE (W, MP*K) x (MP*K, AC)
    matmul per sub-block — no scatter-adds (XLA lowers the gather path's
    backward as a serialized scatter, the dominant cost of the XLA train
    step's conv layers).  Sub-blocks of the same window block accumulate into
    the revisited output block.
    """
    sub = pl.program_id(1)

    @pl.when(sub % spb == 0)
    def _init():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)

    sacc[...] = jnp.zeros_like(sacc)
    dt = dout_ref.dtype
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(dt)
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        sacc[...] += jax.lax.dot_general(
            ic, oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (MP, K, W)
    s = sacc[...].astype(dt).reshape(mp * k, w)
    # d_out arrives PRE-RESHAPED to (MP*K, AC) blocks (XLA-side): the
    # in-kernel (MP, K*AC) -> (MP*K, AC) cast is only legal when AC is
    # lane-aligned — Mosaic rejects it at AC=192 (round 4, stage-0 train)
    dout = dout_ref[0, 0]
    dwin_ref[0, 0] += jax.lax.dot_general(
        s, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwin_ref.dtype)  # (W, AC)


@functools.partial(
    jax.jit, static_argnames=("nblk_q", "w", "k", "hc", "interpret")
)
def _wf_bwd_win(local, infl, d_out, *, nblk_q, w, k, hc=None,
                interpret=False):
    """Backward of :func:`windowed_gather_wf` w.r.t. ``windows``.

    local: (B, Nq, H); infl: (B, Nq, H, K); d_out: (B, Nq, K*AC) cotangent.
    Returns (B, nblk_q, W, AC) f32.
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    ac = d_out.shape[2] // k
    # shrink the row sub-block until the backward footprint fits the same
    # undercount-adjusted budget the forward enforces (deep-stage convs:
    # w=512, ac=1536 needs mp=16)
    kpad = ((k + 7) // 8) * 8
    mp = 32
    while mp > 8 and (
        mp * kpad * w * 4 + 2 * w * ac * 4 + 2 * mp * k * ac * 4
        + mp * hc * w * 4
    ) > 12.5e6:
        mp //= 2
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
        d_out = jnp.pad(d_out, ((0, 0), (0, q_pad), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    if infl.shape[2] < h_pad:
        infl = jnp.pad(
            infl, ((0, 0), (0, 0), (0, h_pad - infl.shape[2]), (0, 0))
        )
    nsub = nblk_q * spb
    # reshape d_out to (MP*K, AC) blocks in XLA — see _wf_bwd_win_kernel.
    # bf16 matmuls when the training features are bf16; exact f32 otherwise.
    d3 = d_out.reshape(b, nsub, mp * k, ac)
    infl = infl.astype(d_out.dtype)
    kernel = functools.partial(
        _wf_bwd_win_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac,
        spb=spb,
    )
    dwin = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, mp * k, ac), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nblk_q, w, ac), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, k, w), jnp.float32)],
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        infl.reshape(b, nsub, mp, h_pad, k),
        d3,
    )
    return dwin


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def windowed_gather_wf_trainable(local, infl, windows, kfirst=False,
                                 interpret=False):
    """:func:`windowed_gather_wf` with a hand-written backward pass.

    Training-path entry: the forward is the fused windowed kernel; the
    backward w.r.t. ``windows`` is the K-first scatter-transpose matmul
    kernel (``_wf_bwd_win_kernel``) instead of XLA's serialized scatter-add,
    and the backward w.r.t. ``infl`` is an XLA gather formulation (dead-code
    eliminated in the standard train step, where influence is a function of
    the non-differentiated point coordinates only).
    """
    return windowed_gather_wf(local, infl, windows, kfirst=kfirst,
                              interpret=interpret)


def _wf_trainable_fwd(local, infl, windows, kfirst, interpret):
    out = windowed_gather_wf(local, infl, windows, kfirst=kfirst,
                             interpret=interpret)
    return out, (local, infl, windows)


def _wf_trainable_bwd(kfirst, interpret, res, d_out):
    local, infl, windows = res
    b, nq, h = local.shape
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    d_win = _wf_bwd_win(
        local, infl, d_out, nblk_q=nblk_q, w=w, k=k, interpret=interpret
    ).astype(windows.dtype)
    # d_infl[p,h,k] = sum_ac windows[blk(p), local[p,h], ac] * d_out[p,k,ac]
    # — XLA gather formulation; pruned when influence carries no gradient.
    q_pad = nblk_q * QSEG - nq
    loc = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
    idx = loc.reshape(b, nblk_q, QSEG * h)
    g = jnp.take_along_axis(
        windows, jnp.clip(idx, 0, w - 1)[..., None], axis=2
    )  # (B, nblk_q, QSEG*H, AC)
    g = g * (idx[..., None] < w).astype(g.dtype)
    g = g.reshape(b, nblk_q * QSEG, h, ac)[:, :nq]
    d3 = d_out.reshape(b, nq, k, ac)
    d_infl = jnp.einsum("bnhc,bnkc->bnhk", g.astype(jnp.float32),
                        d3.astype(jnp.float32)).astype(infl.dtype)
    return None, d_infl, d_win


windowed_gather_wf_trainable.defvjp(_wf_trainable_fwd, _wf_trainable_bwd)


# VMEM budget the mm-fused kernels size their row sub-block (mp) against;
# 12.5e6 carries the ~15-20% estimate-undercount margin against the 16 MB
# default scoped-VMEM limit (measured for windowed_gather_wf).
# ``SE3ET_WF_BUDGET`` A/Bs the figure without a code edit.  Checked round 5
# (eval_shape trace of the production se3ete.3dmatch serving graph): every
# mm-admitted conv already picks mp=QSEG=64 at this budget — the convs the
# fitters REJECT (s2/s3 neighbor sets) are excluded by the resident
# expanded weight alone (k*ac*ac_out bf16 = 17.7M at ac=ac_out=768), which
# no sub-16 MB budget can admit; raising the budget changes nothing on the
# production shapes.
_MM_BUDGET = float(os.environ.get("SE3ET_WF_BUDGET", 12.5e6))


def _wf_mm_mp(w, ac, ac_out, h, k, kfirst, hc=None, wsz=2):
    """Largest mp (<= QSEG) fitting the matmul-fused conv kernel's scoped
    VMEM budget, or 0 if even mp=16 does not fit.  Mirrors the
    :func:`windowed_gather_wf` estimates with the out block replaced by the
    (much smaller) post-matmul block plus the resident expanded weight
    (fetched once: its block index is constant across grid steps)."""
    if hc is None:
        hc = pick_hc(h)
    kpad = ((k + 7) // 8) * 8  # (mp, K, ·) scratch sublane-pads K to 8
    rhs_bytes = k * ac * ac_out * wsz
    mp = QSEG
    while mp >= 16:
        if kfirst:
            terms = (
                mp * kpad * w * 4      # sacc scratch
                + mp * kpad * ac * 4   # iacc: s@win staging (f32)
                + 2 * w * ac * wsz     # win, double-buffered
                + mp * hc * w * 4      # one-hot chunk
            )
        else:
            terms = (
                mp * kpad * ac * 4     # acc scratch
                + 2 * w * ac * wsz
                + mp * hc * w * 6
            )
        terms += rhs_bytes + 3 * mp * ac_out * 4  # rhs + o + out block x2
        if terms <= _MM_BUDGET:
            return mp
        mp //= 2
    return 0


def windowed_wf_mm_fits(w: int, ac: int, ac_out: int, h: int, k: int = 15,
                        kfirst: bool = False) -> bool:
    """Whether the matmul-fused conv kernel fits VMEM at these sizes.

    Deep stages are excluded by the expanded weight alone (s2/s3 neighbor
    convs: (K*AC, AC_out) = 17.7-70 MB bf16) — they keep the unfused
    two-step path, whose wf intermediate is small there anyway (N <= 2500).
    """
    return _wf_mm_mp(w, ac, ac_out, h, k, kfirst) > 0


def windowed_max_pool_fits(w: int, ac: int, hc: int = 8) -> bool:
    """Whether the max-pool kernel fits VMEM at this (window, channel) size.

    The double-buffered window block (2*W*AC bf16) dominates and does not
    shrink with the row sub-blocking; wide deep-stage skips (AC >= 1536 at
    W = 2048) must fall back to the XLA gather path (cheap there — row count
    is small at coarse stages).
    """
    return 32 * ac * 8 + 2 * w * ac * 2 + 32 * hc * w * 6 <= 14e6


def windowed_max_pool_bwd_fits(w: int, ac: int, hc: int = 8) -> bool:
    """Whether the max-pool BACKWARD kernel also fits VMEM.

    The training route ('grad') needs both directions; the backward holds
    f32 window + dwin + out/dout blocks plus the per-chunk recompute temps.
    f32 throughout (training dtype) and the out accumulation block is
    counted double-buffered.
    """
    mp = 32
    return (
        3 * w * ac * 4          # win (f32) + dwin out block x2
        + 4 * mp * ac * 4       # out, dout, ties, scale
        + mp * hc * w * 4       # one-hot chunk
        + 2 * mp * hc * ac * 4  # gathered g + eq mask
    ) <= 12.5e6


def _max_kernel(local_ref, win_ref, out_ref, acc, *, mp, hc, n_hc, w, ac, h):
    """Per (b, sub-block): out[p, ac] = max_h (win[local[p,h], ac] if valid else 0).

    Sentinel/overflow rows gather to 0 through the one-hot matmul, which IS
    the reference's shadow-zero max semantics (``e2pn/blocks.py max_pool``:
    the zero pad row participates in the max).  Columns added by h-padding
    (h <= j < n_hc*hc) are statically excluded (-inf) — they are not part of
    the reference's candidate set, and a spurious 0 would clip all-negative
    channels.
    """
    acc[...] = jnp.full_like(acc, -jnp.inf)
    win = win_ref[0, 0]  # (W, AC)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(win.dtype).reshape(mp * hc, w)
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32)  # (MP*HC, AC)
        g = g.reshape(mp, hc, ac)
        if (c + 1) * hc > h:  # chunk contains h-padding columns
            col = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, ac), 1)
            g = jnp.where(col < h - c * hc, g, -jnp.inf)
        acc[...] = jnp.maximum(acc[...], jnp.max(g, axis=1))
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


def _max_bwd_kernel(local_ref, win_ref, out_ref, dout_ref, dwin_ref, *, mp,
                    hc, n_hc, w, ac, h, spb):
    """d_windows for the shadow-zero neighbor max-pool.

    Matches ``jnp.max``'s VJP semantics on the gather formulation
    (``epn.max_pool_neighbors``): the cotangent splits evenly among ALL
    tying entries — including the invalid-neighbor shadow zeros when the max
    is 0, whose share is then dropped (the XLA path kills it at the mask
    multiply).  d_win[w', c] = sum_{p, valid h: g==out} d_out[p,c] / ties.
    """
    sub = pl.program_id(1)

    @pl.when(sub % spb == 0)
    def _init():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)

    win = win_ref[0, 0]  # (W, AC)
    out = out_ref[0, 0]  # (MP, AC) — the forward result, f32
    dout = dout_ref[0, 0]  # (MP, AC)
    dt = win.dtype

    def chunk_eq(c):
        """Recomputed gathered values + tie mask for chunk c (nothing kept
        across chunks: keeping n_hc (MP, HC, AC) eq tensors live blows VMEM
        at deep-stage channel widths)."""
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        oh = (loc[:, :, None] == iw).astype(dt).reshape(mp * hc, w)
        g = jnp.dot(oh, win, preferred_element_type=jnp.float32).reshape(
            mp, hc, ac
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (mp, hc), 1) + c * hc
        # i32 validity mask: inserting a minor dim on an i1 tensor crashes
        # the Mosaic compile helper (see CLAUDE.md kernel rules) — insert on
        # the i32 and compare instead
        valid_i = ((loc < w) & (col < h)).astype(jnp.int32)  # (MP, HC)
        # the forward emitted out = dtype(max_f32); round g identically so
        # the tie comparison is exact in f32 and max-preserving in bf16
        gc = g.astype(dt).astype(jnp.float32)
        eq = (gc == out[:, None, :]) & (valid_i[:, :, None] > 0)
        shadow = jnp.sum(((loc >= w) & (col < h)).astype(jnp.float32), axis=1)
        return oh, eq, shadow

    # pass 1: tie counts (+ shadow-zero ties when the max is 0)
    ties = jnp.zeros((mp, ac), jnp.float32)
    n_shadow = jnp.zeros((mp, 1), jnp.float32)
    for c in range(n_hc):
        _, eq, shadow = chunk_eq(c)
        ties += jnp.sum(eq.astype(jnp.float32), axis=1)
        n_shadow += shadow[:, None]
    ties += jnp.where(out == 0.0, n_shadow, 0.0)
    scale = dout.astype(jnp.float32) / jnp.maximum(ties, 1.0)
    # pass 2: recompute per chunk and scatter
    for c in range(n_hc):
        oh, eq, _ = chunk_eq(c)
        md = (eq.astype(jnp.float32) * scale[:, None, :]).astype(dt)
        dwin_ref[0, 0] += jax.lax.dot_general(
            oh, md.reshape(mp * hc, ac), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dwin_ref.dtype)  # (W, AC)


@functools.partial(
    jax.jit, static_argnames=("nblk_q", "h", "hc", "interpret")
)
def _max_bwd_win(local, windows, out, d_out, *, nblk_q, h, hc=8,
                 interpret=False):
    """Backward of :func:`windowed_max_pool` w.r.t. ``windows``.

    out must be the f32 forward maxima (recompute-free exact tie matching).
    Returns (B, nblk_q, W, AC) f32.
    """
    b = local.shape[0]
    w, ac = windows.shape[2:]
    mp = 32
    spb = QSEG // mp
    nq = out.shape[1]
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        out = jnp.pad(out, ((0, 0), (0, q_pad), (0, 0)))
        d_out = jnp.pad(d_out, ((0, 0), (0, q_pad), (0, 0)))
    if local.shape[1] < nblk_q * QSEG:
        local = jnp.pad(
            local, ((0, 0), (0, nblk_q * QSEG - local.shape[1]), (0, 0)),
            constant_values=w,
        )
    h_pad = ((local.shape[2] + hc - 1) // hc) * hc
    if h_pad > local.shape[2]:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - local.shape[2])),
                        constant_values=w)
    nsub = nblk_q * spb
    kernel = functools.partial(
        _max_bwd_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, ac=ac, h=h,
        spb=spb,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
            pl.BlockSpec((1, 1, mp, ac), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, ac), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nblk_q, w, ac), jnp.float32),
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        windows,
        out.reshape(b, nsub, mp, ac).astype(jnp.float32),
        d_out.reshape(b, nsub, mp, ac).astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def windowed_max_pool_trainable(local, windows, nq, hc=8, interpret=False):
    """:func:`windowed_max_pool` with a hand-written backward pass
    (``_max_bwd_kernel``) for the training path."""
    return windowed_max_pool(local, windows, nq, hc=hc, interpret=interpret)


def _max_trainable_fwd(local, windows, nq, hc, interpret):
    out = windowed_max_pool(local, windows, nq, hc=hc, interpret=interpret)
    return out, (local, windows, out)


def _max_trainable_bwd(nq, hc, interpret, res, d_out):
    local, windows, out = res
    h = local.shape[2]
    nblk_q = windows.shape[1]
    d_win = _max_bwd_win(
        local, windows, out.astype(jnp.float32),
        d_out.astype(jnp.float32), nblk_q=nblk_q, h=h, hc=hc,
        interpret=interpret,
    ).astype(windows.dtype)
    return None, d_win


windowed_max_pool_trainable.defvjp(_max_trainable_fwd, _max_trainable_bwd)


@functools.partial(jax.jit, static_argnames=("nq", "hc", "mp", "interpret"))
def windowed_max_pool(local, windows, nq, *, hc=8, mp=None, interpret=False):
    """Windowed neighbor max-pool (strided skip path).

    local:   (B, Nq_pad-compatible, H) int32 window-local idx, sentinel = W
    windows: (B, nblk_q, W, AC) per-block source windows
    returns  (B, nq, AC) in the window dtype

    Replaces ``epn.max_pool_neighbors``'s row gather (B*N*H rows at
    ~8.4 ns/row: 18.7 ms for the stage-0 -> stage-1 skip at production
    3DMatch shapes) with the same one-hot window matmul the conv kernel uses.
    """
    b, nq_in, h = local.shape
    nblk_q, w, ac = windows.shape[1:]
    assert nblk_q * QSEG >= nq_in, (nq_in, nblk_q)
    if mp is None:
        wsz = windows.dtype.itemsize  # f32 training windows double the terms
        mp = QSEG
        while mp > 32 and (
            mp * ac * (4 + wsz * 2) + 2 * w * ac * wsz + mp * hc * w * 6
        ) > 14e6:
            mp //= 2
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq_in
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    nsub = nblk_q * spb
    dtype = windows.dtype
    kernel = functools.partial(
        _max_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, ac=ac, h=h
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, mp, ac), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nsub, mp, ac), dtype),
        scratch_shapes=[pltpu.VMEM((mp, ac), jnp.float32)],
        interpret=interpret,
    )(local.reshape(b, nsub, mp, h_pad), windows)
    return out.reshape(b, nblk_q * QSEG, ac)[:, :nq]


@functools.partial(jax.jit, static_argnames=("hc", "mp", "interpret",
                                             "kfirst"))
def windowed_gather_wf(local, infl, windows, *, hc=None, mp=None,
                       interpret=False, kfirst=False):
    """Fused neighbor gather + influence contraction.

    local:   (B, Nq, H) int32 window-local neighbor idx, sentinel = W
    infl:    (B, Nq, H, K) influence weights (invalid h already zeroed)
    windows: (B, nblk_q, W, AC) per-block source windows
    returns  wf (B, Nq, K*AC) in the window dtype, flat (k, ac) minor order
             — ready for the conv weight matmul without a relayout

    Equivalent to ``einsum('bnhac,bnhk->bnkac')`` over sentinel-masked
    gathered neighbors (``epn.py``), without the row gather.  ``mp`` (query
    rows per kernel invocation, default QSEG) is lowered automatically for
    wide channels so the out block + f32 accumulator + window fit in the
    ~16 MB VMEM budget; sub-blocks of the same window block re-fetch the
    window, so keep ``mp`` as large as fits.
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    assert nblk_q * QSEG >= nq, (nq, nblk_q)
    if mp is None:
        # 12.5 MB budget: the estimate undercounts ~15-20% (measured 16.6M
        # actual vs 13.8M estimated at the stage-3 production conv).  The
        # window/out terms are dtype-aware: the TRAINING path passes f32
        # windows, which doubles them vs the bf16 serving path (round 4:
        # the bf16-hardcoded estimate let a 22.1M f32 stage-1 conv through
        # a 16M limit).
        wsz = windows.dtype.itemsize
        mp = QSEG
        if kfirst:
            kpad = ((k + 7) // 8) * 8
            while mp > 16 and (
                mp * kpad * w * 4 + mp * k * ac * wsz * 2 + 2 * w * ac * wsz
                + mp * hc * w * 4
            ) > 12.5e6:
                mp //= 2
        else:
            while mp > 16 and (
                mp * k * ac * (4 + wsz * 2) + 2 * w * ac * wsz
                + mp * hc * w * 6
            ) > 12.5e6:
                mp //= 2
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    if infl.shape[2] < h_pad:
        # host-precomputed influence arrives pre-padded to the hc multiple —
        # a device-side pad of this (B, N, H, K) tensor relayouts ~1.3 ms
        infl = jnp.pad(
            infl, ((0, 0), (0, 0), (0, h_pad - infl.shape[2]), (0, 0))
        )
    assert infl.shape[2] == h_pad, (infl.shape, h_pad)

    nsub = nblk_q * spb
    dtype = windows.dtype
    if kfirst:
        kernel = functools.partial(
            _wf_kernel_kfirst, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac
        )
        scratch = pltpu.VMEM((mp, k, w), jnp.float32)
    else:
        kernel = functools.partial(
            _wf_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac
        )
        scratch = pltpu.VMEM((mp, k, ac), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, mp, k * ac), lambda bi, i: (bi, i, 0, 0)
        ),
        # bf16 output halves the double-buffered out-block VMEM footprint
        # (the f32 accumulator scratch keeps the summation exact)
        out_shape=jax.ShapeDtypeStruct((b, nsub, mp, k * ac), dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        infl.reshape(b, nsub, mp, h_pad, k).astype(dtype),
        windows,
    )
    return out.reshape(b, nblk_q * QSEG, k * ac)[:, :nq]


@functools.partial(jax.jit, static_argnames=("hc", "interpret", "kfirst"))
def windowed_gather_wf_mm(local, infl, windows, rhs, *, hc=None,
                          interpret=False, kfirst=False):
    """:func:`windowed_gather_wf` + fused expanded weight matmul.

    ``rhs``: (K*AC, AC_out) expanded conv weight (``epn.py`` cin<256
    EXPANDED contraction, flat (k, ac) minor order — exactly the layout
    :func:`windowed_gather_wf` emits).  Returns out (B, Nq, AC_out) f32.
    The weight is consumed per kernel point INSIDE the kernel
    (:func:`_wf_mm_epilogue`), so the (B, Nq, K*AC) wf intermediate — the
    largest HBM tensor of the serving backbone, 115 MB per stage-1 conv at
    production 3DMatch shapes — is never written.  The rhs block index is
    constant across grid steps, so Mosaic fetches it once and keeps it
    VMEM-resident.  Serving-path only (no custom VJP) — gate with
    :func:`windowed_wf_mm_fits`.
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    ac_out = rhs.shape[1]
    assert rhs.shape[0] == k * ac, (rhs.shape, k, ac)
    assert nblk_q * QSEG >= nq, (nq, nblk_q)
    mp = _wf_mm_mp(w, ac, ac_out, h, k, kfirst, hc=hc,
                   wsz=windows.dtype.itemsize)
    assert mp > 0, ("windowed_gather_wf_mm does not fit VMEM; gate with "
                    "windowed_wf_mm_fits", w, ac, ac_out)
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    if infl.shape[2] < h_pad:
        infl = jnp.pad(
            infl, ((0, 0), (0, 0), (0, h_pad - infl.shape[2]), (0, 0))
        )
    assert infl.shape[2] == h_pad, (infl.shape, h_pad)

    nsub = nblk_q * spb
    dtype = windows.dtype
    if kfirst:
        kernel = functools.partial(
            _wf_kernel_kfirst_mm, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k,
            ac=ac,
        )
        scratch = [pltpu.VMEM((mp, k, w), jnp.float32),
                   pltpu.VMEM((mp, k, ac), jnp.float32)]
    else:
        kernel = functools.partial(
            _wf_kernel_mm, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac,
        )
        scratch = [pltpu.VMEM((mp, k, ac), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
            pl.BlockSpec((k * ac, ac_out), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, mp, ac_out), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, nsub, mp, ac_out), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        infl.reshape(b, nsub, mp, h_pad, k).astype(dtype),
        windows,
        rhs.astype(dtype),
    )
    return out.reshape(b, nblk_q * QSEG, ac_out)[:, :nq]


def _wf_max_kernel(local_ref, infl_ref, win_ref, win2_ref, out_ref, out2_ref,
                   wfacc, macc, *, mp, hc, n_hc, w, k, ac, ac2, h, kfirst):
    """Fused conv contraction + strided-skip neighbor max over ONE one-hot.

    The strided bottleneck's conv (over the unary-projected mid features)
    and its skip max-pool (over the raw block-input features) ride the SAME
    neighbor set and window maps (``epn.ResnetBottleneckBlockEPN``); this
    kernel builds each neighbor one-hot once and applies it to both window
    payloads, saving the separate ``_max_kernel`` launch and its one-hot
    rebuild.  Max semantics == ``_max_kernel`` (shadow-zero sentinel rows,
    -inf h-padding columns); wf semantics == ``_wf_kernel`` /
    ``_wf_kernel_kfirst`` per ``kfirst``.  Serving only (no VJP).
    """
    win = win_ref[0, 0]    # (W, AC)
    win2 = win2_ref[0, 0]  # (W, AC2)
    wfacc[...] = jnp.zeros_like(wfacc)
    macc[...] = jnp.full_like(macc, -jnp.inf)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        ohb = loc[:, :, None] == iw  # (MP, HC, W)
        oh2 = ohb.astype(win2.dtype).reshape(mp * hc, w)
        g2 = jnp.dot(
            oh2, win2, preferred_element_type=jnp.float32
        ).reshape(mp, hc, ac2)
        if (c + 1) * hc > h:  # chunk contains h-padding columns
            col = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, ac2), 1)
            g2 = jnp.where(col < h - c * hc, g2, -jnp.inf)
        macc[...] = jnp.maximum(macc[...], jnp.max(g2, axis=1))
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        if kfirst:
            wfacc[...] += jax.lax.dot_general(
                ic, ohb.astype(jnp.bfloat16), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (MP, K, W)
        else:
            g = jnp.dot(
                ohb.astype(win.dtype).reshape(mp * hc, w), win,
                preferred_element_type=jnp.float32,
            ).reshape(mp, hc, ac).astype(win.dtype)
            wfacc[...] += jax.lax.dot_general(
                ic, g, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (MP, K, AC)
    if kfirst:
        s = wfacc[...].astype(win.dtype).reshape(mp * k, w)
        out = jnp.dot(
            s, win, preferred_element_type=jnp.float32
        ).reshape(mp, k, ac)
    else:
        out = wfacc[...]
    for kk in range(k):  # flat (MP, K*AC) write via per-k lane slices
        out_ref[0, 0, :, kk * ac:(kk + 1) * ac] = out[:, kk, :].astype(
            out_ref.dtype
        )
    out2_ref[0, 0] = macc[...].astype(out2_ref.dtype)


def _wf_max_mm_kernel(local_ref, infl_ref, win_ref, win2_ref, rhs_ref,
                      out_ref, out2_ref, wfacc, macc, iacc=None, *, mp, hc,
                      n_hc, w, k, ac, ac2, h, kfirst):
    """:func:`_wf_max_kernel` + fused weight matmul (``_wf_mm_epilogue``).

    One one-hot serves the conv AND the strided-skip max; the conv's
    (MP, K, AC) accumulator is consumed by the expanded weight in-kernel,
    so neither the flat wf intermediate nor the separate matmul exist.
    The kfirst s@win intermediate stages through ``iacc`` scratch (Mosaic
    dot-consuming-dot rule, see :func:`_wf_kernel_kfirst_mm`); non-kfirst
    allocates no ``iacc`` (the epilogue consumes the ``wfacc`` scratch read
    directly).
    """
    win = win_ref[0, 0]    # (W, AC)
    win2 = win2_ref[0, 0]  # (W, AC2)
    wfacc[...] = jnp.zeros_like(wfacc)
    macc[...] = jnp.full_like(macc, -jnp.inf)
    for c in range(n_hc):
        loc = local_ref[0, 0, :, c * hc:(c + 1) * hc]  # (MP, HC)
        iw = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, w), 2)
        ohb = loc[:, :, None] == iw  # (MP, HC, W)
        oh2 = ohb.astype(win2.dtype).reshape(mp * hc, w)
        g2 = jnp.dot(
            oh2, win2, preferred_element_type=jnp.float32
        ).reshape(mp, hc, ac2)
        if (c + 1) * hc > h:  # chunk contains h-padding columns
            col = jax.lax.broadcasted_iota(jnp.int32, (mp, hc, ac2), 1)
            g2 = jnp.where(col < h - c * hc, g2, -jnp.inf)
        macc[...] = jnp.maximum(macc[...], jnp.max(g2, axis=1))
        ic = infl_ref[0, 0, :, c * hc:(c + 1) * hc, :]  # (MP, HC, K)
        if kfirst:
            wfacc[...] += jax.lax.dot_general(
                ic, ohb.astype(jnp.bfloat16), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (MP, K, W)
        else:
            g = jnp.dot(
                ohb.astype(win.dtype).reshape(mp * hc, w), win,
                preferred_element_type=jnp.float32,
            ).reshape(mp, hc, ac).astype(win.dtype)
            wfacc[...] += jax.lax.dot_general(
                ic, g, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (MP, K, AC)
    if kfirst:
        s = wfacc[...].astype(win.dtype).reshape(mp * k, w)
        iacc[...] = jnp.dot(
            s, win, preferred_element_type=jnp.float32
        ).reshape(mp, k, ac)
        o = _wf_mm_epilogue(iacc[...], rhs_ref, k, ac, win.dtype)
    else:
        o = _wf_mm_epilogue(wfacc[...], rhs_ref, k, ac, win.dtype)
    out_ref[0, 0] = o.astype(out_ref.dtype)
    out2_ref[0, 0] = macc[...].astype(out2_ref.dtype)


def _wf_max_mm_mp(w, ac, ac2, ac_out, h, k, kfirst, hc=None, wsz=2):
    """Largest mp (<= QSEG) fitting the matmul-fused conv+skip-max kernel,
    or 0.  :func:`_wf_max_mp`'s terms with the flat out block replaced by
    the post-matmul block + resident expanded weight (:func:`_wf_mm_mp`)."""
    if hc is None:
        hc = pick_hc(h)
    kpad = ((k + 7) // 8) * 8
    rhs_bytes = k * ac * ac_out * wsz
    mp = QSEG
    while mp >= 16:
        max_terms = (
            2 * w * ac2 * wsz
            + mp * ac2 * (4 + wsz * 2)
            + mp * hc * ac2 * 4
        )
        if kfirst:
            wf_terms = (
                mp * kpad * w * 4 + mp * kpad * ac * 4
                + 2 * w * ac * wsz + mp * hc * w * 4
            )
        else:
            wf_terms = (
                mp * kpad * ac * 4 + 2 * w * ac * wsz + mp * hc * w * 6
            )
        total = (wf_terms + max_terms + rhs_bytes
                 + 3 * mp * ac_out * 4)
        if total <= _MM_BUDGET:
            return mp
        mp //= 2
    return 0


def windowed_wf_max_mm_fits(w: int, ac: int, ac2: int, ac_out: int, h: int,
                            k: int = 15, kfirst: bool = False) -> bool:
    """Whether the matmul-fused conv+skip-max kernel fits VMEM."""
    return _wf_max_mm_mp(w, ac, ac2, ac_out, h, k, kfirst) > 0


@functools.partial(jax.jit, static_argnames=("hc", "interpret", "kfirst"))
def windowed_gather_wf_max_mm(local, infl, windows, windows2, rhs, *,
                              hc=None, interpret=False, kfirst=False):
    """:func:`windowed_gather_wf_max` + fused expanded weight matmul.

    Returns ``(out (B, Nq, AC_out) f32, pooled (B, Nq, AC2))``.  Serving
    only (no VJP) — gate with :func:`windowed_wf_max_mm_fits`.
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    ac2 = windows2.shape[3]
    ac_out = rhs.shape[1]
    assert rhs.shape[0] == k * ac, (rhs.shape, k, ac)
    assert nblk_q * QSEG >= nq, (nq, nblk_q)
    mp = _wf_max_mm_mp(w, ac, ac2, ac_out, h, k, kfirst, hc=hc,
                       wsz=windows.dtype.itemsize)
    assert mp > 0, ("windowed_gather_wf_max_mm does not fit VMEM; gate with "
                    "windowed_wf_max_mm_fits", w, ac, ac2, ac_out)
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    if infl.shape[2] < h_pad:
        infl = jnp.pad(
            infl, ((0, 0), (0, 0), (0, h_pad - infl.shape[2]), (0, 0))
        )
    assert infl.shape[2] == h_pad, (infl.shape, h_pad)

    nsub = nblk_q * spb
    dtype = windows.dtype
    kernel = functools.partial(
        _wf_max_mm_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac,
        ac2=ac2, h=h, kfirst=kfirst,
    )
    if kfirst:
        scratch = [pltpu.VMEM((mp, k, w), jnp.float32),
                   pltpu.VMEM((mp, ac2), jnp.float32),
                   pltpu.VMEM((mp, k, ac), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((mp, k, ac), jnp.float32),
                   pltpu.VMEM((mp, ac2), jnp.float32)]
    out, out2 = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, w, ac2), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
            pl.BlockSpec((k * ac, ac_out), lambda bi, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, mp, ac_out), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, ac2), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nsub, mp, ac_out), jnp.float32),
            jax.ShapeDtypeStruct((b, nsub, mp, ac2), windows2.dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        infl.reshape(b, nsub, mp, h_pad, k).astype(dtype),
        windows,
        windows2,
        rhs.astype(dtype),
    )
    return (
        out.reshape(b, nblk_q * QSEG, ac_out)[:, :nq],
        out2.reshape(b, nblk_q * QSEG, ac2)[:, :nq],
    )


def _wf_max_mp(w, ac, ac2, h, k, kfirst, hc=None, wsz=2):
    """Largest mp (<= QSEG) fitting the fused wf+max kernel's scoped-VMEM
    budget, or 0 if even mp=16 does not fit.  Mirrors the
    :func:`windowed_gather_wf` estimates plus the max side's terms
    (double-buffered win2, f32 macc + gathered chunk, out2 block)."""
    if hc is None:
        hc = pick_hc(h)
    kpad = ((k + 7) // 8) * 8
    mp = QSEG
    while mp >= 16:
        max_terms = (
            2 * w * ac2 * wsz          # win2, double-buffered
            + mp * ac2 * (4 + wsz * 2)  # macc f32 + out2 block x2
            + mp * hc * ac2 * 4         # gathered g2 chunk (f32)
        )
        if kfirst:
            wf_terms = (
                mp * kpad * w * 4 + mp * k * ac * wsz * 2
                + 2 * w * ac * wsz + mp * hc * w * 4
            )
        else:
            wf_terms = (
                mp * k * ac * (4 + wsz * 2) + 2 * w * ac * wsz
                + mp * hc * w * 6
            )
        if wf_terms + max_terms <= 12.5e6:
            return mp
        mp //= 2
    return 0


def windowed_wf_max_fits(w: int, ac: int, ac2: int, h: int, k: int = 15,
                         kfirst: bool = False) -> bool:
    """Whether the fused conv+skip-max kernel fits VMEM at these sizes."""
    return _wf_max_mp(w, ac, ac2, h, k, kfirst) > 0


@functools.partial(jax.jit, static_argnames=("hc", "interpret", "kfirst"))
def windowed_gather_wf_max(local, infl, windows, windows2, *, hc=None,
                           interpret=False, kfirst=False):
    """Fused neighbor gather + influence contraction + skip neighbor max.

    Args as :func:`windowed_gather_wf` plus ``windows2`` (B, nblk_q, W, AC2)
    — per-block windows of the strided bottleneck's input features, pooled
    with the SAME neighbor one-hots the conv builds.  Returns
    ``(wf (B, Nq, K*AC), pooled (B, Nq, AC2))``; the pooled output matches
    :func:`windowed_max_pool` exactly.  Serving-path only (no custom VJP) —
    gate with :func:`windowed_wf_max_fits`.
    """
    b, nq, h = local.shape
    if hc is None:
        hc = pick_hc(h)
    k = infl.shape[3]
    nblk_q, w, ac = windows.shape[1:]
    ac2 = windows2.shape[3]
    assert nblk_q * QSEG >= nq, (nq, nblk_q)
    mp = _wf_max_mp(w, ac, ac2, h, k, kfirst, hc=hc,
                    wsz=windows.dtype.itemsize)
    assert mp > 0, ("windowed_gather_wf_max does not fit VMEM; gate with "
                    "windowed_wf_max_fits", w, ac, ac2)
    spb = QSEG // mp
    q_pad = nblk_q * QSEG - nq
    if q_pad:
        local = jnp.pad(local, ((0, 0), (0, q_pad), (0, 0)), constant_values=w)
        infl = jnp.pad(infl, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    h_pad = ((h + hc - 1) // hc) * hc
    if h_pad > h:
        local = jnp.pad(local, ((0, 0), (0, 0), (0, h_pad - h)),
                        constant_values=w)
    if infl.shape[2] < h_pad:
        infl = jnp.pad(
            infl, ((0, 0), (0, 0), (0, h_pad - infl.shape[2]), (0, 0))
        )
    assert infl.shape[2] == h_pad, (infl.shape, h_pad)

    nsub = nblk_q * spb
    dtype = windows.dtype
    kernel = functools.partial(
        _wf_max_kernel, mp=mp, hc=hc, n_hc=h_pad // hc, w=w, k=k, ac=ac,
        ac2=ac2, h=h, kfirst=kfirst,
    )
    wf_scratch = (pltpu.VMEM((mp, k, w), jnp.float32) if kfirst
                  else pltpu.VMEM((mp, k, ac), jnp.float32))
    out, out2 = pl.pallas_call(
        kernel,
        grid=(b, nsub),
        in_specs=[
            pl.BlockSpec((1, 1, mp, h_pad), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, h_pad, k), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, w, ac), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, w, ac2), lambda bi, i, spb=spb: (bi, i // spb, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, mp, k * ac), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, mp, ac2), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nsub, mp, k * ac), dtype),
            jax.ShapeDtypeStruct((b, nsub, mp, ac2), windows2.dtype),
        ],
        scratch_shapes=[wf_scratch, pltpu.VMEM((mp, ac2), jnp.float32)],
        interpret=interpret,
    )(
        local.reshape(b, nsub, mp, h_pad),
        infl.reshape(b, nsub, mp, h_pad, k).astype(dtype),
        windows,
        windows2,
    )
    return (
        out.reshape(b, nblk_q * QSEG, k * ac)[:, :nq],
        out2.reshape(b, nblk_q * QSEG, ac2)[:, :nq],
    )

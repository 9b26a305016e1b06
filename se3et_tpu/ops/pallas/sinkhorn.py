r"""Pallas TPU kernel: fused log-domain Sinkhorn iterations.

The Sinkhorn loop is inherently serial (100 alternating row/column
normalizations, ``learnable_sinkhorn.py:13-18``); as a ``lax.scan`` of XLA ops
each tiny step pays kernel-dispatch overhead (~10 us x 200 steps ~ 10 ms for
the (256, 65, 65) production shape).  This kernel keeps a tile of patch
matrices resident in VMEM and runs the entire iteration loop on the VPU in one
launch.

Inputs are the dustbin-padded score matrices and log-marginals; masked entries
carry ``-inf``-like values exactly as in the XLA path, so results match the
reference algorithm bit-for-intent (property-tested against the scan version).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_CAP = -1e30  # clamp for exp underflow safety


def _sinkhorn_kernel(scores_ref, scores_t_ref, log_mu_ref, log_nu_ref, out_ref,
                     *, num_iterations):
    """Exp-domain Sinkhorn with *fixed* max-shifts, lane-oriented both ways.

    ``logsumexp(scores + v, axis=2) = m_row + log(sum_j exp(scores - m_row)
    * exp(v))`` — the shift ``m_row`` does not need to track ``v`` for
    stability because ``exp(scores - m_row) <= 1`` and ``exp(u), exp(v)`` stay
    well inside fp32 range (marginals are O(log N)).  This turns each of the
    100 serial iterations from two full-matrix logsumexps (max + exp + sum +
    log over (T, M, N), ~6 VPU passes and 2*M*N transcendentals) into two
    multiply-reduce passes over precomputed ``exp`` matrices plus O(M+N)
    transcendentals.

    The column pass runs on the *pre-transposed* copy of the scores so that
    both passes broadcast their vector along sublanes and reduce along lanes
    — a lane-broadcast of a per-row scalar would force a VPU relayout every
    iteration (measured 20 ms vs ~3 ms for the production (256, 65, 65)
    shape).
    """
    scores = scores_ref[:]  # (T, M, N)
    scores_t = scores_t_ref[:]  # (T, N, M)
    log_mu = log_mu_ref[:]  # (T, M)
    log_nu = log_nu_ref[:]  # (T, N)

    m_row = jnp.maximum(jnp.max(scores, axis=2), _NEG_CAP)  # (T, M)
    m_col = jnp.maximum(jnp.max(scores_t, axis=2), _NEG_CAP)  # (T, N)
    e_row = jnp.exp(scores - m_row[:, :, None])  # (T, M, N), <= 1
    e_col_t = jnp.exp(scores_t - m_col[:, :, None])  # (T, N, M), <= 1

    def body(_, carry):
        _, v = carry
        s = jnp.sum(e_row * jnp.exp(v)[:, None, :], axis=2)  # (T, M)
        # clamp before exp: fp32-safe even for degenerate all-masked slabs
        u = jnp.clip(log_mu - m_row - jnp.log(s + 1e-30), -80.0, 80.0)
        t = jnp.sum(e_col_t * jnp.exp(u)[:, None, :], axis=2)  # (T, N)
        v = jnp.clip(log_nu - m_col - jnp.log(t + 1e-30), -80.0, 80.0)
        return (u, v)

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[:] = scores + u[:, :, None] + v[:, None, :]


@functools.partial(jax.jit, static_argnames=("num_iterations", "tile", "interpret"))
def sinkhorn_pallas(
    padded_scores: jnp.ndarray,
    log_mu: jnp.ndarray,
    log_nu: jnp.ndarray,
    num_iterations: int = 100,
    tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run fused Sinkhorn on (B, M, N) padded scores; returns scores + u + v.

    B must be a multiple of ``tile`` (callers pad; the model's patch budget is
    a power of two).
    """
    b, m, n = padded_scores.shape
    # VMEM-fit the batch tile: each grid step holds scores + scores^T + out
    # blocks of (tile, m_pad, n_pad) f32 resident (no HBM streaming inside
    # the iteration loop).  KITTI's patch budget 128 (-> 129 x 129 blocks,
    # tile-padded 136 x 256) overflows the 16 MB scoped limit at tile=32
    # (measured 17.0M, round 4); halve until it fits.
    m_pad = -(-max(m, n) // 8) * 8
    n_pad = -(-max(m, n) // 128) * 128
    while tile > 4 and 3 * tile * m_pad * n_pad * 4 > 12.5e6:
        tile //= 2
    if b % tile != 0:
        pad = tile - b % tile
        padded_scores = jnp.concatenate(
            [padded_scores, jnp.full((pad, m, n), -1e12, padded_scores.dtype)], 0
        )
        log_mu = jnp.concatenate([log_mu, jnp.zeros((pad, m), log_mu.dtype)], 0)
        log_nu = jnp.concatenate([log_nu, jnp.zeros((pad, n), log_nu.dtype)], 0)
    bb = padded_scores.shape[0]

    out = pl.pallas_call(
        functools.partial(_sinkhorn_kernel, num_iterations=num_iterations),
        grid=(bb // tile,),
        # NOTE: no explicit memory_space — BlockSpec(memory_space=VMEM)
        # places the FULL operand in VMEM on this pallas version (the
        # KITTI-shape (256, 129, 129) f32 operand = 17.04M blew the 16M
        # scoped limit regardless of tile, round 4); default blocked
        # staging streams (tile, m, n) slabs instead.
        in_specs=[
            pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, n, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, m), lambda i: (i, 0)),
            pl.BlockSpec((tile, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bb, m, n), padded_scores.dtype),
        interpret=interpret,
    )(padded_scores, jnp.swapaxes(padded_scores, 1, 2), log_mu, log_nu)
    return out[:b]

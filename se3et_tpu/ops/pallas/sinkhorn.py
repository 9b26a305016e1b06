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


def _sinkhorn_kernel(scores_ref, log_mu_ref, log_nu_ref, out_ref, *, num_iterations):
    scores = scores_ref[:]  # (T, M, N)
    log_mu = log_mu_ref[:]  # (T, M)
    log_nu = log_nu_ref[:]  # (T, N)

    def logsumexp(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        m = jnp.maximum(m, _NEG_CAP)  # rows that are fully -inf
        s = jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True)
        return (m + jnp.log(s + 1e-30)).squeeze(axis)

    def body(_, carry):
        u, v = carry
        u = log_mu - logsumexp(scores + v[:, None, :], axis=2)
        v = log_nu - logsumexp(scores + u[:, :, None], axis=1)
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
        in_specs=[
            pl.BlockSpec((tile, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bb, m, n), padded_scores.dtype),
        interpret=interpret,
    )(padded_scores, log_mu, log_nu)
    return out[:b]

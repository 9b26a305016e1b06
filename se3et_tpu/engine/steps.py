r"""Pure jittable train/eval steps, single-pair and batched (data-parallel).

The batched variants vmap the model over a leading pair axis so a mesh can
shard pairs across chips (the reference's DDP strategy, ``base_trainer.py:181``,
expressed as sharded jit — XLA inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from se3et_tpu.nn import loss as loss_lib


def make_train_step(model, loss_cfg, tx, loss_scale: float = 1.0):
    """Single-pair train step: (params, opt_state, data, rng) -> (params, opt, losses).

    ``loss_scale``: static loss scaling for reduced-precision backward
    experiments (loss multiplied before grad, gradients divided after —
    a no-op at 1.0).  Note bf16 shares fp32's exponent range, so scaling
    addresses only true underflow, not mantissa cancellation (see BENCH.md).
    """

    def train_step(params, opt_state, data, rng):
        def loss_fn(p):
            out = model.apply(
                p, data, train=True, with_registration=False, rngs={"targets": rng}
            )
            total, losses = loss_lib.overall_loss(out, data, loss_cfg)
            return total * loss_scale, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if loss_scale != 1.0:
            grads = jax.tree_util.tree_map(lambda g: g / loss_scale, grads)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state
        )
        losses = dict(losses)
        losses["grad_norm"] = gnorm
        return new_params, new_opt, losses

    return train_step


def make_batched_train_step(model, loss_cfg, tx):
    """Batched train step over a leading pair axis: batch dict entries are
    (P, ...) stacked pair pyramids; loss is the mean over pairs.

    With the batch sharded over a 1-D mesh and params replicated, XLA
    partitions the vmapped model per pair and all-reduces the gradients —
    pure data parallelism over ICI.

    An optional ``pair_weights`` (P,) float entry in the batch turns the mean
    into a weighted mean — weight 0 masks a pair out entirely (exact: its
    gradient contribution is zero).  The trainer uses this to pad a trailing
    partial batch up to the device count so ONE jitted signature serves the
    whole epoch (no second production-size compile for leftovers).
    """

    def train_step(params, opt_state, batch, rng):
        batch = dict(batch)
        weights = batch.pop("pair_weights", None)
        num_pairs = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if weights is None:
            weights = jnp.ones((num_pairs,), jnp.float32)
        wsum = jnp.maximum(jnp.sum(weights), 1e-9)

        def wmean(x):
            return jnp.sum(weights * x) / wsum

        def pair_loss(p, data, key):
            out = model.apply(
                p, data, train=True, with_registration=False, rngs={"targets": key}
            )
            total, losses = loss_lib.overall_loss(out, data, loss_cfg)
            return total, losses

        def loss_fn(p):
            keys = jax.random.split(rng, num_pairs)
            totals, losses = jax.vmap(pair_loss, in_axes=(None, 0, 0))(
                p, batch, keys
            )
            return wmean(totals), jax.tree_util.tree_map(wmean, losses)

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        losses = dict(losses)
        losses["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt, losses

    return train_step


def make_forward(model, eval_cfg=None):
    def forward(params, data):
        out = model.apply(params, data, train=False, with_registration=True)
        if eval_cfg is not None:
            out["metrics"] = loss_lib.evaluate(out, data, eval_cfg)
        return out

    return forward

r"""Device-mesh data parallelism for training and evaluation fan-out.

TPU-native replacement for the reference's NCCL DDP layer
(``engine/base_trainer.py:66-72,181-196``, ``utils/torch.py:16-34``).  The
reference's only parallelism is data parallelism over registration pairs
(batch 1 pair/GPU, gradient all-reduce); here the same strategy is expressed
the XLA way: a 1-D ``jax.sharding.Mesh`` over all chips, batched pair pyramids
sharded on the leading (pair) axis, and gradient/metric means via the
collectives XLA inserts for ``jax.jit`` with sharded inputs — riding ICI, not
host networking.

Usage::

    dp = DataParallel()                        # all local devices
    sharded_step = dp.shard_step(train_step)   # batched pair axis sharded
    batch = dp.shard_batch(stacked_pairs)      # host -> device placement
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_pairs(pair_dicts: list[dict]) -> dict:
    """Stack per-pair pyramid dicts along a new leading pair axis."""
    keys = pair_dicts[0].keys()
    return {k: np.stack([d[k] for d in pair_dicts], 0) for k in keys}


class DataParallel:
    """Pair-level data parallelism over a 1-D device mesh."""

    def __init__(self, devices=None, axis_name: str = "dp"):
        devices = devices if devices is not None else jax.devices()
        self.axis_name = axis_name
        self.mesh = Mesh(np.asarray(devices), (axis_name,))
        self.num_devices = len(devices)

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name))

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: dict):
        """Place a stacked batch dict with the pair axis sharded over devices."""
        sharding = self.batch_sharding()
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )

    def replicate(self, tree):
        sharding = self.replicated_sharding()
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), tree
        )

    def shard_step(self, step_fn, donate_argnums=(0, 1)):
        """jit a (params, opt_state, batch, rng) -> (params, opt_state, metrics)
        step with the batch sharded on the pair axis and params/opt replicated;
        XLA inserts the gradient all-reduce over ICI."""
        batch_s = self.batch_sharding()
        repl = self.replicated_sharding()
        return jax.jit(
            step_fn,
            in_shardings=(repl, repl, batch_s, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=donate_argnums,
        )

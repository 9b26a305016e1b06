r"""Training engine: optax optimization, epoch loop, checkpoint/resume.

TPU-native port of ``geotransformer/engine/{base_trainer,epoch_based_trainer}``:

* Adam + per-epoch exponential lr decay (the reference's StepLR(gamma) —
  ``trainval.py:31-38``), weight decay, gradient accumulation
  (``base_trainer.py:210-213``), NaN/Inf gradient skip
  (``base_trainer.py:221-229`` — the reference ipdb-drops; we skip the step and
  count it),
* epoch train loop + per-epoch validation (``epoch_based_trainer.py:82-195``),
* orbax checkpoints: per-epoch snapshots + ``latest`` with model/opt/epoch
  state and resume (``base_trainer.py:112-179``),
* data parallelism over pairs via :mod:`se3et_tpu.parallel.mesh` when multiple
  devices are visible (the reference's DDP, re-expressed as sharded jit).

The model forward is jitted once per (train/val) shape signature; the host side
only feeds pre-padded pyramids from the data pipeline.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se3et_tpu.nn import loss as loss_lib
from se3et_tpu.nn.model import ModelConfig, SE3ETModel
from se3et_tpu.utils.summary import SummaryBoard, Timer, get_logger

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    lr_decay: float = 0.95
    lr_decay_steps: int = 1  # epochs between decays
    weight_decay: float = 1e-6
    max_epoch: int = 40
    grad_acc_steps: int = 1
    max_grad_norm: Optional[float] = None


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam with torch-style decoupled weight decay + stepped exponential lr."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        n = epoch // cfg.lr_decay_steps
        return cfg.lr * (cfg.lr_decay**n)

    chain = []
    if cfg.max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
        )
    )
    tx = optax.chain(*chain)
    if cfg.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_acc_steps)
    return tx


class Trainer:
    """Epoch-based trainer for one experiment."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        loss_cfg: loss_lib.LossConfig,
        eval_cfg: loss_lib.EvalConfig,
        optim_cfg: OptimConfig,
        output_dir: str,
        seed: int = 7351,
        log_steps: int = 10,
        data_parallel: bool | None = None,
        batch_size: int = 1,
    ):
        # data_parallel=None: auto-enable on multi-chip TPU only (the CPU
        # test mesh and the single-chip bench use the per-pair step)
        import jax as _jax

        if data_parallel is None:
            data_parallel = (
                _jax.default_backend() == "tpu" and len(_jax.devices()) > 1
            )
        self.data_parallel = data_parallel
        # single-device pair batching (vmapped step, trailing batch padded at
        # weight 0); independent of data_parallel, which shards pairs across
        # devices instead
        self.batch_size = int(batch_size)
        self.model_cfg = model_cfg
        self.loss_cfg = loss_cfg
        self.eval_cfg = eval_cfg
        self.optim_cfg = optim_cfg
        self.output_dir = output_dir
        self.snapshot_dir = os.path.join(output_dir, "snapshots")
        os.makedirs(self.snapshot_dir, exist_ok=True)
        self.logger = get_logger(os.path.join(output_dir, "logs"))
        from se3et_tpu.utils.metrics_writer import MetricsWriter

        self.metrics_writer = MetricsWriter(os.path.join(output_dir, "events"))
        self.log_steps = log_steps
        self.model = SE3ETModel(model_cfg)
        self.seed = seed
        self.epoch = 0
        self.iteration = 0
        self.params = None
        self.opt_state = None
        self.tx = None
        self._train_step = None
        self._val_step = None

    # ------------------------------------------------------------- setup
    def initialize(self, example_data: dict, steps_per_epoch: int):
        rngs = {
            "params": jax.random.PRNGKey(self.seed),
            "targets": jax.random.PRNGKey(self.seed + 1),
        }
        data = {k: jnp.asarray(v) for k, v in example_data.items()}
        from se3et_tpu.nn.init_util import jit_init

        self.params = jit_init(
            self.model, rngs, data, train=True, with_registration=False
        )
        self.tx = make_optimizer(self.optim_cfg, steps_per_epoch)
        self.opt_state = self.tx.init(self.params)
        num_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params)
        )
        self.logger.info(f"model initialized: {num_params/1e6:.2f}M parameters")

        model, loss_cfg, eval_cfg, tx = self.model, self.loss_cfg, self.eval_cfg, self.tx

        def train_step(params, opt_state, data, rng):
            def loss_fn(p):
                out = model.apply(
                    p, data, train=True, with_registration=False,
                    rngs={"targets": rng},
                )
                total, losses = loss_lib.overall_loss(out, data, loss_cfg)
                return total, losses

            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            gnorm = optax.global_norm(grads)
            ok = jnp.isfinite(gnorm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # skip the update entirely on non-finite gradients
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_opt, opt_state
            )
            losses = dict(losses)
            losses["grad_norm"] = gnorm
            losses["skipped"] = (~ok).astype(jnp.float32)
            return new_params, new_opt, losses

        def val_step(params, data, rng):
            out = model.apply(
                params, data, train=False, with_registration=True,
                rngs={"targets": rng},
            )
            _, losses = loss_lib.overall_loss(out, data, loss_cfg)
            metrics = loss_lib.evaluate(out, data, eval_cfg)
            metrics.update(losses)
            return metrics

        from se3et_tpu.utils.jitopt import (
            serving_jit_options, train_jit_options,
        )

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1),
                                   compiler_options=train_jit_options())
        self._val_step = jax.jit(
            val_step, compiler_options=serving_jit_options(self.model_cfg)
        )

        if self.data_parallel:
            from se3et_tpu.engine.steps import make_batched_train_step
            from se3et_tpu.parallel.mesh import DataParallel

            self._dp = DataParallel()
            batched = make_batched_train_step(model, loss_cfg, tx)
            self._dp_train_step = self._dp.shard_step(batched, donate_argnums=())
            self.params = self._dp.replicate(self.params)
            self.opt_state = self._dp.replicate(self.opt_state)
            self.logger.info(
                f"data parallelism over {self._dp.num_devices} devices"
            )
        else:
            self._dp = None
        if self.batch_size > 1 and self._dp is None:
            from se3et_tpu.engine.steps import make_batched_train_step

            self._batched_train_step = jax.jit(
                make_batched_train_step(model, loss_cfg, tx),
                donate_argnums=(0, 1),
                compiler_options=train_jit_options(),
            )
            self.logger.info(f"single-device pair batching x{self.batch_size}")
        else:
            self._batched_train_step = None

    # ------------------------------------------------------- checkpointing
    def save_snapshot(self, name: str):
        if not _HAVE_ORBAX:
            return
        path = os.path.join(os.path.abspath(self.snapshot_dir), name)
        ckptr = ocp.StandardCheckpointer()
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": self.epoch,
            "iteration": self.iteration,
        }
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        self.logger.info(f"snapshot saved to {path}")

    def load_snapshot(self, name: str, restore_optimizer: bool = False):
        """Restore model params (the reference deliberately skips optimizer
        state on resume, ``base_trainer.py:165-179``)."""
        if not _HAVE_ORBAX:
            raise RuntimeError("orbax unavailable")
        path = os.path.join(os.path.abspath(self.snapshot_dir), name)
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": 0,
            "iteration": 0,
        }
        state = ckptr.restore(path, target)
        self.params = state["params"]
        if restore_optimizer:
            self.opt_state = state["opt_state"]
        self.epoch = int(state["epoch"])
        self.iteration = int(state["iteration"])
        self.logger.info(f"snapshot loaded from {path} (epoch {self.epoch})")

    # ------------------------------------------------------------- loops
    def train_epoch(self, loader: Iterable[dict]):
        if self._dp is not None:
            return self._train_epoch_dp(loader)
        if self._batched_train_step is not None:
            return self._train_epoch_batched(loader)
        board = SummaryBoard(last_n=self.log_steps)
        timer = Timer()
        rng = jax.random.PRNGKey(self.seed + 1000 + self.epoch)
        timer.tic()
        for i, data in enumerate(loader):
            data = {k: jnp.asarray(v) for k, v in data.items()}
            timer.record_prepare()
            rng, sub = jax.random.split(rng)
            self.params, self.opt_state, losses = self._train_step(
                self.params, self.opt_state, data, sub
            )
            self.iteration += 1
            board.update_from_dict(
                {k: float(v) for k, v in losses.items()}
            )
            timer.record_process()
            if (i + 1) % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} iter {i + 1}: {board.format()} "
                    f"(prep {timer.prepare_time:.3f}s step {timer.process_time:.3f}s)"
                )
                self.metrics_writer.add_dict(
                    board.summary(), self.iteration, prefix="train/"
                )
            timer.tic()
        self.metrics_writer.flush()
        return board.summary()

    def _train_epoch_batched(self, loader: Iterable[dict]):
        """Single-device epoch over vmapped pair batches (``batch_size`` > 1).

        Same padded-trailing-batch contract as the DP epoch: one jitted
        signature serves the whole epoch, padding pairs carry weight 0.
        """
        from se3et_tpu.parallel.mesh import stack_pairs

        board = SummaryBoard(last_n=self.log_steps)
        rng = jax.random.PRNGKey(self.seed + 1000 + self.epoch)
        bs = self.batch_size
        pending = []
        steps = 0

        def run_batch(pairs, rng):
            n_real = len(pairs)
            pairs = pairs + [pairs[-1]] * (bs - n_real)
            batch = stack_pairs(pairs)
            batch["pair_weights"] = (np.arange(bs) < n_real).astype(np.float32)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            self.params, self.opt_state, losses = self._batched_train_step(
                self.params, self.opt_state, batch, sub
            )
            self.iteration += 1
            board.update_from_dict({k: float(v) for k, v in losses.items()})
            return rng

        for data in loader:
            pending.append(data)
            if len(pending) < bs:
                continue
            rng = run_batch(pending, rng)
            pending = []
            steps += 1
            if steps % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} step {steps} (x{bs} pairs): {board.format()}"
                )
                self.metrics_writer.add_dict(
                    board.summary(), self.iteration, prefix="train/"
                )
        if pending:
            run_batch(pending, rng)
            steps += 1
            if steps % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} step {steps} (x{bs} pairs): {board.format()}"
                )
                self.metrics_writer.add_dict(
                    board.summary(), self.iteration, prefix="train/"
                )
        self.metrics_writer.flush()
        return board.summary()

    def _train_epoch_dp(self, loader: Iterable[dict]):
        """Data-parallel epoch: pairs grouped into per-device batches, sharded
        over the mesh; XLA all-reduces gradients over ICI (the reference's DDP,
        ``base_trainer.py:181-196``)."""
        from se3et_tpu.parallel.mesh import stack_pairs

        board = SummaryBoard(last_n=self.log_steps)
        rng = jax.random.PRNGKey(self.seed + 1000 + self.epoch)
        nd = self._dp.num_devices
        pending = []
        steps = 0

        def run_batch(pairs, rng):
            # A trailing partial batch is padded with repeats of its last pair
            # at weight 0 — the weighted mean in make_batched_train_step makes
            # the padding's gradient contribution exactly zero, and ONE jitted
            # signature serves the whole epoch (no second production-size
            # executable for leftovers).
            n_real = len(pairs)
            pairs = pairs + [pairs[-1]] * (nd - n_real)
            batch = stack_pairs(pairs)
            batch["pair_weights"] = (np.arange(nd) < n_real).astype(np.float32)
            batch = self._dp.shard_batch(batch)
            rng, sub = jax.random.split(rng)
            sub = jax.device_put(sub, self._dp.replicated_sharding())
            self.params, self.opt_state, losses = self._dp_train_step(
                self.params, self.opt_state, batch, sub
            )
            self.iteration += 1
            board.update_from_dict({k: float(v) for k, v in losses.items()})
            return rng

        for data in loader:
            pending.append(data)
            if len(pending) < nd:
                continue
            rng = run_batch(pending, rng)
            pending = []
            steps += 1
            if steps % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} step {steps} (x{nd} pairs): {board.format()}"
                )
                self.metrics_writer.add_dict(
                    board.summary(), self.iteration, prefix="train/"
                )
        if pending:
            run_batch(pending, rng)
            steps += 1
            if steps % self.log_steps == 0:
                self.logger.info(
                    f"epoch {self.epoch} step {steps} (x{nd} pairs): {board.format()}"
                )
                self.metrics_writer.add_dict(
                    board.summary(), self.iteration, prefix="train/"
                )
        self.metrics_writer.flush()
        return board.summary()

    def validate(self, loader: Iterable[dict]):
        board = SummaryBoard()
        rng = jax.random.PRNGKey(0)
        for data in loader:
            data = {k: jnp.asarray(v) for k, v in data.items()}
            metrics = self._val_step(self.params, data, rng)
            board.update_from_dict({k: float(v) for k, v in metrics.items()})
        summary = board.summary()
        self.logger.info(f"validation epoch {self.epoch}: " + board.format())
        self.metrics_writer.add_dict(summary, self.iteration, prefix="val/")
        self.metrics_writer.flush()
        return summary

    def run_iterations(self, loader: Iterable[dict], max_iterations: int,
                       val_loader_fn: Optional[Callable[[], Iterable[dict]]] = None,
                       val_every: int = 1000, snapshot_every: int = 1000):
        """Iteration-based training (reference ``IterBasedTrainer`` +
        ``CycleLoader``, ``engine/iter_based_trainer.py:17-200``): a single
        stream of steps with periodic validation/snapshots."""
        board = SummaryBoard(last_n=self.log_steps)
        rng = jax.random.PRNGKey(self.seed + 2000)
        it = iter(loader)
        while self.iteration < max_iterations:
            try:
                data = next(it)
            except StopIteration:
                it = iter(loader)
                data = next(it)
            data = {k: jnp.asarray(v) for k, v in data.items()}
            rng, sub = jax.random.split(rng)
            self.params, self.opt_state, losses = self._train_step(
                self.params, self.opt_state, data, sub
            )
            self.iteration += 1
            board.update_from_dict({k: float(v) for k, v in losses.items()})
            if self.iteration % self.log_steps == 0:
                self.logger.info(f"iter {self.iteration}: {board.format()}")
                self.metrics_writer.add_dict(board.summary(), self.iteration,
                                             prefix="train/")
            if val_loader_fn is not None and self.iteration % val_every == 0:
                self.validate(val_loader_fn())
            if self.iteration % snapshot_every == 0:
                self.save_snapshot(f"iter-{self.iteration}")
                self.save_snapshot("latest")
        self.save_snapshot("latest")
        return board.summary()

    def run(self, train_loader_fn: Callable[[], Iterable[dict]],
            val_loader_fn: Optional[Callable[[], Iterable[dict]]] = None,
            resume: bool = False):
        if resume and os.path.isdir(os.path.join(self.snapshot_dir, "latest")):
            self.load_snapshot("latest")
        while self.epoch < self.optim_cfg.max_epoch:
            self.epoch += 1
            self.train_epoch(train_loader_fn())
            if val_loader_fn is not None:
                self.validate(val_loader_fn())
            self.save_snapshot(f"epoch-{self.epoch}")
            self.save_snapshot("latest")

"""Multi-device data-parallel tests on the 8-device virtual CPU mesh.

Covers the TPU-native replacement of the reference's NCCL DDP layer
(``engine/base_trainer.py:181-196``): pair-axis sharding over a 1-D mesh,
replicated params, and the gradient all-reduce XLA inserts for sharded jit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from se3et_tpu.parallel.mesh import DataParallel, stack_pairs


def _shard_values(arr):
    return [np.asarray(s.data) for s in arr.addressable_shards]


def test_stack_pairs_shapes():
    pairs = [
        {"points_0": np.full((5, 3), i, np.float32), "transform": np.eye(4)}
        for i in range(4)
    ]
    batch = stack_pairs(pairs)
    assert batch["points_0"].shape == (4, 5, 3)
    assert batch["transform"].shape == (4, 4, 4)
    assert np.all(batch["points_0"][2] == 2)


def test_shard_batch_places_pair_axis_over_devices():
    dp = DataParallel()
    assert dp.num_devices == 8
    batch = {"x": np.arange(8 * 6, dtype=np.float32).reshape(8, 6)}
    sharded = dp.shard_batch(batch)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    # each device holds exactly one pair row
    for i, s in enumerate(shards):
        np.testing.assert_array_equal(np.asarray(s.data)[0], batch["x"][i])
        assert s.data.shape == (1, 6)


def test_shard_step_gradient_allreduce_matches_single_device():
    """One sharded-jit SGD step == the full-batch single-device step."""
    dp = DataParallel()
    tx = optax.sgd(0.1)

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            pred = batch["x"] @ p["w"] + p["b"]
            loss = jnp.mean((pred - batch["y"]) ** 2)
            return loss, {"loss": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, metrics

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(6, 2), jnp.float32),
              "b": jnp.zeros((2,), jnp.float32)}
    opt_state = tx.init(params)
    batch = {"x": rng.randn(8, 4, 6).astype(np.float32),
             "y": rng.randn(8, 4, 2).astype(np.float32)}

    # single-device reference on the flattened full batch
    flat = {"x": batch["x"].reshape(32, 6), "y": batch["y"].reshape(32, 2)}
    ref_params, _, ref_metrics = jax.jit(step)(
        params, opt_state, flat, jax.random.PRNGKey(0)
    )

    sharded_step = dp.shard_step(step, donate_argnums=())
    p = dp.replicate(params)
    o = dp.replicate(opt_state)
    sb = dp.shard_batch(batch)
    key = jax.device_put(jax.random.PRNGKey(0), dp.replicated_sharding())
    new_params, _, metrics = sharded_step(p, o, sb, key)

    # mean over sharded pair axis == full-batch mean -> identical update
    np.testing.assert_allclose(
        np.asarray(new_params["w"]), np.asarray(ref_params["w"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), atol=1e-6
    )
    # params replicated-identical on every device
    for v in _shard_values(new_params["w"]):
        np.testing.assert_array_equal(v, _shard_values(new_params["w"])[0])


@pytest.fixture(scope="module")
def micro_setup():
    from se3et_tpu.data.datasets import SyntheticPairDataset
    from se3et_tpu.data.pipeline import PyramidConfig, build_pair_pyramid
    from se3et_tpu.nn.model import ModelConfig, SE3ETModel

    pc = PyramidConfig(
        num_stages=2, voxel_size=0.2, search_radius=0.5,
        neighbor_limits=(6, 6), stage_caps=(64, 24), coarse_point_cap=24,
    )
    mc = ModelConfig(
        num_stages=2, init_dim=8, output_dim=16, gt_input_dim=16,
        gt_hidden_dim=16, gt_output_dim=16, num_heads=2,
        blocks=("self_eq", "cross"), init_radius=0.5, init_sigma=0.4,
        group_norm=4, num_points_in_patch=4, num_sinkhorn_iterations=3,
        num_targets=4, num_correspondences=6, gt_candidates=4,
        correspondence_limit=16,
    )
    ds = SyntheticPairDataset(num_pairs=8, num_points=120, seed=0)
    pairs = [
        build_pair_pyramid(d["ref_points"], d["src_points"], d["transform"], pc)
        for d in (ds[i] for i in range(8))
    ]
    return SE3ETModel(mc), stack_pairs(pairs)


@pytest.mark.slow
def test_batched_train_step_on_mesh(micro_setup):
    """Full micro SE3ET train step, 8 pairs sharded over 8 devices."""
    from se3et_tpu.engine.steps import make_batched_train_step
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn.init_util import jit_init

    model, batch = micro_setup
    one = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    params = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)},
        one, train=True, with_registration=False,
    )

    loss_cfg = dataclasses.replace(
        make_cfg("se3ete.3dmatch").loss, fine_positive_radius=0.2
    )
    tx = optax.adam(1e-3)
    dp = DataParallel()
    sharded_step = dp.shard_step(
        make_batched_train_step(model, loss_cfg, tx), donate_argnums=()
    )
    p = dp.replicate(params)
    o = dp.replicate(tx.init(params))
    sb = dp.shard_batch(batch)
    rng = jax.device_put(jax.random.PRNGKey(7), dp.replicated_sharding())

    new_params, new_opt, losses = sharded_step(p, o, sb, rng)
    jax.block_until_ready(new_params)

    assert np.isfinite(float(losses["loss"]))
    assert np.isfinite(float(losses["grad_norm"]))
    # updated params stay replicated bit-identical across all 8 devices
    leaf = jax.tree_util.tree_leaves(new_params)[0]
    vals = _shard_values(leaf)
    for v in vals[1:]:
        np.testing.assert_array_equal(v, vals[0])
    # and the step actually moved them
    old_leaf = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(vals[0]), np.asarray(old_leaf))


@pytest.mark.slow
def test_padded_leftover_batch_matches_unpadded(micro_setup):
    """A trailing partial batch padded to the device count with weight-0
    repeats (trainer._train_epoch_dp) produces EXACTLY the update of the
    unpadded partial batch — padding content contributes zero gradient."""
    from se3et_tpu.engine.steps import make_batched_train_step
    from se3et_tpu.experiments import make_cfg
    from se3et_tpu.nn.init_util import jit_init

    model, batch = micro_setup
    one = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    params = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "targets": jax.random.PRNGKey(1)},
        one, train=True, with_registration=False,
    )
    loss_cfg = dataclasses.replace(
        make_cfg("se3ete.3dmatch").loss, fine_positive_radius=0.2
    )
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    step = jax.jit(make_batched_train_step(model, loss_cfg, tx))
    rng = jax.random.PRNGKey(11)

    # the per-pair RNG keys are prefix-stable across batch sizes -- the
    # padded-8 and unpadded-5 runs see identical keys for the real pairs
    np.testing.assert_array_equal(
        np.asarray(jax.random.split(rng, 8)[:5]),
        np.asarray(jax.random.split(rng, 5)),
    )

    n_real = 5
    real = {k: v[:n_real] for k, v in batch.items()}
    ref_params, _, ref_losses = step(params, opt, real, rng)

    padded = {k: np.concatenate([v[:n_real]] + [v[n_real - 1:n_real]] * 3, 0)
              for k, v in batch.items()}
    padded["pair_weights"] = (np.arange(8) < n_real).astype(np.float32)
    got_params, _, got_losses = step(params, opt, padded, rng)

    # padding with DIFFERENT content must not change anything either
    padded2 = {k: np.concatenate([v[:n_real], v[n_real:]], 0)
               for k, v in batch.items()}
    padded2["pair_weights"] = padded["pair_weights"]
    got2_params, _, _ = step(params, opt, padded2, rng)

    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(got_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(got_params),
                    jax.tree_util.tree_leaves(got2_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(ref_losses["loss"]),
                               float(got_losses["loss"]), rtol=1e-5)

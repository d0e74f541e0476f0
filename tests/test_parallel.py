"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointasnl_tpu.parallel import make_mesh, replicate, shard_batch
from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    make_train_step,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer
from tests.test_train import SmallCls


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_layout(rng):
    mesh = make_mesh()
    batch = {"points": jnp.zeros((16, 32, 3)), "labels": jnp.zeros((16,), jnp.int32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["points"].sharding.spec == P("data", None, None)
    assert sharded["labels"].sharding.spec == P("data")


def test_dp_train_step_8way(rng):
    """One SPMD train step over 8 devices == the single-device step numerics."""
    mesh = make_mesh()
    b, n = 16, 128
    x = rng.randn(b, n, 3).astype(np.float32)
    labels = rng.randint(0, 40, size=(b,))

    model = SmallCls()
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 2e5, 0.7))
    state = create_train_state(model, jnp.asarray(x[:2]), tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(b, 2e5), task="cls", donate=False)

    batch = {"points": jnp.asarray(x), "labels": jnp.asarray(labels)}

    # Single-device baseline.
    state_1dev, metrics_1dev = step(state, batch, jax.random.PRNGKey(5))

    # 8-way DP: state replicated, batch sharded.
    state_rep = replicate(state, mesh)
    batch_sharded = shard_batch(batch, mesh)
    state_8dev, metrics_8dev = step(state_rep, batch_sharded, jax.random.PRNGKey(5))

    np.testing.assert_allclose(
        float(metrics_1dev["loss"]), float(metrics_8dev["loss"]), rtol=2e-4
    )
    # Updated parameters must agree (global grad reduction == serial grads).
    # Biases sitting in softmax-invariant directions (e.g. the K-projection's
    # BN bias) have analytically-zero gradients; Adam normalizes their float
    # noise to ±lr nondeterministically, so compare the function-relevant
    # leaves: kernels and BN scales.
    flat1 = jax.tree_util.tree_flatten_with_path(state_1dev.params)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(state_8dev.params)[0]
    for (path, a), (_, b_) in zip(flat1, flat8):
        if any(getattr(p, "key", None) == "bias" for p in path):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-5)
    # BN running stats must agree too (sync-BN over the global batch).
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state_1dev.batch_stats),
        jax.tree_util.tree_leaves(state_8dev.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-5)


def test_dp_seg_task_8way(rng):
    """Segmentation (weighted CE + repulsion) DP step == single-device step."""
    from pointasnl_tpu.models import PointASNLSemSeg

    mesh = make_mesh()
    b, n = 8, 512
    x = rng.randn(b, n, 3).astype(np.float32)
    labels = rng.randint(0, 21, (b, n))
    smpw = np.ones((b, n), np.float32)

    model = PointASNLSemSeg(num_class=21)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 2e5, 0.7))
    state = create_train_state(model, jnp.asarray(x[:1]), tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(b, 2e5), task="seg", uniform_weight=0.01, donate=False
    )
    batch = {"points": jnp.asarray(x), "labels": jnp.asarray(labels), "smpw": jnp.asarray(smpw)}

    _, m1 = step(state, batch, jax.random.PRNGKey(5))
    _, m8 = step(replicate(state, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=5e-4)
    np.testing.assert_allclose(
        float(m1["uniform_loss"]), float(m8["uniform_loss"]), rtol=5e-4
    )


def test_dp_multiple_steps_converge(rng):
    mesh = make_mesh()
    b, n = 8, 128
    x = rng.randn(b, n, 3).astype(np.float32)
    labels = rng.randint(0, 40, size=(b,))
    model = SmallCls()
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 2e5, 0.7))
    state = create_train_state(model, jnp.asarray(x[:2]), tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(b, 2e5), task="cls", donate=False)

    state = replicate(state, mesh)
    batch = shard_batch({"points": jnp.asarray(x), "labels": jnp.asarray(labels)}, mesh)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

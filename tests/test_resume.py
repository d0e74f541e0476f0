"""Checkpoint-resume continuity + repulsion-loss classification path."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    make_train_step,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from pointasnl_tpu.train.state import make_optimizer
from tests.test_train import SmallCls


def _setup(rng, b=2, n=128):
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (b,)))
    model = SmallCls(num_class=4)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 1e5, 0.7))
    state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(b, 1e5), task="cls", donate=False)
    return state, step, {"points": x, "labels": labels}


def test_resume_reproduces_uninterrupted_run(rng, tmp_path):
    """train 3 steps -> checkpoint -> 3 more == 6 straight steps (same batch)."""
    state, step, batch = _setup(rng)
    key = jax.random.PRNGKey(9)

    s = state
    for _ in range(6):
        s, _ = step(s, batch, key)
    straight = s

    s = state
    for _ in range(3):
        s, _ = step(s, batch, key)
    save_checkpoint(s, str(tmp_path), "latest")
    fresh, _, _ = _setup(np.random.RandomState(123))  # different init
    resumed = restore_checkpoint(fresh, str(tmp_path), "latest")
    assert int(resumed.step) == 3
    for _ in range(3):
        resumed, _ = step(resumed, batch, key)

    for a, b_ in zip(
        jax.tree_util.tree_leaves(straight.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(straight.opt_state),
        jax.tree_util.tree_leaves(resumed.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7)


def test_cls_with_repulsion_loss(rng):
    """uniform_weight > 0 engages the repulsion term on l1_xyz (train.py --uniform_weight)."""
    state, _, batch = _setup(rng)
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(2, 1e5),
        task="cls",
        uniform_weight=0.01,
        donate=False,
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["uniform_loss"]))
    # with weight > 0 the uniform term is the repulsion value, not the CE copy
    assert float(metrics["uniform_loss"]) != float(metrics["classify_loss"])

"""Epoch-numbered checkpoint retention + restore-by-epoch.

Mirrors the reference's per-epoch tf.train.Saver snapshots with max_to_keep
(/root/reference/train.py:197-203; restore-by-epoch with max_to_keep=100 in
/root/reference/SemanticKITTI/test_semantic_kitti_grid.py:~36).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.train import (
    CheckpointManager,
    bn_momentum_schedule,
    checkpoint_exists,
    create_train_state,
    list_epochs,
    make_train_step,
    restore_checkpoint,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer
from tests.test_train import SmallCls


def _setup(rng, b=2, n=64):
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (b,)))
    model = SmallCls(num_class=4)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 1e5, 0.7))
    state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(b, 1e5), task="cls", donate=False
    )
    return state, step, {"points": x, "labels": labels}


def test_retention_keeps_last_k_and_best(rng, tmp_path):
    """Save 5 epochs with max_to_keep=3: oldest pruned, best survives."""
    state, step, batch = _setup(rng)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=3)
    key = jax.random.PRNGKey(7)
    for epoch in range(5):
        state, _ = step(state, batch, key)
        mgr.save(state, epoch, is_best=(epoch == 0))  # best pinned at epoch 0

    # Pruned to 3 numbered + the pinned best: epochs 0, 3, 4.
    assert mgr.epochs() == [0, 3, 4]
    assert mgr.best_epoch() == 0
    assert mgr.latest_epoch() == 4
    # Aliases resolve.
    assert checkpoint_exists(str(tmp_path), "latest")
    assert checkpoint_exists(str(tmp_path), "best")
    assert checkpoint_exists(str(tmp_path), 4)
    assert not checkpoint_exists(str(tmp_path), 1)  # pruned


def test_restore_by_epoch_number(rng, tmp_path):
    """Tester-style restore by an arbitrary retained epoch number."""
    state, step, batch = _setup(rng)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=10)
    key = jax.random.PRNGKey(7)
    snapshots = {}
    for epoch in range(4):
        state, _ = step(state, batch, key)
        mgr.save(state, epoch)
        snapshots[epoch] = jax.tree_util.tree_map(np.asarray, state.params)

    fresh, _, _ = _setup(np.random.RandomState(123))  # different init
    for epoch in (1, 3):
        restored = restore_checkpoint(fresh, str(tmp_path), epoch)
        assert int(restored.step) == epoch + 1
        for a, b in zip(
            jax.tree_util.tree_leaves(snapshots[epoch]),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))
    # Digit-string spelling (as a CLI --ckpt value) resolves identically.
    restored = restore_checkpoint(fresh, str(tmp_path), "3")
    assert int(restored.step) == 4


def test_latest_alias_tracks_newest_save(rng, tmp_path):
    state, step, batch = _setup(rng)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    key = jax.random.PRNGKey(7)
    for epoch in range(3):
        state, _ = step(state, batch, key)
        mgr.save(state, epoch)
        fresh, _, _ = _setup(np.random.RandomState(5))
        restored = mgr.restore(fresh, "latest")
        assert int(restored.step) == epoch + 1
    assert list_epochs(str(tmp_path)) == [1, 2]


def test_unlimited_retention(rng, tmp_path):
    state, step, batch = _setup(rng)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=None)
    key = jax.random.PRNGKey(7)
    for epoch in range(5):
        state, _ = step(state, batch, key)
        mgr.save(state, epoch)
    assert mgr.epochs() == [0, 1, 2, 3, 4]


def test_save_latest_does_not_clobber_newest_epoch(rng, tmp_path):
    """Saving with the default 'latest' name into a dir whose 'latest' alias
    is missing must write a literal 'latest', not overwrite the newest
    numbered epoch (the read-side fallback must not apply to writes)."""
    import os

    from pointasnl_tpu.train.checkpoint import save_checkpoint

    state, step, batch = _setup(rng)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt_dir = tmp_path / "ckpts"
    save_checkpoint(state, str(ckpt_dir), "epoch_00005")
    assert not os.path.exists(ckpt_dir / "latest")

    save_checkpoint(s1, str(ckpt_dir), "latest")
    # epoch_00005 must still hold step 0; 'latest' holds step 1
    r5 = restore_checkpoint(state, str(ckpt_dir), "epoch_00005")
    rl = restore_checkpoint(state, str(ckpt_dir), "latest")
    assert int(r5.step) == 0
    assert int(rl.step) == 1

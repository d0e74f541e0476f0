"""Train-step smoke tests: one jitted step per task, schedules, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointasnl_tpu.models import PointASNLCls, PointASNLSemSeg
from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    make_eval_step,
    make_train_step,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer
from pointasnl_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from pointasnl_tpu.train.metrics import IoU_from_confusions, IouEval, confusion_matrix


def test_lr_schedule_staircase():
    sched = staircase_lr_schedule(1e-3, batch_size=16, decay_step=500000, decay_rate=0.7)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(31249)), 1e-3)  # just below one decay period
    np.testing.assert_allclose(float(sched(31250)), 7e-4, rtol=1e-6)
    assert float(sched(10**9)) == pytest.approx(1e-5)  # floor


def test_bn_schedule():
    sched = bn_momentum_schedule(batch_size=16, decay_step=200000)
    np.testing.assert_allclose(float(sched(0)), 0.5)
    np.testing.assert_allclose(float(sched(12500)), 0.75)
    assert float(sched(10**9)) == pytest.approx(0.99)


def _cls_setup(rng, batch=2, n=256):
    x = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, size=(batch,)))
    # npoints 512/128 exceed tiny N; use a small custom model config via the
    # same module class to keep the smoke test fast.
    model = SmallCls()
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, batch, 2e5, 0.7))
    state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))
    return model, state, {"points": x, "labels": labels}


from flax import linen as nn
from pointasnl_tpu.nn.pointasnl import PointASNLSetAbstraction
from pointasnl_tpu.nn.pointnet import PointNetSAModule
from pointasnl_tpu.nn.layers import FullyConnected


class SmallCls(nn.Module):
    """Tiny PointASNL-style classifier for fast smoke tests."""

    num_class: int = 40

    @nn.compact
    def __call__(self, x, *, training: bool, bn_momentum=0.9):
        end_points = {}
        l1_xyz, l1 = PointASNLSetAbstraction(
            npoint=64, nsample=8, mlp=(8, 16), as_neighbor=4, name="layer1"
        )(x, x, training=training, bn_momentum=bn_momentum)
        end_points["l1_xyz"] = l1_xyz
        _, g, _ = PointNetSAModule(mlp=(16, 32), group_all=True, name="head")(
            l1_xyz, l1, training=training, bn_momentum=bn_momentum
        )
        logits = FullyConnected(self.num_class, bn=False, activation=None, name="fc")(
            g[:, 0], training=training
        )
        return logits, end_points


def test_train_step_cls_runs_and_learns(rng):
    model, state, batch = _cls_setup(rng)
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(2, 2e5), task="cls", donate=False
    )
    state1, m1 = step(state, batch, jax.random.PRNGKey(7))
    assert int(state1.step) == 1
    assert np.isfinite(float(m1["loss"]))
    # a few more steps on the same batch should reduce the loss
    s = state1
    for _ in range(10):
        s, m = step(s, batch, jax.random.PRNGKey(7))
    assert float(m["loss"]) < float(m1["loss"])


def test_eval_step(rng):
    model, state, batch = _cls_setup(rng)
    estep = make_eval_step(task="cls")
    logits, metrics = estep(state, batch)
    assert logits.shape == (2, 40)
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_train_step_seg(rng):
    b, n = 2, 512
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, size=(b, n)))
    smpw = jnp.ones((b, n), jnp.float32)
    model = PointASNLSemSeg(num_class=21)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 2e5, 0.7))
    state = create_train_state(model, x, tx=tx)
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(b, 2e5),
        task="seg",
        uniform_weight=0.01,
        donate=False,
    )
    state1, metrics = step(state, {"points": x, "labels": labels, "smpw": smpw}, jax.random.PRNGKey(3))
    assert int(state1.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["uniform_loss"]))


def test_checkpoint_roundtrip(rng, tmp_path):
    model, state, batch = _cls_setup(rng)
    step = make_train_step(bn_schedule=bn_momentum_schedule(2, 2e5), task="cls", donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    save_checkpoint(state, str(tmp_path), "latest")

    fresh = create_train_state(
        model, batch["points"], tx=state.tx, rng=jax.random.PRNGKey(99)
    )
    restored = restore_checkpoint(fresh, str(tmp_path), "latest")
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_confusion_and_iou():
    preds = jnp.asarray([0, 1, 1, 2])
    labels = jnp.asarray([0, 1, 2, 2])
    conf = np.asarray(confusion_matrix(preds, labels, 3))
    want = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]])
    np.testing.assert_array_equal(conf, want)
    iou = IoU_from_confusions(conf)
    np.testing.assert_allclose(iou, [1.0, 0.5, 0.5], atol=1e-5)


def test_iou_eval_matches_reference_example():
    """The np_ioueval __main__ example: two offset 2x2 squares in a 7x7 grid."""
    lbl = np.zeros((7, 7), np.int64)
    pred = np.zeros((7, 7), np.int64)
    lbl[2:4, 2:4] = 1
    pred[3:5, 3:5] = 1
    ev = IouEval(2, ignore=[])
    ev.addBatch(pred, lbl)
    m_iou, iou = ev.getIoU()
    np.testing.assert_allclose(iou[1], 1.0 / 7.0, rtol=1e-6)  # overlap 1, union 7

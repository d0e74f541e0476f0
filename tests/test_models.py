"""Model construction + forward-shape tests for the three families.

Mirrors the reference's __main__ smoke blocks (models/pointasnl_cls.py:73-77
etc.) but as real assertions, plus registry and train/eval mode checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointasnl_tpu.models import (
    PointASNLCls,
    PointASNLSemSeg,
    PointASNLSemSegRes,
    get_model_class,
)


def init_model(model, x, training=True):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, training=training, bn_momentum=0.9)


def apply_model(model, variables, x, training=True):
    return model.apply(
        variables,
        x,
        training=training,
        bn_momentum=0.9,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if training else False,
    )


def test_registry():
    assert get_model_class("pointasnl_cls") is PointASNLCls
    assert get_model_class("pointasnl_sem_seg") is PointASNLSemSeg
    assert get_model_class("pointasnl_sem_seg_res") is PointASNLSemSegRes
    with pytest.raises(KeyError):
        get_model_class("nope")


def test_cls_forward(rng):
    x = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32))
    model = PointASNLCls(num_class=40, adaptive_sample=True)
    variables = init_model(model, x)
    (logits, end_points), _ = apply_model(model, variables, x)
    assert logits.shape == (2, 40)
    assert end_points["l1_xyz"].shape == (2, 512, 3)
    # eval mode: no batch_stats mutation, deterministic
    logits_eval, _ = apply_model(model, variables, x, training=False)
    assert logits_eval.shape == (2, 40)


def test_cls_with_normals(rng):
    x = jnp.asarray(rng.randn(2, 1024, 6).astype(np.float32))
    model = PointASNLCls(num_class=40, use_normal=True)
    variables = init_model(model, x)
    (logits, _), _ = apply_model(model, variables, x)
    assert logits.shape == (2, 40)


def test_sem_seg_forward(rng):
    x = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
    model = PointASNLSemSeg(num_class=21)
    variables = init_model(model, x)
    (logits, end_points), _ = apply_model(model, variables, x)
    assert logits.shape == (2, 512, 21)
    assert end_points["l1_xyz"].shape == (2, 64, 3)


def test_sem_seg_with_features(rng):
    x = jnp.asarray(rng.randn(2, 512, 6).astype(np.float32))  # xyz + rgb
    model = PointASNLSemSeg(num_class=21, feature_channel=3)
    variables = init_model(model, x)
    (logits, _), _ = apply_model(model, variables, x)
    assert logits.shape == (2, 512, 21)


def test_sem_seg_res_forward(rng):
    x = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
    model = PointASNLSemSegRes(num_class=20)
    variables = init_model(model, x)
    (logits, end_points), _ = apply_model(model, variables, x)
    assert logits.shape == (2, 512, 20)


def test_cls_jit_and_grad(rng):
    x = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32))
    labels = jnp.asarray([3, 7])
    model = PointASNLCls(num_class=40)
    variables = init_model(model, x)

    @jax.jit
    def loss_fn(params, batch_stats, x, labels):
        (logits, _), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            training=True,
            bn_momentum=0.9,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    g = jax.grad(loss_fn)(variables["params"], variables["batch_stats"], x, labels)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_sem_seg_res_geometry_reuse_identical(rng):
    """reuse_geometry (stem self-kNN rows gathered for level 1) must be a
    pure optimization: outputs identical to the unhinted search path."""
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    on = PointASNLSemSegRes(num_class=5, reuse_geometry=True)
    off = PointASNLSemSegRes(num_class=5, reuse_geometry=False)
    variables = init_model(on, x, training=False)
    got, _ = apply_model(on, variables, x, training=False)
    want, _ = apply_model(off, variables, x, training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

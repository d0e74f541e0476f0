"""Module tests: base layers + PointASNL/PointNet++ cells (shapes, BN EMA,
gradient flow, softmax invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointasnl_tpu.nn import (
    AdaptiveSampling,
    BatchNorm,
    PointASNLDecodingLayer,
    PointASNLSetAbstraction,
    PointConv,
    PointNetFPModule,
    PointNetSAModule,
    PointNonLocalCell,
    SampleWeights,
)
from pointasnl_tpu.nn.losses import (
    l2_regularization,
    softmax_cross_entropy,
    weighted_softmax_cross_entropy,
)


def init_and_apply(module, *args, training=True, bn_momentum=0.9, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, *args, training=training, bn_momentum=bn_momentum, **kwargs)
    out, updates = module.apply(
        variables,
        *args,
        training=training,
        bn_momentum=bn_momentum,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
        **kwargs,
    )
    return out, variables, updates


# ----------------------------------------------------------------- layers


def test_batchnorm_train_normalizes(rng):
    x = jnp.asarray(rng.randn(16, 8).astype(np.float32) * 3 + 5)
    bn = BatchNorm()
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, training=True, momentum=0.9)
    out, _ = bn.apply(variables, x, training=True, momentum=0.9, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(jnp.mean(out, 0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(out, 0)), 1.0, atol=1e-2)


def test_batchnorm_ema_update_rule(rng):
    x = jnp.asarray(rng.randn(64, 4).astype(np.float32) + 2.0)
    bn = BatchNorm()
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, training=True, momentum=0.9)
    _, updates = bn.apply(
        variables, x, training=True, momentum=0.5, mutable=["batch_stats"]
    )
    batch_mean = np.mean(np.asarray(x), 0)
    want = 0.0 * 0.5 + batch_mean * 0.5  # init mean 0, momentum .5
    np.testing.assert_allclose(np.asarray(updates["batch_stats"]["mean"]), want, rtol=1e-5)


def test_batchnorm_eval_uses_running_stats(rng):
    x = jnp.asarray(rng.randn(32, 4).astype(np.float32) * 2 + 7)
    bn = BatchNorm()
    variables = bn.init({"params": jax.random.PRNGKey(0)}, x, training=True, momentum=0.9)
    out = bn.apply(variables, x, training=False, momentum=0.9)
    # Running stats are fresh (mean 0, var 1) so eval output ~ input.
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-2, atol=1e-2)


def test_pointconv_shape_and_relu(rng):
    x = jnp.asarray(rng.randn(2, 10, 4, 6).astype(np.float32))
    out, _, _ = init_and_apply(PointConv(16), x)
    assert out.shape == (2, 10, 4, 16)
    assert float(jnp.min(out)) >= 0.0  # relu


# ------------------------------------------------------------ asnl modules


def make_points(rng, b=2, n=64, c=6):
    xyz = rng.randn(b, n, 3).astype(np.float32)
    feats = rng.randn(b, n, c).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(feats)


def test_sample_weights_convex(rng):
    feats = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))
    xyz = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    out, _, _ = init_and_apply(SampleWeights([32, 17]), feats, xyz)
    assert out.shape == (2, 8, 12, 17)
    # softmax over the neighbor axis -> each channel's weights sum to 1
    np.testing.assert_allclose(np.asarray(jnp.sum(out, axis=2)), 1.0, rtol=1e-5)


def test_adaptive_sampling_zero_neighbors_takes_self(rng):
    gxyz = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    gfeat = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    module = AdaptiveSampling(0)
    out_xyz, out_feat = module.init_with_output(
        {"params": jax.random.PRNGKey(0)}, gxyz, gfeat, training=True, bn_momentum=0.9
    )[0]
    np.testing.assert_allclose(np.asarray(out_xyz), np.asarray(gxyz[:, :, 0, :]))
    np.testing.assert_allclose(np.asarray(out_feat), np.asarray(gfeat[:, :, 0, :]))


def test_adaptive_sampling_shapes(rng):
    gxyz = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    gfeat = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    (out_xyz, out_feat), _, _ = init_and_apply(AdaptiveSampling(4), gxyz, gfeat)
    assert out_xyz.shape == (2, 8, 3)
    assert out_feat.shape == (2, 8, 5)


def test_nonlocal_cell_shapes_and_modes(rng):
    feats = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    qfeats = jnp.asarray(rng.randn(2, 8, 19).astype(np.float32))
    for mode in ("dot", "concat"):
        out, _, _ = init_and_apply(
            PointNonLocalCell(bottleneck=32, out_channels=24, mode=mode), feats, qfeats
        )
        assert out.shape == (2, 8, 24)


def test_set_abstraction_downsampling(rng):
    xyz, feats = make_points(rng, 2, 64, 6)
    sa = PointASNLSetAbstraction(npoint=16, nsample=8, mlp=(16, 16, 32), as_neighbor=4)
    (new_xyz, new_points), _, _ = init_and_apply(sa, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_points.shape == (2, 16, 32)


def test_set_abstraction_same_resolution_no_nl(rng):
    xyz, feats = make_points(rng, 2, 32, 6)
    sa = PointASNLSetAbstraction(npoint=32, nsample=8, mlp=(16, 32), as_neighbor=0, NL=False)
    (new_xyz, new_points), _, _ = init_and_apply(sa, xyz, feats)
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(xyz))
    assert new_points.shape == (2, 32, 32)


def test_decoding_layer_shapes(rng):
    xyz1, feats1 = make_points(rng, 2, 64, 16)
    xyz2, feats2 = make_points(rng, 2, 16, 32)
    dec = PointASNLDecodingLayer(nsample=8, mlp=(32, 24))
    out, _, _ = init_and_apply(dec, xyz1, xyz2, feats1, feats2)
    assert out.shape == (2, 64, 24)


def test_decoding_layer_with_nl(rng):
    xyz1, feats1 = make_points(rng, 2, 32, 16)
    xyz2, feats2 = make_points(rng, 2, 8, 16)
    dec = PointASNLDecodingLayer(nsample=8, mlp=(32, 24), NL=True, mode="dot")
    out, _, _ = init_and_apply(dec, xyz1, xyz2, feats1, feats2)
    assert out.shape == (2, 32, 24)


def test_pointnet_sa_group_all(rng):
    xyz, feats = make_points(rng, 2, 32, 8)
    (new_xyz, new_points, idx), _, _ = init_and_apply(
        PointNetSAModule(mlp=(16, 32), group_all=True), xyz, feats
    )
    assert new_points.shape == (2, 1, 32)
    np.testing.assert_allclose(np.asarray(new_xyz), 0.0)


def test_pointnet_sa_ball(rng):
    xyz, feats = make_points(rng, 2, 64, 8)
    (new_xyz, new_points, idx), _, _ = init_and_apply(
        PointNetSAModule(mlp=(16, 32), npoint=16, radius=0.5, nsample=8), xyz, feats
    )
    assert new_points.shape == (2, 16, 32)
    assert idx.shape == (2, 16, 8)


def test_pointnet_fp(rng):
    xyz1, feats1 = make_points(rng, 2, 32, 8)
    xyz2, feats2 = make_points(rng, 2, 8, 16)
    out, _, _ = init_and_apply(PointNetFPModule(mlp=(32, 24)), xyz1, xyz2, feats1, feats2)
    assert out.shape == (2, 32, 24)


def test_sa_gradients_flow(rng):
    xyz, feats = make_points(rng, 1, 32, 4)
    sa = PointASNLSetAbstraction(npoint=8, nsample=8, mlp=(8, 16), as_neighbor=4)
    variables = sa.init(
        {"params": jax.random.PRNGKey(0)}, xyz, feats, training=True, bn_momentum=0.9
    )

    def loss_fn(params):
        (nx, np_), _ = sa.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xyz,
            feats,
            training=True,
            bn_momentum=0.9,
            mutable=["batch_stats"],
        )
        return jnp.sum(np_**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)


# ------------------------------------------------------------------ losses


def test_softmax_cross_entropy_uniform():
    logits = jnp.zeros((4, 10))
    labels = jnp.asarray([0, 3, 5, 9])
    np.testing.assert_allclose(float(softmax_cross_entropy(logits, labels)), np.log(10), rtol=1e-5)


def test_weighted_ce_sum_by_nonzero():
    logits = jnp.zeros((2, 3, 4))
    labels = jnp.zeros((2, 3), jnp.int32)
    w = jnp.asarray([[1.0, 2.0, 0.0], [0.0, 0.0, 0.0]])
    got = float(weighted_softmax_cross_entropy(logits, labels, w))
    want = (1.0 + 2.0) * np.log(4) / 2.0  # two nonzero weights
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l2_regularization_kernels_only():
    params = {
        "layer": {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,)) * 100}},
        "bn": {"scale": jnp.ones((5,)) * 100},
    }
    got = float(l2_regularization(params))
    np.testing.assert_allclose(got, 0.5 * 4.0)

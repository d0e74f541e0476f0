"""Golden test: independent numpy forward of PointASNLDecodingLayer
(utils/pointasnl_util.py:294-351), consuming the Flax module's parameters."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.nn.pointasnl import PointASNLDecodingLayer
from tests.test_golden_sa import np_conv, np_knn


def np_decode_forward(params, xyz1, xyz2, points1, points2, nsample, mlp):
    B, N1, _ = xyz1.shape

    # three_nn: squared distances, ascending (tf_interpolate.cpp:60-103)
    d2 = np.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, -1)
    order = np.argsort(d2, axis=-1, kind="stable")[..., :3]
    dist = np.take_along_axis(d2, order, -1)
    dist = np.maximum(dist, 1e-10)
    inv = 1.0 / dist
    weight = inv / inv.sum(-1, keepdims=True)
    gathered = np.stack([points2[b][order[b]] for b in range(B)])
    interpolated = np.sum(gathered * weight[..., None], 2)

    # grouping on xyz1 with the interpolated features (use_xyz -> raw concat)
    idx = np_knn(nsample, xyz1, xyz1)
    grouped_xyz = np.stack([xyz1[b][idx[b]] for b in range(B)])
    grouped_feature = np.stack([interpolated[b][idx[b]] for b in range(B)])
    grouped_feature = np.concatenate([grouped_xyz, grouped_feature], -1)
    grouped_xyz_n = grouped_xyz - xyz1[:, :, None, :]

    w = np_conv(params["decode_weight_net"]["wconv0"], grouped_xyz_n, relu=True)
    x = np.einsum("bnkc,bnkw->bncw", grouped_feature, w)
    Bx, Nx, Cx, Wx = x.shape
    x = x.reshape(Bx, Nx, Cx * Wx)
    x = np_conv(params["decode_after_conv"], x, relu=True)

    x = np.concatenate([x, points1], -1)  # skip concat (:338-341)
    for i in range(1, len(mlp)):
        x = np_conv(params[f"conv_{i}"], x, relu=True)
    return x


def test_decode_layer_matches_reference_mirror(rng):
    B, N1, N2, C1, C2, nsample = 2, 48, 12, 8, 16, 6
    mlp = (24, 20)
    xyz1 = rng.randn(B, N1, 3).astype(np.float32)
    xyz2 = rng.randn(B, N2, 3).astype(np.float32)
    p1 = rng.randn(B, N1, C1).astype(np.float32)
    p2 = rng.randn(B, N2, C2).astype(np.float32)

    dec = PointASNLDecodingLayer(nsample=nsample, mlp=mlp)
    variables = dec.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(p1), jnp.asarray(p2),
        training=True, bn_momentum=0.9,
    )
    got, _ = dec.apply(
        variables,
        jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(p1), jnp.asarray(p2),
        training=True, bn_momentum=0.9, mutable=["batch_stats"],
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    want = np_decode_forward(params, xyz1, xyz2, p1, p2, nsample, mlp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)

"""Golden test: independent numpy forward of PointASNLSetAbstraction.

This re-implements the SA cell in plain numpy following the REFERENCE TF
graph operation-by-operation (utils/pointasnl_util.py:221-292, with
SampleWeights :112-156, AdaptiveSampling :158-173, PointNonLocalCell
:175-219), consuming the Flax module's parameters. Any transcription error in
the Flax module (wrong axis, missing concat, swapped operands) breaks the
comparison.

Conventions exercised: kNN grouping with raw-xyz concat inside grouping, the
second (normalized) xyz concat in the cell, first-neighbor normalization in
SampleWeights, per-channel neighbor softmax in AS, Q from sampled features /
KV from all input features in NL, skip max-pool before the local MLP, the
PointConv contraction + flattened after_conv, and train-mode batch-norm with
batch moments.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointasnl_tpu.nn.pointasnl import PointASNLSetAbstraction


def np_softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def np_bn_train(x, scale, bias, eps=1e-3):
    axes = tuple(range(x.ndim - 1))
    mean = x.mean(axis=axes)
    var = (x**2).mean(axis=axes) - mean**2
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_conv(params, x, relu=True, bn=True):
    """PointConv: dense (+BN in train mode) (+relu)."""
    y = x @ np.asarray(params["conv"]["kernel"])
    if not bn:
        y = y + np.asarray(params["conv"]["bias"])
    if bn:
        y = np_bn_train(y, np.asarray(params["bn"]["scale"]), np.asarray(params["bn"]["bias"]))
    if relu:
        y = np.maximum(y, 0)
    return y


def np_fps(xyz, npoint):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int64)
    for b in range(B):
        min_d = np.full(N, np.inf)
        old = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, -1)
            min_d = np.minimum(min_d, d)
            old = int(np.argmax(min_d))
            out[b, j] = old
    return out


def np_knn(k, support, query):
    d2 = np.sum((query[:, :, None, :] - support[:, None, :, :]) ** 2, -1)
    return np.argsort(d2, axis=-1, kind="stable")[..., :k]


def np_sample_weights(p, new_point, grouped_xyz):
    """SampleWeights (pointasnl_util.py:112-156)."""
    B, M, K, C = new_point.shape
    bottleneck = max(32, C // 2)
    normalized_xyz = grouped_xyz - grouped_xyz[:, :, :1, :]
    feats = np.concatenate([normalized_xyz, new_point], -1)
    kv = np_conv(p["conv_kv_ds"], feats, relu=False)
    q = np_conv(p["conv_query_ds"], feats, relu=False)
    k_ = kv[..., :bottleneck]
    v = kv[..., bottleneck:]
    w = np.einsum("bmkc,bmlc->bmkl", q, k_) / np.sqrt(bottleneck)
    w = np_softmax(w, -1)
    out = np.einsum("bmkl,bmlc->bmkc", w, v)
    out = np_conv(p["mlp2_0"], out, relu=True)
    out = np_conv(p["mlp2_1"], out, relu=False)
    return np_softmax(out, 2)


def np_sa_forward(params, xyz, feature, npoint, nsample, mlp, as_neighbor):
    """Full SA cell with AS + NL, following pointasnl_util.py:221-292."""
    B, N, C = feature.shape

    fps_idx = np_fps(xyz, npoint)
    new_xyz = np.take_along_axis(xyz, fps_idx[..., None], 1)
    # grouping (use_xyz=True): concat RAW grouped xyz with grouped features (:51-76)
    idx = np_knn(nsample, xyz, new_xyz)
    grouped_xyz = np.stack([xyz[b][idx[b]] for b in range(B)])
    grouped_feature = np.stack([feature[b][idx[b]] for b in range(B)])
    new_point = np.concatenate([grouped_xyz, grouped_feature], -1)

    # AdaptiveSampling over the first as_neighbor neighbors (:158-173)
    sw = np_sample_weights(
        params["adaptive_sampling"]["sample_weights"],
        new_point[:, :, :as_neighbor, :],
        grouped_xyz[:, :, :as_neighbor, :],
    )
    new_xyz = np.sum(grouped_xyz[:, :, :as_neighbor, :] * sw[..., :1], 2)
    new_feature = np.sum(new_point[:, :, :as_neighbor, :] * sw[..., 1:], 2)

    # translation normalization + SECOND xyz concat (:248-249)
    grouped_xyz_n = grouped_xyz - new_xyz[:, :, None, :]
    new_point = np.concatenate([grouped_xyz_n, new_point], -1)

    # PointNonLocalCell: Q from new_feature, KV from ALL input features (:175-219)
    pnl = params["nonlocal"]
    bottleneck = max(32, C // 2)
    kv = np_conv(pnl["conv_kv"], feature, relu=False)
    q = np_conv(pnl["conv_query"], new_feature, relu=False)
    k_ = kv[..., :bottleneck]
    v = kv[..., bottleneck:]
    attn = np.einsum("bmc,bnc->bmn", q, k_) / np.sqrt(bottleneck)
    attn = np_softmax(attn, -1)
    nl = np.einsum("bmn,bnc->bmc", attn, v)
    nl = np_conv(pnl["conv_back_project"], nl, relu=True)

    # skip connection: max over neighbors then conv (:258-261)
    skip = np.max(new_point, 2)
    skip = np_conv(params["skip"], skip, relu=True)

    # local cell: convs for all but last mlp entry (:264-269)
    x = new_point
    for i in range(len(mlp) - 1):
        x = np_conv(params[f"conv{i}"], x, relu=True)

    # PointConv contraction with the learned xyz kernel (:272-280)
    w = np_conv(params["weight_net"]["wconv0"], grouped_xyz_n, relu=True)
    x = np.einsum("bmkc,bmkw->bmcw", x, w)
    Bx, Mx, Cx, Wx = x.shape
    x = x.reshape(Bx, Mx, Cx * Wx)
    x = np_conv(params["after_conv"], x, relu=True)

    x = x + skip + nl
    x = np_conv(params["aggregation"], x, relu=True)
    return new_xyz, x


def test_sa_cell_matches_reference_mirror(rng):
    B, N, C, npoint, nsample, as_nb = 2, 64, 6, 16, 8, 4
    mlp = (16, 16, 32)
    xyz = rng.randn(B, N, 3).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)

    sa = PointASNLSetAbstraction(npoint=npoint, nsample=nsample, mlp=mlp, as_neighbor=as_nb)
    variables = sa.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(xyz),
        jnp.asarray(feats),
        training=True,
        bn_momentum=0.9,
    )
    (got_xyz, got_pts), _ = sa.apply(
        variables,
        jnp.asarray(xyz),
        jnp.asarray(feats),
        training=True,
        bn_momentum=0.9,
        mutable=["batch_stats"],
    )

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    want_xyz, want_pts = np_sa_forward(params, xyz, feats, npoint, nsample, mlp, as_nb)

    np.testing.assert_allclose(np.asarray(got_xyz), want_xyz, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pts), want_pts, rtol=1e-3, atol=1e-3)

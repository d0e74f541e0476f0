"""PointASNL core modules (adaptive sampling + local-nonlocal set abstraction).

Feature-for-feature rebuild of utils/pointasnl_util.py as Flax modules over
the on-device geometry ops. Shapes follow the reference exactly, including its
quirks (documented inline) — e.g. the double xyz concat in the SA cell and the
raw-xyz concat inside grouping.

Everything in here is dense linear algebra (1x1 convs = MXU matmuls, two
attention blocks) around the geometry ops; under jit the whole cell fuses into
one on-device program, unlike the reference which crossed the host boundary
twice per SA layer (tf.py_func kNN) and per decode layer (CPU three_nn).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointasnl_tpu import ops
from pointasnl_tpu.nn.layers import PointConv

Array = jax.Array


class WeightNetHidden(nn.Module):
    """MLP on relative xyz producing PointConv-style kernel weights.

    Matches utils/pointasnl_util.py:78-88 (conv2d stack, bn+relu).
    """

    hidden_units: Sequence[int] = (32,)

    @nn.compact
    def __call__(self, xyz: Array, *, training: bool, bn_momentum=0.9) -> Array:
        net = xyz
        for i, h in enumerate(self.hidden_units):
            net = PointConv(h, bn=True, name=f"wconv{i}")(
                net, training=training, bn_momentum=bn_momentum
            )
        return net


class NonlinearTransform(nn.Module):
    """Sigmoid-gated MLP (utils/pointasnl_util.py:90-110).

    Unused by the reference models (SURVEY.md §2.8); kept for API parity.
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, x: Array, *, training: bool, bn_momentum=0.9) -> Array:
        n = len(self.mlp)
        for i, c in enumerate(self.mlp[: n - 1]):
            x = PointConv(c, bn=True, name=f"nonlinear{i}")(
                x, training=training, bn_momentum=bn_momentum
            )
        x = PointConv(self.mlp[-1], bn=False, activation=nn.sigmoid, name=f"nonlinear{n - 1}")(
            x, training=training, bn_momentum=bn_momentum
        )
        return x


class SampleWeights(nn.Module):
    """Group self-attention producing per-neighbor reweighting distributions.

    Matches utils/pointasnl_util.py:112-156:
      - xyz normalized to the group's FIRST neighbor (not the query center);
      - QKV from 1x1 convs (no activation, BN) on [normalized_xyz ‖ features];
      - scaled dot-product softmax over neighbors, value aggregation;
      - a second MLP then a softmax over the *neighbor* axis (axis=2), giving
        one convex combination per output channel.
    """

    mlps: Sequence[int]
    scaled: bool = True
    bn: bool = True

    @nn.compact
    def __call__(
        self, new_point: Array, grouped_xyz: Array, *, training: bool, bn_momentum=0.9
    ) -> Array:
        B, M, K, C = new_point.shape
        bottleneck = max(32, C // 2)
        normalized_xyz = grouped_xyz - grouped_xyz[:, :, :1, :]
        feats = jnp.concatenate([normalized_xyz, new_point], axis=-1)

        kv = PointConv(bottleneck * 2, bn=self.bn, activation=None, name="conv_kv_ds")(
            feats, training=training, bn_momentum=bn_momentum
        )
        q = PointConv(bottleneck, bn=self.bn, activation=None, name="conv_query_ds")(
            feats, training=training, bn_momentum=bn_momentum
        )
        k = kv[..., :bottleneck]
        v = kv[..., bottleneck:]

        attn = jnp.einsum("bmkc,bmlc->bmkl", q, k)  # (B, M, K, K)
        if self.scaled:
            attn = attn / jnp.sqrt(jnp.float32(bottleneck))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bmkl,bmlc->bmkc", attn, v)

        n = len(self.mlps)
        for i, c in enumerate(self.mlps):
            act = nn.relu if i < n - 1 else None
            out = PointConv(c, bn=self.bn, activation=act, name=f"mlp2_{i}")(
                out, training=training, bn_momentum=bn_momentum
            )
        return jax.nn.softmax(out, axis=2)  # convex weights over neighbors


class AdaptiveSampling(nn.Module):
    """Shift sampled points (xyz and features) by attention over neighbors.

    Matches utils/pointasnl_util.py:158-173. num_neighbor == 0 degenerates to
    taking the group's first (self) neighbor.
    """

    num_neighbor: int
    bn: bool = True

    @nn.compact
    def __call__(
        self, group_xyz: Array, group_feature: Array, *, training: bool, bn_momentum=0.9
    ) -> Tuple[Array, Array]:
        if self.num_neighbor == 0:
            return group_xyz[:, :, 0, :], group_feature[:, :, 0, :]
        num_channel = group_feature.shape[-1]
        shift_xyz = group_xyz[:, :, : self.num_neighbor, :]
        shift_feat = group_feature[:, :, : self.num_neighbor, :]
        weights = SampleWeights([32, 1 + num_channel], bn=self.bn, name="sample_weights")(
            shift_feat, shift_xyz, training=training, bn_momentum=bn_momentum
        )
        new_xyz = jnp.sum(shift_xyz * weights[..., :1], axis=2)
        new_feature = jnp.sum(shift_feat * weights[..., 1:], axis=2)
        return new_xyz, new_feature


class PointNonLocalCell(nn.Module):
    """Non-local (global) attention from sampled queries over all input points.

    Matches utils/pointasnl_util.py:175-219: K/V come from ALL `ndataset`
    input points, Q from the sampled set; scaled dot-product attention
    (npoint x ndataset map — the model's only quadratic object), then an
    output projection (1x1 conv, bn+relu). `mode='concat'` replaces the dot
    product with a 1x1 conv on concatenated Q/K pairs (:202-210).
    """

    bottleneck: int
    out_channels: int
    bn: bool = True
    scaled: bool = True
    mode: str = "dot"
    # When set (and mode='dot'), attention streams K/V in chunks of this size
    # with an online softmax — O(M*block) memory instead of the dense
    # (M x ndataset) map, enabling whole-scene single-pass inference
    # (SURVEY.md §5.7). Numerically identical to the dense path.
    kv_block_size: Optional[int] = None
    # Fused flash-attention Pallas kernel (scores never touch HBM). Off by
    # default — XLA's own fusion wins at the parity configs' crop sizes; turn
    # on for whole-scene-scale inference where the dense map's HBM round trip
    # dominates.
    use_flash: bool = False

    @nn.compact
    def __call__(
        self, feature: Array, query_feature: Array, *, training: bool, bn_momentum=0.9
    ) -> Array:
        B, N, _ = feature.shape
        M = query_feature.shape[1]
        kv = PointConv(self.bottleneck * 2, bn=self.bn, activation=None, name="conv_kv")(
            feature, training=training, bn_momentum=bn_momentum
        )
        q = PointConv(self.bottleneck, bn=self.bn, activation=None, name="conv_query")(
            query_feature, training=training, bn_momentum=bn_momentum
        )
        k = kv[..., : self.bottleneck]  # (B, N, bc)
        v = kv[..., self.bottleneck :]  # (B, N, bc)

        if self.mode == "dot" and self.kv_block_size is not None:
            from pointasnl_tpu.nn.blockwise import blockwise_attention

            out = blockwise_attention(
                q, k, v, block_size=self.kv_block_size, scaled=self.scaled
            )
            out = PointConv(self.out_channels, bn=self.bn, name="conv_back_project")(
                out, training=training, bn_momentum=bn_momentum
            )
            return out

        if self.mode == "dot" and self.use_flash:
            from pointasnl_tpu.ops.pallas.flash_attention import (
                fits_vmem,
                flash_attention,
            )

            if not fits_vmem(N, self.bottleneck, self.bottleneck):
                # K/V too big to hold on-chip: stream with the blockwise
                # online softmax instead (numerically identical).
                from pointasnl_tpu.nn.blockwise import blockwise_attention

                out = blockwise_attention(q, k, v, block_size=4096, scaled=self.scaled)
            else:
                out = flash_attention(q, k, v, self.scaled)
            out = PointConv(self.out_channels, bn=self.bn, name="conv_back_project")(
                out, training=training, bn_momentum=bn_momentum
            )
            return out

        if self.mode == "dot":
            attn = jnp.einsum("bmc,bnc->bmn", q, k)
            if self.scaled:
                attn = attn / jnp.sqrt(jnp.float32(self.bottleneck))
        elif self.mode == "concat":
            # (B, M, N, 2*bc) pairwise concat -> 1x1 conv (bn + relu, conv2d
            # defaults at pointasnl_util.py:206-209) -> scalar score.
            tiled_k = jnp.broadcast_to(k[:, None, :, :], (B, M, N, self.bottleneck))
            tiled_q = jnp.broadcast_to(q[:, :, None, :], (B, M, N, self.bottleneck))
            merged = jnp.concatenate([tiled_k, tiled_q], axis=-1)
            attn = PointConv(1, bn=self.bn, name="conv_attention_map")(
                merged, training=training, bn_momentum=bn_momentum
            )[..., 0]
        else:
            raise ValueError(f"unknown non-local mode: {self.mode!r}")

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bmn,bnc->bmc", attn, v)
        out = PointConv(self.out_channels, bn=self.bn, name="conv_back_project")(
            out, training=training, bn_momentum=bn_momentum
        )
        return out


class PointASNLSetAbstraction(nn.Module):
    """The PointASNL SA cell: FPS -> kNN group -> AS -> (NL ‖ local conv) -> fuse.

    Matches utils/pointasnl_util.py:221-292, including:
      - no sampling / no AS when npoint == input point count (:236-238, :246);
      - the double xyz concat: grouping returns [raw grouped_xyz ‖ feature]
        (use_xyz=True, :73-74), then the cell prepends *normalized* grouped_xyz
        again (:248-249);
      - skip branch = max over neighbors of the pre-MLP group tensor (:258);
      - PointConv-style aggregation: per-group matmul of transposed features
        with a learned xyz kernel, then a dense over the flattened
        (channels x 32) axis (:272-280, `after_conv`);
      - final 1x1 aggregation conv (:288-290).
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    as_neighbor: int = 8
    NL: bool = True
    bn: bool = True
    use_knn: bool = True
    radius: Optional[float] = None
    # Chunk the non-local K/V axis (whole-scene scale; see PointNonLocalCell).
    nl_kv_block_size: Optional[int] = None
    # Fused flash-attention Pallas kernel for the non-local cell.
    nl_use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feature: Array,
        *,
        training: bool,
        bn_momentum=0.9,
        fps_idx: Optional[Array] = None,
        knn_idx: Optional[Array] = None,
        support_xyz: Optional[Array] = None,
        support_feature: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """`fps_idx` / `knn_idx` are exact precomputed-geometry hints: the
        models pass FPS indices and rows of an existing self-kNN graph so the
        same search never runs twice per step (see models/sem_seg_res.py).
        Results are identical to the unhinted path — a kNN row depends only
        on the query point, and FPS only on xyz.

        `support_xyz` / `support_feature` decouple the neighbor/attention
        SOURCE set from the query set (default: the query set itself). Used
        by the point-sharded whole-scene forward (parallel/whole_scene.py):
        each device passes its query shard as xyz/feature and the replicated
        full cloud as support, with knn_idx rows for its shard."""
        sup_xyz = support_xyz if support_xyz is not None else xyz
        sup_feature = support_feature if support_feature is not None else feature
        B, N, C = feature.shape
        downsampling = N != self.npoint

        if downsampling:
            if fps_idx is not None:
                new_xyz = ops.gather_point(xyz, fps_idx)
                new_feature = ops.gather_point(feature, fps_idx)
            else:
                new_xyz, new_feature = ops.sampling(self.npoint, xyz, feature)
        else:
            new_xyz, new_feature = xyz, feature

        grouped_xyz, new_point, _ = ops.grouping(
            sup_feature,
            self.nsample,
            sup_xyz,
            new_xyz,
            use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
            idx=knn_idx,
        )
        nl_channel = self.mlp[-1]

        if downsampling:
            new_xyz, new_feature = AdaptiveSampling(
                self.as_neighbor, bn=self.bn, name="adaptive_sampling"
            )(grouped_xyz, new_point, training=training, bn_momentum=bn_momentum)

        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]  # translation normalization
        new_point = jnp.concatenate([grouped_xyz, new_point], axis=-1)

        if self.NL:
            new_nonlocal_point = PointNonLocalCell(
                bottleneck=max(32, C // 2),
                out_channels=nl_channel,
                bn=self.bn,
                kv_block_size=self.nl_kv_block_size,
                use_flash=self.nl_use_flash,
                name="nonlocal",
            )(sup_feature, new_feature, training=training, bn_momentum=bn_momentum)

        # Skip connection: max over neighbors of the raw group tensor.
        skip_spatial = jnp.max(new_point, axis=2)
        skip_spatial = PointConv(self.mlp[-1], bn=self.bn, name="skip")(
            skip_spatial, training=training, bn_momentum=bn_momentum
        )

        # Point local cell: 1x1 convs for all but the last mlp entry.
        for i, out_ch in enumerate(self.mlp[:-1]):
            new_point = PointConv(out_ch, bn=self.bn, name=f"conv{i}")(
                new_point, training=training, bn_momentum=bn_momentum
            )

        # PointConv-style aggregation over the learned xyz kernel.
        weight = WeightNetHidden((32,), name="weight_net")(
            grouped_xyz, training=training, bn_momentum=bn_momentum
        )  # (B, M, K, 32)
        new_point = jnp.einsum("bmkc,bmkw->bmcw", new_point, weight)  # (B, M, C', 32)
        Bm, Mm, Cm, Wm = new_point.shape
        new_point = new_point.reshape(Bm, Mm, Cm * Wm)
        new_point = PointConv(self.mlp[-1], bn=self.bn, name="after_conv")(
            new_point, training=training, bn_momentum=bn_momentum
        )

        new_point = new_point + skip_spatial
        if self.NL:
            new_point = new_point + new_nonlocal_point

        new_point = PointConv(self.mlp[-1], bn=self.bn, name="aggregation")(
            new_point, training=training, bn_momentum=bn_momentum
        )
        return new_xyz, new_point


class PointASNLDecodingLayer(nn.Module):
    """The PointASNL decoding (feature propagation) cell.

    Matches utils/pointasnl_util.py:294-351: 3-NN IDW interpolation from the
    sparse level, optional non-local refinement of the sparse features, a
    kNN point-local PointConv on the dense level, skip concat with the dense
    features, then the tail MLP (mlp[1:]).
    """

    nsample: int
    mlp: Sequence[int]
    NL: bool = False
    bn: bool = True
    use_xyz: bool = True
    use_knn: bool = True
    radius: Optional[float] = None
    mode: str = "concat"

    @nn.compact
    def __call__(
        self,
        xyz1: Array,
        xyz2: Array,
        points1: Optional[Array],
        points2: Array,
        *,
        training: bool,
        bn_momentum=0.9,
    ) -> Array:
        B, M2, C2 = points2.shape
        dist2, idx = ops.three_nn(xyz1, xyz2)
        dist2 = jnp.maximum(dist2, 1e-10)
        inv = 1.0 / dist2
        weight = inv / jnp.sum(inv, axis=2, keepdims=True)

        if self.NL:
            nl = PointNonLocalCell(
                bottleneck=max(32, C2),
                out_channels=C2,
                bn=self.bn,
                mode=self.mode,
                name="nonlocal",
            )(points1, points2, training=training, bn_momentum=bn_momentum)
            points2 = points2 + nl

        interpolated = ops.three_interpolate(points2, idx, weight)

        grouped_xyz, grouped_feature, _ = ops.grouping(
            interpolated,
            self.nsample,
            xyz1,
            xyz1,
            use_xyz=self.use_xyz,
            use_knn=self.use_knn,
            radius=self.radius if self.radius is not None else 0.2,
        )
        grouped_xyz = grouped_xyz - xyz1[:, :, None, :]

        weight_k = WeightNetHidden((32,), name="decode_weight_net")(
            grouped_xyz, training=training, bn_momentum=bn_momentum
        )
        new_points = jnp.einsum("bnkc,bnkw->bncw", grouped_feature, weight_k)
        Bn, Nn, Cn, Wn = new_points.shape
        new_points = new_points.reshape(Bn, Nn, Cn * Wn)
        new_points = PointConv(self.mlp[0], bn=self.bn, name="decode_after_conv")(
            new_points, training=training, bn_momentum=bn_momentum
        )

        if points1 is not None:
            new_points = jnp.concatenate([new_points, points1], axis=-1)

        for i, out_ch in enumerate(self.mlp):
            if i != 0:
                new_points = PointConv(out_ch, bn=self.bn, name=f"conv_{i}")(
                    new_points, training=training, bn_momentum=bn_momentum
                )
        return new_points

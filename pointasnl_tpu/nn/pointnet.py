"""PointNet++ set-abstraction / feature-propagation modules.

Rebuild of utils/pointnet_util.py (Qi et al.) as Flax modules over the
on-device geometry ops. The classification model uses the group-all SA heads
(models/pointasnl_cls.py:39-40); the residual segmentation model uses the FP
module for decoding (models/pointasnl_sem_seg_res.py:57-60).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointasnl_tpu import ops
from pointasnl_tpu.nn.layers import PointConv

Array = jax.Array


def sample_and_group(
    npoint: int,
    radius: Optional[float],
    nsample: int,
    xyz: Array,
    points: Optional[Array],
    knn: bool = False,
    use_xyz: bool = True,
):
    """FPS + (ball|kNN) grouping with center-normalized xyz.

    Matches utils/pointnet_util.py:22-56 — note grouped_xyz is normalized
    BEFORE the feature concat here (unlike the ASNL grouping which concats
    raw coordinates).
    """
    new_xyz = ops.gather_point(xyz, ops.farthest_point_sample(npoint, xyz))
    if knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz)
    else:
        idx, _ = ops.query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = ops.group_point(xyz, idx)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = ops.group_point(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: Array, points: Optional[Array], use_xyz: bool = True):
    """Group the whole cloud into one region centered at the origin.

    Matches utils/pointnet_util.py:59-84.
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, 1, N))
    grouped_xyz = xyz.reshape(B, 1, N, 3)
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=-1)
        else:
            new_points = points
        new_points = new_points[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


class PointNetSAModule(nn.Module):
    """PointNet++ Set Abstraction (utils/pointnet_util.py:87-154)."""

    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: Optional[float] = None
    nsample: Optional[int] = None
    mlp2: Optional[Sequence[int]] = None
    group_all: bool = False
    bn: bool = True
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True

    @nn.compact
    def __call__(
        self, xyz: Array, points: Optional[Array], *, training: bool, bn_momentum=0.9
    ) -> Tuple[Array, Array, Array]:
        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(xyz, points, self.use_xyz)
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points, self.knn, self.use_xyz
            )

        for i, out_ch in enumerate(self.mlp):
            new_points = PointConv(out_ch, bn=self.bn, name=f"conv{i}")(
                new_points, training=training, bn_momentum=bn_momentum
            )

        if self.pooling == "max":
            new_points = jnp.max(new_points, axis=2, keepdims=True)
        elif self.pooling == "avg":
            new_points = jnp.mean(new_points, axis=2, keepdims=True)
        elif self.pooling == "weighted_avg":
            dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
            exp_dists = jnp.exp(-dists * 5.0)
            weights = exp_dists / jnp.sum(exp_dists, axis=2, keepdims=True)
            new_points = jnp.sum(new_points * weights, axis=2, keepdims=True)
        elif self.pooling == "max_and_avg":
            mx = jnp.max(new_points, axis=2, keepdims=True)
            av = jnp.mean(new_points, axis=2, keepdims=True)
            new_points = jnp.concatenate([av, mx], axis=-1)
        else:
            raise ValueError(f"unknown pooling: {self.pooling!r}")

        if self.mlp2 is not None:
            for i, out_ch in enumerate(self.mlp2):
                new_points = PointConv(out_ch, bn=self.bn, name=f"conv_post_{i}")(
                    new_points, training=training, bn_momentum=bn_momentum
                )

        new_points = jnp.squeeze(new_points, axis=2)
        return new_xyz, new_points, idx


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale-grouping SA (utils/pointnet_util.py:156-196).

    Unused by the three reference models (SURVEY.md §2.8); API parity.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    bn: bool = True
    use_xyz: bool = True

    @nn.compact
    def __call__(
        self, xyz: Array, points: Optional[Array], *, training: bool, bn_momentum=0.9
    ) -> Tuple[Array, Array]:
        new_xyz = ops.gather_point(xyz, ops.farthest_point_sample(self.npoint, xyz))
        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radius_list, self.nsample_list)):
            idx, _ = ops.query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped_points = ops.group_point(points, idx)
                if self.use_xyz:
                    grouped_points = jnp.concatenate([grouped_points, grouped_xyz], axis=-1)
            else:
                grouped_points = grouped_xyz
            for j, out_ch in enumerate(self.mlp_list[i]):
                grouped_points = PointConv(out_ch, bn=self.bn, name=f"conv{i}_{j}")(
                    grouped_points, training=training, bn_momentum=bn_momentum
                )
            outs.append(jnp.max(grouped_points, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFPModule(nn.Module):
    """PointNet++ Feature Propagation (utils/pointnet_util.py:199-229)."""

    mlp: Sequence[int]
    bn: bool = True

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
        interpolated = ops.three_interpolate_idw(xyz1, xyz2, points2)
        if points1 is not None:
            new_points = jnp.concatenate([interpolated, points1], axis=-1)
        else:
            new_points = interpolated
        for i, out_ch in enumerate(self.mlp):
            new_points = PointConv(out_ch, bn=self.bn, name=f"conv_{i}")(
                new_points, training=training, bn_momentum=bn_momentum
            )
        return new_points

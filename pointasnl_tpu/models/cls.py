"""PointASNL classification model (ModelNet40).

Architecture parity with models/pointasnl_cls.py:17-52:
  input B x 1024 x 3 (+3 normals when use_normal);
  SA1 (npoint 512, ns 32, mlp [64,64,128]), SA2 (128, 64, [128,128,256]),
  AS neighbors [12,12] iff adaptive_sample else [0,0];
  two group-all PointNet SA heads [128,256,512] on l1 and [256,512,1024] on l2;
  concat 1536 -> FC512 -> drop(keep 0.4) -> FC256 -> drop(keep 0.4) -> FC num_class.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointasnl_tpu.models.registry import register_model
from pointasnl_tpu.nn.layers import Dropout, FullyConnected
from pointasnl_tpu.nn.pointasnl import PointASNLSetAbstraction
from pointasnl_tpu.nn.pointnet import PointNetSAModule

Array = jax.Array


@register_model("pointasnl_cls")
class PointASNLCls(nn.Module):
    num_class: int = 40
    use_normal: bool = False
    adaptive_sample: bool = False
    # Whole-scene-scale attention controls (threaded to every NL cell; see
    # nn/blockwise.py and SURVEY.md §5.7). None/False = dense parity path.
    nl_kv_block_size: Optional[int] = None
    nl_use_flash: bool = False

    @nn.compact
    def __call__(
        self, point_cloud: Array, *, training: bool, bn_momentum=0.9
    ) -> Tuple[Array, Dict[str, Array]]:
        end_points: Dict[str, Array] = {}
        if self.use_normal:
            l0_xyz = point_cloud[..., :3]
            l0_points = point_cloud[..., 3:6]
        else:
            l0_xyz = point_cloud
            l0_points = point_cloud
        end_points["l0_xyz"] = l0_xyz

        as_neighbor = (12, 12) if self.adaptive_sample else (0, 0)

        l1_xyz, l1_points = PointASNLSetAbstraction(
            npoint=512, nsample=32, mlp=(64, 64, 128), as_neighbor=as_neighbor[0], name="layer1",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l0_xyz, l0_points, training=training, bn_momentum=bn_momentum)
        end_points["l1_xyz"] = l1_xyz

        l2_xyz, l2_points = PointASNLSetAbstraction(
            npoint=128, nsample=64, mlp=(128, 128, 256), as_neighbor=as_neighbor[1], name="layer2",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l1_xyz, l1_points, training=training, bn_momentum=bn_momentum)

        _, l3_points_res, _ = PointNetSAModule(
            mlp=(128, 256, 512), group_all=True, name="layer3_1"
        )(l1_xyz, l1_points, training=training, bn_momentum=bn_momentum)
        _, l3_points, _ = PointNetSAModule(
            mlp=(256, 512, 1024), group_all=True, name="layer3_2"
        )(l2_xyz, l2_points, training=training, bn_momentum=bn_momentum)

        B = point_cloud.shape[0]
        net = jnp.concatenate(
            [l3_points.reshape(B, -1), l3_points_res.reshape(B, -1)], axis=-1
        )
        net = FullyConnected(512, bn=True, name="fc1")(
            net, training=training, bn_momentum=bn_momentum
        )
        net = Dropout(keep_prob=0.4, name="dp1")(net, training=training)
        net = FullyConnected(256, bn=True, name="fc2")(
            net, training=training, bn_momentum=bn_momentum
        )
        net = Dropout(keep_prob=0.4, name="dp2")(net, training=training)
        net = FullyConnected(self.num_class, bn=False, activation=None, name="fc3")(
            net, training=training, bn_momentum=bn_momentum
        )
        return net, end_points

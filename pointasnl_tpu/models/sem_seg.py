"""PointASNL semantic segmentation model (encoder-decoder variant).

Architecture parity with models/pointasnl_sem_seg.py:18-50:
  encoder npoints = N/8, N/32, N/128, N/256; 4x SA (ns=32, as_neighbor
  8/4/0/0, mlps [32,32,64]/[64,64,128]/[128,128,256]/[256,256,512]);
  decoder 4x PointASNLDecodingLayer (nsample=16, mlps
  [512,512]/[256,256]/[256,128]/[128,128,128]);
  head conv1d 128 -> dropout(keep 0.5) -> conv1d num_class.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
from flax import linen as nn

from pointasnl_tpu.models.registry import register_model
from pointasnl_tpu.nn.layers import Dropout, PointConv
from pointasnl_tpu.nn.pointasnl import PointASNLDecodingLayer, PointASNLSetAbstraction

Array = jax.Array


@register_model("pointasnl_sem_seg")
class PointASNLSemSeg(nn.Module):
    num_class: int = 21
    feature_channel: int = 0
    dropout_keep: float = 0.5
    # Whole-scene-scale attention controls (threaded to every NL cell; see
    # nn/blockwise.py and SURVEY.md §5.7). None/False = dense parity path.
    nl_kv_block_size: Optional[int] = None
    nl_use_flash: bool = False

    @nn.compact
    def __call__(
        self, point_cloud: Array, *, training: bool, bn_momentum=0.9
    ) -> Tuple[Array, Dict[str, Array]]:
        end_points: Dict[str, Array] = {}
        num_point = point_cloud.shape[1]
        if self.feature_channel > 0:
            l0_xyz = point_cloud[..., :3]
            l0_points = point_cloud[..., 3 : 3 + self.feature_channel]
        else:
            l0_xyz = point_cloud
            l0_points = point_cloud
        end_points["l0_xyz"] = l0_xyz

        num_points = [num_point // 8, num_point // 32, num_point // 128, num_point // 256]

        l1_xyz, l1_points = PointASNLSetAbstraction(
            npoint=num_points[0], nsample=32, mlp=(32, 32, 64), as_neighbor=8, name="layer1",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l0_xyz, l0_points, training=training, bn_momentum=bn_momentum)
        l2_xyz, l2_points = PointASNLSetAbstraction(
            npoint=num_points[1], nsample=32, mlp=(64, 64, 128), as_neighbor=4, name="layer2",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l1_xyz, l1_points, training=training, bn_momentum=bn_momentum)
        l3_xyz, l3_points = PointASNLSetAbstraction(
            npoint=num_points[2], nsample=32, mlp=(128, 128, 256), as_neighbor=0, name="layer3",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l2_xyz, l2_points, training=training, bn_momentum=bn_momentum)
        l4_xyz, l4_points = PointASNLSetAbstraction(
            npoint=num_points[3], nsample=32, mlp=(256, 256, 512), as_neighbor=0, name="layer4",
            nl_kv_block_size=self.nl_kv_block_size, nl_use_flash=self.nl_use_flash,
        )(l3_xyz, l3_points, training=training, bn_momentum=bn_momentum)
        end_points["l1_xyz"] = l1_xyz

        l3_points = PointASNLDecodingLayer(nsample=16, mlp=(512, 512), name="fa_layer1")(
            l3_xyz, l4_xyz, l3_points, l4_points, training=training, bn_momentum=bn_momentum
        )
        l2_points = PointASNLDecodingLayer(nsample=16, mlp=(256, 256), name="fa_layer2")(
            l2_xyz, l3_xyz, l2_points, l3_points, training=training, bn_momentum=bn_momentum
        )
        l1_points = PointASNLDecodingLayer(nsample=16, mlp=(256, 128), name="fa_layer3")(
            l1_xyz, l2_xyz, l1_points, l2_points, training=training, bn_momentum=bn_momentum
        )
        l0_points = PointASNLDecodingLayer(nsample=16, mlp=(128, 128, 128), name="fa_layer4")(
            l0_xyz, l1_xyz, l0_points, l1_points, training=training, bn_momentum=bn_momentum
        )

        net = PointConv(128, bn=True, name="fc1")(
            l0_points, training=training, bn_momentum=bn_momentum
        )
        end_points["feats"] = net
        net = Dropout(keep_prob=self.dropout_keep, name="dp1")(net, training=training)
        net = PointConv(self.num_class, bn=False, activation=None, name="fc2")(
            net, training=training, bn_momentum=bn_momentum
        )
        return net, end_points

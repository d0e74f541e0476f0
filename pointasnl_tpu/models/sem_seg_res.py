"""PointASNL residual semantic segmentation model (the ScanNet-grid flagship).

Architecture parity with models/pointasnl_sem_seg_res.py:19-68:
  stem SA at full N (mlp [16,16,32], NL=False);
  4 residual levels: a downsampling NL branch + a same-resolution local-only
  branch summed (note level 3/4 local branches consume the *_1 outputs,
  :46,:51 — kept verbatim);
  decoder: 4x plain PointNet++ FP modules;
  head conv1d 128 (leaky-relu) -> dropout(keep 0.5) -> conv1d num_class.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
from flax import linen as nn

from pointasnl_tpu.models.registry import register_model
from pointasnl_tpu.nn.layers import Dropout, PointConv
from pointasnl_tpu.nn.pointasnl import PointASNLSetAbstraction
from pointasnl_tpu.nn.pointnet import PointNetFPModule

Array = jax.Array


@register_model("pointasnl_sem_seg_res")
class PointASNLSemSegRes(nn.Module):
    num_class: int = 21
    feature_channel: int = 0
    # Whole-scene-scale attention controls (threaded to every NL cell; see
    # nn/blockwise.py and SURVEY.md §5.7). None/False = dense parity path.
    nl_kv_block_size: Optional[int] = None
    nl_use_flash: bool = False
    # Reuse the stem's self-kNN graph for the level-1 branches: their queries
    # are FPS samples of the same cloud, so their kNN rows are exact gathers
    # of the stem graph (tested identical in tests/test_models.py). Skips the
    # second-largest kNN search of the step.
    reuse_geometry: bool = True
    # Head dropout keep probability (reference hardcodes 0.5,
    # models/pointasnl_sem_seg_res.py:64); 1.0 disables dropout — used by the
    # sharded-train-step parity tests to compare deterministic gradients.
    dropout_keep: float = 0.5

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

        def sa(name, npoint, mlp, as_neighbor, NL=True):
            return PointASNLSetAbstraction(
                npoint=npoint, nsample=32, mlp=mlp, as_neighbor=as_neighbor, NL=NL,
                nl_kv_block_size=self.nl_kv_block_size,
                nl_use_flash=self.nl_use_flash,
                name=name,
            )

        # Stem self-kNN graph, hoisted so level 1 can gather its rows.
        if self.reuse_geometry:
            from pointasnl_tpu import ops

            _, knn0_idx = ops.knn_point(32, l0_xyz, l0_xyz)
            fps1_idx = ops.farthest_point_sample(num_points[0], l0_xyz)
            l1_knn_idx = ops.gather_point(knn0_idx, fps1_idx)
        else:
            knn0_idx = fps1_idx = l1_knn_idx = None

        _, l0_points = sa("layer0", num_point, (16, 16, 32), 0, NL=False)(
            l0_xyz, l0_points, training=training, bn_momentum=bn_momentum,
            knn_idx=knn0_idx,
        )

        # 1st residual level
        l1_xyz, l1_1_points = sa("layer1_1", num_points[0], (32, 32, 64), 8)(
            l0_xyz, l0_points, training=training, bn_momentum=bn_momentum,
            fps_idx=fps1_idx, knn_idx=l1_knn_idx,
        )
        _, l1_2_points = sa("layer1_2", num_points[0], (64, 64), 0, NL=False)(
            l0_xyz, l0_points, training=training, bn_momentum=bn_momentum,
            fps_idx=fps1_idx, knn_idx=l1_knn_idx,
        )
        l1_2_points = l1_2_points + l1_1_points

        # 2nd residual level
        l2_xyz, l2_1_points = sa("layer2_1", num_points[1], (64, 64, 128), 4)(
            l1_xyz, l1_2_points, training=training, bn_momentum=bn_momentum
        )
        _, l2_2_points = sa("layer2_2", num_points[1], (128, 128), 0, NL=False)(
            l2_xyz, l2_1_points, training=training, bn_momentum=bn_momentum
        )
        l2_2_points = l2_2_points + l2_1_points

        # 3rd residual level
        l3_xyz, l3_1_points = sa("layer3_1", num_points[2], (128, 128, 256), 0)(
            l2_xyz, l2_2_points, training=training, bn_momentum=bn_momentum
        )
        _, l3_2_points = sa("layer3_2", num_points[2], (256, 256), 0, NL=False)(
            l3_xyz, l3_1_points, training=training, bn_momentum=bn_momentum
        )
        l3_2_points = l3_2_points + l3_1_points

        # 4th residual level
        l4_xyz, l4_1_points = sa("layer4_1", num_points[3], (256, 256, 512), 0)(
            l3_xyz, l3_2_points, training=training, bn_momentum=bn_momentum
        )
        _, l4_2_points = sa("layer4_2", num_points[3], (512, 512), 0, NL=False)(
            l4_xyz, l4_1_points, training=training, bn_momentum=bn_momentum
        )
        l4_2_points = l4_2_points + l4_1_points

        end_points["l1_xyz"] = l1_xyz

        l3_points = PointNetFPModule(mlp=(512, 512), name="fa_layer1")(
            l3_xyz, l4_xyz, l3_2_points, l4_2_points, training=training, bn_momentum=bn_momentum
        )
        l2_points = PointNetFPModule(mlp=(256, 256), name="fa_layer2")(
            l2_xyz, l3_xyz, l2_2_points, l3_points, training=training, bn_momentum=bn_momentum
        )
        l1_points = PointNetFPModule(mlp=(256, 128), name="fa_layer3")(
            l1_xyz, l2_xyz, l1_2_points, l2_points, training=training, bn_momentum=bn_momentum
        )
        l0_points = PointNetFPModule(mlp=(128, 128, 128), name="fa_layer4")(
            l0_xyz, l1_xyz, l0_points, l1_points, training=training, bn_momentum=bn_momentum
        )

        net = PointConv(128, bn=True, activation=nn.leaky_relu, name="fc1")(
            l0_points, training=training, bn_momentum=bn_momentum
        )
        end_points["feats"] = net
        net = Dropout(keep_prob=self.dropout_keep, name="dp")(net, training=training)
        net = PointConv(self.num_class, bn=False, activation=None, name="fc0")(
            net, training=training, bn_momentum=bn_momentum
        )
        return net, end_points

"""Point-sharded whole-scene inference for the residual seg model.

Single-chip single-pass inference tops out at the chip's memory (the
spatial kNN kernel reaches N=524288). This runs `pointasnl_sem_seg_res`'s
forward with the POINT axis sharded over a device mesh, exploiting the
model's structure: only the stem SA, the last decode layer, and the head
touch full N — levels 1-4 (N/8 and below) fit replicated on every device.

Per device:
  1. sharded geometry: the full self-kNN graph via the query-sharded kernel
     (no collectives) and FPS via the sharded iterative scheme;
  2. stem SA on the local query shard, gathering neighbors from the
     replicated input cloud (the SA cell's support_xyz/support_feature
     arguments exist for exactly this);
  3. one all_gather of the stem output (B, N, 32) + the kNN graph, then
     levels 1-4 and decode layers fa1-fa3 replicated — identical math on
     every device;
  4. the final interpolation decode (fa_layer4) and head convs back on the
     local shard; logits leave sharded on the point axis.

The orchestration mirrors models/sem_seg_res.py submodule-for-submodule
(including the *_1-input quirk at levels 3/4) and applies each flax
submodule with its parameter subtree — tests pin exact equality against
`model.apply` on the 8-device CPU mesh (tests/test_whole_scene_sharded.py).

Wrap calls in jax.jit (the function builds fresh module closures per call,
so unjitted invocations re-trace). Validated on real TPU hardware with a
1-device mesh (131k points, 1.48 s/call); on one device the monolithic
single-pass path (`test_scannet --single_pass`) is faster (0.61 s) — this
API pays collective/orchestration overhead to scale N and latency across
devices, which a 1-chip environment cannot demonstrate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pointasnl_tpu.nn.layers import PointConv
from pointasnl_tpu.nn.pointasnl import PointASNLSetAbstraction
from pointasnl_tpu.nn.pointnet import PointNetFPModule
from pointasnl_tpu.parallel.sharded_knn import (
    farthest_point_sample_sharded,
    knn_point_query_sharded,
)

import flax.linen as nn


def _vars(variables, name):
    out = {"params": variables["params"][name]}
    bs = variables.get("batch_stats", {})
    if name in bs:
        out["batch_stats"] = bs[name]
    return out


def predict_scene_sharded(
    variables,
    points: jax.Array,
    mesh: Mesh,
    *,
    num_class: int = 21,
    feature_channel: int = 0,
    nl_kv_block_size: Optional[int] = 4096,
    axis: str = "data",
) -> jax.Array:
    """Eval-mode pointasnl_sem_seg_res logits, point-sharded over `axis`.

    Args:
      variables: {'params', 'batch_stats'} of a trained PointASNLSemSegRes.
      points: (B, N, 3 + feature_channel); N divisible by 256 * mesh size.
      mesh: the device mesh; `axis` names the point-sharding axis.
      nl_kv_block_size: streams every non-local cell's K/V (memory-bounded
        attention); None uses the dense maps (small scenes only).

    Returns:
      (B, N, num_class) logits, sharded on the point axis.
    """
    B, N, _ = points.shape
    D = mesh.shape[axis]
    if N % (256 * D):
        raise ValueError(
            f"predict_scene_sharded: N={N} must divide by 256 * {D} "
            "(deepest encoder stride x mesh axis)"
        )
    shard_n = N // D
    nps = [N // 8, N // 32, N // 128, N // 256]
    xyz = points[..., :3]

    def sa(npoint, mlp, as_n, NL):
        return PointASNLSetAbstraction(
            npoint=npoint, nsample=32, mlp=mlp, as_neighbor=as_n, NL=NL,
            nl_kv_block_size=nl_kv_block_size,
        )

    # Sharded geometry plan (collective ops outside the main shard_map).
    _, knn0_idx = knn_point_query_sharded(32, xyz, xyz, mesh, axis=axis)
    fps1_idx = farthest_point_sample_sharded(nps[0], xyz, mesh, axis=axis)

    def apply(mod, name, *args, **kw):
        return mod.apply(_vars(variables, name), *args, training=False,
                         bn_momentum=0.9, **kw)

    def body(x_full, knn0_loc, fps1):
        sid = lax.axis_index(axis)
        x_shard = lax.dynamic_slice_in_dim(x_full, sid * shard_n, shard_n, 1)
        if feature_channel > 0:
            l0_xyz, l0_feat = x_full[..., :3], x_full[..., 3:]
            sh_xyz, sh_feat = x_shard[..., :3], x_shard[..., 3:]
        else:
            l0_xyz = l0_feat = x_full
            sh_xyz = sh_feat = x_shard

        # stem on the local shard, neighbors from the replicated cloud
        _, l0p_shard = apply(
            sa(shard_n, (16, 16, 32), 0, NL=False), "layer0",
            sh_xyz, sh_feat, knn_idx=knn0_loc,
            support_xyz=l0_xyz, support_feature=l0_feat,
        )

        l0_points = lax.all_gather(l0p_shard, axis, axis=1, tiled=True)
        knn0_full = lax.all_gather(knn0_loc, axis, axis=1, tiled=True)
        l1_knn = jnp.take_along_axis(knn0_full, fps1[..., None], axis=1)

        # levels 1-4 + decode to fa_layer3: replicated (N/8 and below)
        l1_xyz, l1_1 = apply(sa(nps[0], (32, 32, 64), 8, True), "layer1_1",
                             l0_xyz, l0_points, fps_idx=fps1, knn_idx=l1_knn)
        _, l1_2 = apply(sa(nps[0], (64, 64), 0, False), "layer1_2",
                        l0_xyz, l0_points, fps_idx=fps1, knn_idx=l1_knn)
        l1_2 = l1_2 + l1_1

        l2_xyz, l2_1 = apply(sa(nps[1], (64, 64, 128), 4, True), "layer2_1",
                             l1_xyz, l1_2)
        _, l2_2 = apply(sa(nps[1], (128, 128), 0, False), "layer2_2",
                        l2_xyz, l2_1)
        l2_2 = l2_2 + l2_1

        l3_xyz, l3_1 = apply(sa(nps[2], (128, 128, 256), 0, True), "layer3_1",
                             l2_xyz, l2_2)
        _, l3_2 = apply(sa(nps[2], (256, 256), 0, False), "layer3_2",
                        l3_xyz, l3_1)  # the reference's *_1-input quirk
        l3_2 = l3_2 + l3_1

        l4_xyz, l4_1 = apply(sa(nps[3], (256, 256, 512), 0, True), "layer4_1",
                             l3_xyz, l3_2)
        _, l4_2 = apply(sa(nps[3], (512, 512), 0, False), "layer4_2",
                        l4_xyz, l4_1)
        l4_2 = l4_2 + l4_1

        l3_pts = apply(PointNetFPModule(mlp=(512, 512)), "fa_layer1",
                       l3_xyz, l4_xyz, l3_2, l4_2)
        l2_pts = apply(PointNetFPModule(mlp=(256, 256)), "fa_layer2",
                       l2_xyz, l3_xyz, l2_2, l3_pts)
        l1_pts = apply(PointNetFPModule(mlp=(256, 128)), "fa_layer3",
                       l1_xyz, l2_xyz, l1_2, l2_pts)

        # final decode + head back on the local shard
        l0_out = apply(PointNetFPModule(mlp=(128, 128, 128)), "fa_layer4",
                       sh_xyz, l1_xyz, l0p_shard, l1_pts)
        net = apply(PointConv(128, bn=True, activation=nn.leaky_relu), "fc1",
                    l0_out)
        # dropout ('dp') is identity at inference and holds no parameters
        logits = apply(PointConv(num_class, bn=False, activation=None), "fc0",
                       net)
        return logits

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(points, knn0_idx, fps1_idx)

"""Flax module library: TF-layer equivalents + the PointASNL / PointNet++ zoo."""

from pointasnl_tpu.nn.layers import BatchNorm, Dropout, PointConv, FullyConnected
from pointasnl_tpu.nn.pointasnl import (
    AdaptiveSampling,
    PointASNLDecodingLayer,
    PointASNLSetAbstraction,
    PointNonLocalCell,
    SampleWeights,
    WeightNetHidden,
    NonlinearTransform,
)
from pointasnl_tpu.nn.pointnet import (
    PointNetFPModule,
    PointNetSAModule,
    PointNetSAModuleMSG,
)
from pointasnl_tpu.nn.losses import (
    l2_regularization,
    softmax_cross_entropy,
    weighted_softmax_cross_entropy,
)

__all__ = [
    "AdaptiveSampling",
    "BatchNorm",
    "Dropout",
    "FullyConnected",
    "NonlinearTransform",
    "PointASNLDecodingLayer",
    "PointASNLSetAbstraction",
    "PointConv",
    "PointNetFPModule",
    "PointNetSAModule",
    "PointNetSAModuleMSG",
    "PointNonLocalCell",
    "SampleWeights",
    "WeightNetHidden",
    "l2_regularization",
    "softmax_cross_entropy",
    "weighted_softmax_cross_entropy",
]

from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import (
    SetAbstraction,
    SetAbstractionMsg,
    FeaturePropagation,
    PointMLP,
)
from prifit_tpu.nn.pointnet import (
    STN,
    PointNetEncoder,
    feature_transform_regularizer,
)
from prifit_tpu.nn.dgcnn import DGCNNEncoderGn, DGCNNGn
from prifit_tpu.nn.atlasnet import PointGenCon, AtlasNet

__all__ = [
    "BatchNorm",
    "SetAbstraction",
    "SetAbstractionMsg",
    "FeaturePropagation",
    "PointMLP",
    "STN",
    "PointNetEncoder",
    "feature_transform_regularizer",
    "DGCNNEncoderGn",
    "DGCNNGn",
    "PointGenCon",
    "AtlasNet",
]

from prifit_tpu.data.shapenet import (
    SEG_CLASSES,
    pc_normalize,
    PartNormalDataset,
    SelfSupPartNormalDataset,
    ACDSelfSupDataset,
    MultiACDSelfSupDataset,
)
from prifit_tpu.data.loader import DataLoader, shard_for_host
from prifit_tpu.data.modelnet import ModelNetDataLoader
from prifit_tpu.data.s3dis import S3DISDataset, S3DIS_CLASSES
from prifit_tpu.data.augment import Augment
from prifit_tpu.data import provider

__all__ = [
    "SEG_CLASSES",
    "pc_normalize",
    "PartNormalDataset",
    "SelfSupPartNormalDataset",
    "ACDSelfSupDataset",
    "MultiACDSelfSupDataset",
    "DataLoader",
    "shard_for_host",
    "ModelNetDataLoader",
    "S3DISDataset",
    "S3DIS_CLASSES",
    "Augment",
    "provider",
]

"""Model registry: string name -> model module.

Mirrors the reference's dynamic loading
(``importlib.import_module(args.model)``,
``train_partseg_shapenet.py:219``): each module in this package exposes
``get_model`` (a flax Module class) and functional ``get_loss`` /
``get_selfsup_loss``.  DGCNN is selected like the reference does it —
any name containing ``"dgcnn"`` (``train_partseg_shapenet.py:226-228``).
"""

import importlib

MODEL_NAMES = (
    "pointnet2_part_seg_msg",
    "pretrain_pointnet2_part_seg_msg",
    "pointnet2_part_seg_ssg",
    "pointnet_part_seg",
    "pointnet_cls",
    "pointnet2_cls_ssg",
    "pointnet2_cls_msg",
    "pointnet_sem_seg",
    "pointnet2_sem_seg",
    "dgcnn",
    "reconstruction",
)


def get_module(name: str):
    """Resolve a model module by its reference-compatible name."""
    if "dgcnn" in name:
        name = "dgcnn"
    if name not in MODEL_NAMES:
        raise ValueError(f"unknown model {name!r}; one of {MODEL_NAMES}")
    return importlib.import_module(f"prifit_tpu.models.{name}")


from prifit_tpu.models.common import (  # noqa: E402
    SegOutput,
    chamfer_loss_dense,
    nll_loss,
    pairwise_contrastive_loss,
    to_categorical,
)

__all__ = [
    "MODEL_NAMES",
    "get_module",
    "SegOutput",
    "chamfer_loss_dense",
    "nll_loss",
    "pairwise_contrastive_loss",
    "to_categorical",
]

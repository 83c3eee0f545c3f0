"""AtlasNet reconstruction model (rebuilds ``models/reconstruction.py``).

MSG backbone + multi-chart AtlasNet decoder over the mean pre-head
feature; returns part logits and the reconstructed cloud.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.models.common import (
    SegOutput,
    chamfer_loss_dense,
    nll_loss,
    pairwise_contrastive_loss,
)
from prifit_tpu.nn.atlasnet import AtlasNet
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMsg,
)


class get_model(nn.Module):
    num_classes: int
    normal_channel: bool = False
    l2_norm: bool = False
    num_charts: int = 25
    num_points: int = 128
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xyz, cls_label, *, train: bool = True,
                 bn_momentum=0.1, **_unused) -> SegOutput:
        B, N, _ = xyz.shape
        an = self.axis_name
        l0_points = xyz
        l0_xyz = xyz[..., :3]

        l1_xyz, l1_points = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [32, 64, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], an, name="sa1")(
                l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points = SetAbstractionMsg(
            128, [0.4, 0.8], [64, 128],
            [[128, 128, 256], [128, 196, 256]], an, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        l3_xyz, l3_points = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            axis_name=an, name="sa3")(l2_xyz, l2_points, train, bn_momentum)

        l2_points = FeaturePropagation([256, 256], an, name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l1_points = FeaturePropagation([256, 128], an, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        cls_onehot = jnp.broadcast_to(cls_label[:, None, :], (B, N, 16))
        skip = jnp.concatenate([cls_onehot, l0_xyz, l0_points], axis=-1)
        l0_points = FeaturePropagation([128, 128], an, name="fp1")(
            l0_xyz, l1_xyz, skip, l1_points, train, bn_momentum)

        feat = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(128, name="conv1")(l0_points),
            use_running_average=not train, momentum=bn_momentum))
        if self.l2_norm:
            feat = feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)

        x = nn.Dropout(0.5, deterministic=not train, name="drop1")(feat)
        x = nn.Dense(self.num_classes, name="conv2")(x)
        x = jax.nn.log_softmax(x, axis=-1)

        z = jnp.mean(feat, axis=1)
        allpts = AtlasNet(128, self.num_charts, self.num_points,
                          axis_name=an, name="atlasnet")(
                              z, train, bn_momentum)

        zero = jnp.zeros((), jnp.float32)
        return SegOutput(seg_logits=x,
                         hidden=(l1_points, l2_points, l3_points),
                         feat=feat, total_loss=zero, chamfer_loss=zero,
                         recon_points=allpts)


def get_loss(pred, target, trans_feat=None):
    return nll_loss(pred, target)


def get_selfsup_loss(feat, target, key, margin=0.5):
    return pairwise_contrastive_loss(feat, target, key, margin)


def get_rec_selfsup_loss(feat, target, pts, gtpts, key, margin=0.5,
                         lcont=0.0, lrec=1.0):
    """Contrastive + reconstruction loss
    (``models/reconstruction.py:169-201``)."""
    cont = pairwise_contrastive_loss(feat, target, key, margin)
    rec = chamfer_loss_dense(pts, gtpts)
    return lcont * cont + lrec * rec

"""PointNet++ scene semantic segmentation (rebuilds
``models/pointnet2_sem_seg.py``; surface parity — dataset not shipped)."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.models.common import nll_loss
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import FeaturePropagation, SetAbstraction


class get_model(nn.Module):
    num_classes: int
    with_rgb: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xyz, *, train: bool = True, bn_momentum=0.1):
        an = self.axis_name
        l0_points = xyz
        l0_xyz = xyz[..., :3]
        l1_xyz, l1_points = SetAbstraction(
            1024, 0.1, 32, [32, 32, 64], axis_name=an, name="sa1")(
                l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points = SetAbstraction(
            256, 0.2, 32, [64, 64, 128], axis_name=an, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        l3_xyz, l3_points = SetAbstraction(
            64, 0.4, 32, [128, 128, 256], axis_name=an, name="sa3")(
                l2_xyz, l2_points, train, bn_momentum)
        l4_xyz, l4_points = SetAbstraction(
            16, 0.8, 32, [256, 256, 512], axis_name=an, name="sa4")(
                l3_xyz, l3_points, train, bn_momentum)

        l3_points = FeaturePropagation([256, 256], an, name="fp4")(
            l3_xyz, l4_xyz, l3_points, l4_points, train, bn_momentum)
        l2_points = FeaturePropagation([256, 256], an, name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l1_points = FeaturePropagation([256, 128], an, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        l0_points = FeaturePropagation([128, 128, 128], an, name="fp1")(
            l0_xyz, l1_xyz, None, l1_points, train, bn_momentum)

        x = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(128, name="conv1")(l0_points),
            use_running_average=not train, momentum=bn_momentum))
        x = nn.Dropout(0.5, deterministic=not train, name="drop1")(x)
        x = nn.Dense(self.num_classes, name="conv2")(x)
        return jax.nn.log_softmax(x, axis=-1), l4_points


def get_loss(pred, target, trans_feat=None, weight=None):
    if weight is not None:
        w = jnp.take(weight, target)
        ll = jnp.take_along_axis(pred, target[..., None], axis=-1)[..., 0]
        return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return nll_loss(pred, target)

"""PointNet++ SSG classification (rebuilds ``models/pointnet2_cls_ssg.py``)."""

import jax
from flax import linen as nn

from prifit_tpu.models.common import nll_loss
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import SetAbstraction


class get_model(nn.Module):
    num_class: int
    normal_channel: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, xyz, *, train: bool = True, bn_momentum=0.1):
        """xyz [B, N, 3(+3)] -> (log-probs [B, k], l3 global feats)."""
        an = self.axis_name
        points = xyz[..., 3:] if self.normal_channel else None
        l0_xyz = xyz[..., :3]
        l1_xyz, l1_points = SetAbstraction(
            512, 0.2, 32, [64, 64, 128], axis_name=an, name="sa1")(
                l0_xyz, points, train, bn_momentum)
        l2_xyz, l2_points = SetAbstraction(
            128, 0.4, 64, [128, 128, 256], axis_name=an, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        _, l3_points = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            axis_name=an, name="sa3")(l2_xyz, l2_points, train, bn_momentum)
        x = l3_points.reshape(xyz.shape[0], 1024)

        def head(y, f, rate, name):
            y = nn.Dense(f, name=f"fc{name}")(y)
            y = BatchNorm(axis_name=an, name=f"bn{name}")(
                y, use_running_average=not train, momentum=bn_momentum)
            y = nn.relu(y)
            return nn.Dropout(rate, deterministic=not train,
                              name=f"drop{name}")(y)

        x = head(x, 512, 0.4, "1")
        x = head(x, 256, 0.4, "2")
        x = nn.Dense(self.num_class, name="fc3")(x)
        return jax.nn.log_softmax(x, axis=-1), l3_points


def get_loss(pred, target, trans_feat=None):
    return nll_loss(pred, target)

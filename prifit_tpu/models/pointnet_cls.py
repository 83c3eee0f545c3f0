"""PointNet classification head (ModelNet40 probe).

Rebuilds ``models/pointnet_cls.py``: shared encoder with feature transform,
3 FC layers, log-softmax class scores.
"""

import jax
from flax import linen as nn

from prifit_tpu.models.common import nll_loss
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet import PointNetEncoder, feature_transform_regularizer


class get_model(nn.Module):
    k: int = 40
    normal_channel: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, bn_momentum=0.1):
        """x [B, N, 3(+3)] -> (log-probs [B, k], trans_feat)."""
        an = self.axis_name
        x, _, trans_feat = PointNetEncoder(
            global_feat=True, feature_transform=True, axis_name=an,
            name="feat")(x, train, bn_momentum)
        x = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(512, name="fc1")(x),
            use_running_average=not train, momentum=bn_momentum))
        x = nn.Dropout(0.4, deterministic=not train, name="dropout")(
            nn.Dense(256, name="fc2")(x))
        x = nn.relu(BatchNorm(axis_name=an, name="bn2")(
            x, use_running_average=not train, momentum=bn_momentum))
        x = nn.Dense(self.k, name="fc3")(x)
        return jax.nn.log_softmax(x, axis=-1), trans_feat


def get_loss(pred, target, trans_feat, mat_diff_loss_scale=0.001):
    return nll_loss(pred, target) + mat_diff_loss_scale * \
        feature_transform_regularizer(trans_feat)

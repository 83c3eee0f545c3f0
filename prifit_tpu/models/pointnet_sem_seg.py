"""PointNet scene semantic segmentation (rebuilds
``models/pointnet_sem_seg.py``; kept for surface parity — the reference
never ships its S3DIS dataset)."""

import jax
from flax import linen as nn

from prifit_tpu.models.common import nll_loss
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet import PointNetEncoder, feature_transform_regularizer


class get_model(nn.Module):
    num_class: int
    with_rgb: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, bn_momentum=0.1):
        """x [B, N, 3(+3)] -> (log-probs [B, N, k], trans_feat)."""
        an = self.axis_name
        x, _, trans_feat = PointNetEncoder(
            global_feat=False, feature_transform=True, axis_name=an,
            name="feat")(x, train, bn_momentum)          # [B, N, 1088]

        def block(y, f, name):
            y = nn.Dense(f, name=f"conv{name}")(y)
            y = BatchNorm(axis_name=an, name=f"bn{name}")(
                y, use_running_average=not train, momentum=bn_momentum)
            return nn.relu(y)

        x = block(x, 512, "1")
        x = block(x, 256, "2")
        x = block(x, 128, "3")
        x = nn.Dense(self.num_class, name="conv4")(x)
        return jax.nn.log_softmax(x, axis=-1), trans_feat


def get_loss(pred, target, trans_feat, weight=None,
             mat_diff_loss_scale=0.001):
    if weight is not None:
        import jax.numpy as jnp
        w = jnp.take(weight, target)
        ll = jnp.take_along_axis(pred, target[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    else:
        loss = nll_loss(pred, target)
    return loss + mat_diff_loss_scale * \
        feature_transform_regularizer(trans_feat)

"""Original PointNet part segmentation (baseline).

Rebuilds ``models/pointnet_part_seg.py``: STN3d alignment, 5 conv stages,
STNkd(128) feature transform, 2048-d global max + 16-d one-hot concat,
4944-channel seg head.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.models.common import (
    SegOutput,
    nll_loss,
    pairwise_contrastive_loss,
)
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet import STN, feature_transform_regularizer


class get_model(nn.Module):
    part_num: int = 50
    normal_channel: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, point_cloud, label, *, train: bool = True,
                 bn_momentum=0.1, **_unused) -> SegOutput:
        """point_cloud [B, N, 3(+3)], label [B, 16] one-hot."""
        B, N, D = point_cloud.shape
        an = self.axis_name
        trans = STN(3, an, name="stn")(point_cloud, train, bn_momentum)
        xyz = jnp.matmul(point_cloud[..., :3], trans,
                         preferred_element_type=jnp.float32)
        if D > 3:
            x = jnp.concatenate([xyz, point_cloud[..., 3:]], axis=-1)
        else:
            x = xyz

        def block(y, f, name, relu=True):
            y = nn.Dense(f, name=f"conv{name}")(y)
            y = BatchNorm(axis_name=an, name=f"bn{name}")(
                y, use_running_average=not train, momentum=bn_momentum)
            return nn.relu(y) if relu else y

        out1 = block(x, 64, "1")
        out2 = block(out1, 128, "2")
        out3 = block(out2, 128, "3")

        trans_feat = STN(128, an, name="fstn")(out3, train, bn_momentum)
        net_t = jnp.matmul(out3, trans_feat,
                           preferred_element_type=jnp.float32)

        out4 = block(net_t, 512, "4")
        out5 = block(out4, 2048, "5", relu=False)
        out_max = jnp.max(out5, axis=1)                       # [B, 2048]
        out_max = jnp.concatenate([out_max, label], axis=-1)  # [B, 2064]

        expand = jnp.broadcast_to(out_max[:, None, :], (B, N, 2064))
        concat = jnp.concatenate([expand, out1, out2, out3, out4, out5],
                                 axis=-1)                     # [B, N, 4944]

        net = block(concat, 256, "s1")
        net = block(net, 256, "s2")
        feat = block(net, 128, "s3")
        net = nn.Dense(self.part_num, name="convs4")(feat)
        net = jax.nn.log_softmax(net, axis=-1)

        zero = jnp.zeros((), jnp.float32)
        return SegOutput(seg_logits=net, hidden=out_max, feat=feat,
                         total_loss=zero, chamfer_loss=zero,
                         trans_feat=trans_feat)


def get_loss(pred, target, trans_feat, mat_diff_loss_scale=0.001):
    """NLL + scaled feature-transform orthogonality regularizer."""
    return nll_loss(pred, target) + mat_diff_loss_scale * \
        feature_transform_regularizer(trans_feat)


def get_selfsup_loss(feat, target, key, margin=0.5):
    return pairwise_contrastive_loss(feat, target, key, margin)

"""PointNet++ SSG part segmentation (few-shot baseline).

Rebuilds ``models/pointnet2_part_seg_ssg.py``: SA(512, r=0.2, K=32) ->
SA(128, r=0.4, K=64) -> SA-global -> FP x3 -> 128-d head.  The reference
returns a plain 2-tuple; here the uniform :class:`SegOutput` contract is
used (hidden = l3 global features).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.models.common import SegOutput, nll_loss
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import FeaturePropagation, SetAbstraction


class get_model(nn.Module):
    num_classes: int
    normal_channel: bool = False
    axis_name: str | None = None
    compute_dtype: str = "auto"
    # nearest-k-within-radius fused ball query (TPU-fast, documented
    # semantics deviation) vs the reference's first-k-by-index
    # query_ball_point (ops/sampling.py; A/B in STATUS.md)
    fused_ball_query: bool = True   # see pointnet2_part_seg_msg.get_model

    def _encoder_dtypes(self):
        """See :func:`prifit_tpu.models.common.encoder_dtypes` — shared
        with the MSG flagship so every ``--encoder_dtype`` mode (bf16,
        sa_bf16, mx, mxsr) means the same thing on both models (a local
        copy had drifted and silently no-op'd mx/mxsr)."""
        from prifit_tpu.models.common import encoder_dtypes
        return encoder_dtypes(self.compute_dtype)

    @nn.compact
    def __call__(self, xyz, cls_label, *, train: bool = True,
                 bn_momentum=0.1, **_unused) -> SegOutput:
        B, N, _ = xyz.shape
        an = self.axis_name
        dt_sa, dt_fp = self._encoder_dtypes()
        l0_points = xyz
        l0_xyz = xyz[..., :3]

        l1_xyz, l1_points = SetAbstraction(
            512, 0.2, 32, [64, 64, 128], axis_name=an, dtype=dt_sa,
            fused=self.fused_ball_query, name="sa1")(
                l0_xyz, l0_points, train, bn_momentum)
        l2_xyz, l2_points = SetAbstraction(
            128, 0.4, 64, [128, 128, 256], axis_name=an, dtype=dt_sa,
            fused=self.fused_ball_query, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        l3_xyz, l3_points = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            axis_name=an, dtype=dt_sa, name="sa3")(
                l2_xyz, l2_points, train, bn_momentum)

        l2_points = FeaturePropagation([256, 256], an, dtype=dt_fp,
                                       name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l1_points = FeaturePropagation([256, 128], an, dtype=dt_fp,
                                       name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        cls_onehot = jnp.broadcast_to(cls_label[:, None, :], (B, N, 16))
        skip = jnp.concatenate([cls_onehot, l0_xyz, l0_points], axis=-1)
        l0_points = FeaturePropagation([128, 128, 128], an, dtype=dt_fp,
                                       name="fp1")(
            l0_xyz, l1_xyz, skip, l1_points, train, bn_momentum)

        l0_points = l0_points.astype(jnp.float32)
        feat = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(128, name="conv1")(l0_points),
            use_running_average=not train, momentum=bn_momentum))
        x = nn.Dropout(0.5, deterministic=not train, name="drop1")(feat)
        x = nn.Dense(self.num_classes, name="conv2")(x)
        x = jax.nn.log_softmax(x, axis=-1)

        zero = jnp.zeros((), jnp.float32)
        return SegOutput(seg_logits=x,
                         hidden=l3_points.astype(jnp.float32), feat=feat,
                         total_loss=zero, chamfer_loss=zero)


def get_loss(pred, target, trans_feat=None):
    return nll_loss(pred, target)

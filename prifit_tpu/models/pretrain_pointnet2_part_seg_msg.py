"""PointNet++ MSG pretraining model (no extra_layers tower).

Rebuilds ``models/pretrain_pointnet2_part_seg_msg.py``: same MSG backbone,
``feat_embed = extra_conv_emb(feat)`` with optional l2 normalization, and
the canonical 5-tuple return contract (:88) that :class:`SegOutput`
formalizes.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.geometry.convex_loss import convex_loss
from prifit_tpu.models.common import (
    SegOutput,
    chamfer_loss_dense,
    encoder_dtypes,
    maybe_quant,
    nll_loss,
    pairwise_contrastive_loss,
    stage_cfg,
)
from prifit_tpu.nn.atlasnet import AtlasNet
from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.nn.pointnet2 import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMsg,
)


class get_model(nn.Module):
    num_parts: int
    normal_channel: bool = False
    l2_norm: bool = False
    reconstruct: bool = False
    axis_name: str | None = None
    # seg-head dropout probability (the reference's mutable ``drop1.p``;
    # trajectory-parity tests set 0.0 on both sides)
    dropout_rate: float = 0.5
    compute_dtype: str = "auto"
    # nearest-k-within-radius fused ball query (TPU-fast, documented
    # semantics deviation) vs the reference's first-k-by-index
    # query_ball_point (ops/sampling.py; A/B in STATUS.md)
    fused_ball_query: bool = True   # see pointnet2_part_seg_msg.get_model
    stage_dtypes: str = ""

    @nn.compact
    def __call__(self, xyz, cls_label, chamfer_points=None, *,
                 train: bool = True, bn_momentum=0.1,
                 include_convex_loss: bool = False,
                 if_cuboid: bool = False,
                 include_intersect_loss: bool = False,
                 include_entropy_loss: bool = False,
                 include_pruning: bool = False,
                 quantile: float = 0.01, msc_iterations: int = 5,
                 max_num_clusters: int = 25, n_per_prim: int = 400,
                 num_bandwidth_candidates: int = 2,
                 alpha=1.0, evaluation: bool = False) -> SegOutput:
        B, N, _ = xyz.shape
        an = self.axis_name
        dt_sa, dt_fp = encoder_dtypes(self.compute_dtype)
        l0_points = xyz
        l0_xyz = xyz[..., :3]

        dt1, q1 = stage_cfg(self.stage_dtypes, "sa1", dt_sa)
        dt2, q2 = stage_cfg(self.stage_dtypes, "sa2", dt_sa)
        dt3, q3 = stage_cfg(self.stage_dtypes, "sa3", dt_sa)
        l1_xyz, l1_points = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [32, 64, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], an, dtype=dt1,
            fused=self.fused_ball_query,
            name="sa1")(l0_xyz, l0_points, train, bn_momentum)
        l1_points = maybe_quant(l1_points, q1)
        l2_xyz, l2_points = SetAbstractionMsg(
            128, [0.4, 0.8], [64, 128],
            [[128, 128, 256], [128, 196, 256]], an, dtype=dt2,
            fused=self.fused_ball_query, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        l2_points = maybe_quant(l2_points, q2)
        l3_xyz, l3_points = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            axis_name=an, dtype=dt3, name="sa3")(
                l2_xyz, l2_points, train, bn_momentum)
        l3_points = maybe_quant(l3_points, q3)

        dtf3, qf3 = stage_cfg(self.stage_dtypes, "fp3", dt_fp)
        dtf2, qf2 = stage_cfg(self.stage_dtypes, "fp2", dt_fp)
        dtf1, qf1 = stage_cfg(self.stage_dtypes, "fp1", dt_fp)
        l2_points = FeaturePropagation([256, 256], an, dtype=dtf3,
                                       name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l2_points = maybe_quant(l2_points, qf3)
        l1_points = FeaturePropagation([256, 128], an, dtype=dtf2,
                                       name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        l1_points = maybe_quant(l1_points, qf2)
        cls_onehot = jnp.broadcast_to(cls_label[:, None, :], (B, N, 16))
        skip = jnp.concatenate([cls_onehot, l0_xyz, l0_points], axis=-1)
        l0_points = FeaturePropagation([128, 128], an, dtype=dtf1,
                                       name="fp1")(
            l0_xyz, l1_xyz, skip, l1_points, train, bn_momentum)
        l0_points = maybe_quant(l0_points, qf1)

        l0_points = l0_points.astype(jnp.float32)
        feat = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(128, name="conv1")(l0_points),
            use_running_average=not train, momentum=bn_momentum))

        zero = jnp.zeros((), jnp.float32)
        total_loss, chamfer = zero, zero
        convex_out = None
        recon = None

        if include_convex_loss:
            beta_var = self.variable("selfsup_state", "beta",
                                     lambda: jnp.ones((), jnp.float32))
            beta = beta_var.value
            new_beta = jnp.where(beta > 0.001, beta * 0.99, beta)
            if not self.is_initializing() and \
                    self.is_mutable_collection("selfsup_state"):
                beta_var.value = new_beta
            beta_eff = jnp.where(beta > 0.001, new_beta, 0.0)

            feat_embed = nn.Dense(128, name="extra_conv_emb")(feat)
            if self.l2_norm:
                feat_embed = feat_embed / jnp.maximum(
                    jnp.linalg.norm(feat_embed, axis=-1, keepdims=True),
                    1e-12)
            key = self.make_rng("selfsup") if train else None
            convex_out = convex_loss(
                l0_xyz, chamfer_points, feat_embed,
                quantile=quantile, iterations=msc_iterations,
                max_num_clusters=max_num_clusters, n_per_prim=n_per_prim,
                num_bandwidth_candidates=num_bandwidth_candidates,
                include_intersect_loss=include_intersect_loss,
                include_entropy_loss=include_entropy_loss,
                include_pruning=include_pruning,
                alpha=alpha, beta=beta_eff, if_cuboid=if_cuboid,
                evaluation=evaluation, key=key)
            total_loss, chamfer = convex_out.total, convex_out.chamfer
        elif self.reconstruct:
            z = jnp.mean(feat, axis=1)
            recon = AtlasNet(axis_name=an, name="atlasnet")(
                z, train, bn_momentum)
            total_loss = chamfer_loss_dense(recon, l0_xyz)

        x = nn.Dropout(self.dropout_rate,
                       deterministic=not train or self.dropout_rate == 0,
                       name="drop1")(feat)
        x = nn.Dense(self.num_parts, name="conv2")(x)
        x = jax.nn.log_softmax(x, axis=-1)

        hidden = tuple(h.astype(jnp.float32)
                       for h in (l1_points, l2_points, l3_points))
        return SegOutput(seg_logits=x,
                         hidden=hidden,
                         feat=feat, total_loss=total_loss,
                         chamfer_loss=chamfer, convex=convex_out,
                         recon_points=recon)


def get_loss(pred, target, trans_feat=None):
    return nll_loss(pred, target)


def get_selfsup_loss(feat, target, key, margin=0.5):
    return pairwise_contrastive_loss(feat, target, key, margin)

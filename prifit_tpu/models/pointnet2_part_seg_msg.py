"""PointNet++ MSG part segmentation — the primary PRIFIT model.

Rebuilds ``models/pointnet2_part_seg_msg.py`` as a flax module: SA-MSG(512)
-> SA-MSG(128) -> SA-global(1024) -> FP3/FP2/FP1 (16-d one-hot category +
xyz skip) -> 128-d feat head -> dropout 0.5 -> part logits (log-softmax),
with the convex self-sup loss computed inside the forward pass (the
reference does this so DataParallel shards it; here it simply keeps the
whole pipeline in one jit).

Differences from the reference (intended-behavior fixes, SURVEY §2.9.1):
  - always returns the :class:`SegOutput` contract (the reference's
    8-tuple NameErrors when ``include_convex_loss=False``);
  - the stateful ``self.beta *= 0.99`` entropy decay lives in a mutable
    ``selfsup_state`` collection (explicit state, same schedule).

The ``extra_layers`` tower reproduces the reference faithfully, including
its quirks: the ``*_bn*``-named layers are 1x1 convs (not norms), and
``fp1_conv1_bn1`` is shared between the supervised and embedding towers.
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
    FQ,
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMsg,
)


class get_model(nn.Module):
    num_parts: int
    normal_channel: bool = False
    l2_norm: bool = False
    reconstruct: bool = False
    extra_layers: bool = False
    num_charts: int = 25
    num_points: int = 128
    axis_name: str | None = None
    # seg-head dropout probability (the reference's mutable ``drop1.p``;
    # trajectory-parity tests set 0.0 on both sides)
    dropout_rate: float = 0.5
    # encoder compute dtype: "auto" == "mxsr" (bf16 storage fwd+bwd with
    # stochastically-rounded cotangents — f32-grade accuracy on two data
    # families at bf16-class bandwidth; models/common.py::encoder_dtypes
    # has the evidence trail).  "f32" restores the pre-round-5 default;
    # BN stat accumulation and everything from the feat head on (seg
    # logits, embedding, convex-loss geometry) stay f32 in every mode.
    compute_dtype: str = "auto"
    # nearest-k-within-radius fused ball query (TPU-fast, documented
    # semantics deviation) vs the reference's first-k-by-index
    # query_ball_point (ops/sampling.py; A/B in STATUS.md)
    fused_ball_query: bool = True
    # per-stage dtype overrides for the bf16-instability bisection
    # (STATUS.md): "sa1:bf16,fp2:q,..." — `bf16` runs the stage's MLP
    # chain in bf16 (fwd+bwd rounding); `q` keeps the stage f32 but
    # QUANTIZES its output to bf16 (forward-value rounding with exact
    # gradients, since the cast pair is identity for autodiff); `fq`
    # reproduces the bf16 FORWARD numerics (straight-through rounding of
    # matmul inputs/outputs and BN outputs, nn/pointnet2.py::FQ) with
    # exact f32 gradients — fq-vs-bf16 isolates forward-value rounding
    # from backward/cotangent rounding.  Empty = use compute_dtype for
    # every stage.
    stage_dtypes: str = ""

    def _encoder_dtypes(self):
        """See :func:`prifit_tpu.models.common.encoder_dtypes` (the mxsr
        default is a measured decision — 2-family accuracy + speed
        parity, STATUS.md rounds 3-4)."""
        return encoder_dtypes(self.compute_dtype)

    def _stage_cfg(self, stage, default_dtype):
        return stage_cfg(self.stage_dtypes, stage, default_dtype)

    _maybe_quant = staticmethod(maybe_quant)

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
                 alpha=1.0, evaluation: bool = False,
                 embed: bool = False) -> SegOutput:
        """xyz [B, N, 3(+3)] channel-last; cls_label [B, 16] one-hot."""
        B, N, _ = xyz.shape
        an = self.axis_name
        dt_sa, dt_fp = self._encoder_dtypes()
        l0_points = xyz
        l0_xyz = xyz[..., :3]

        dt1, q1 = self._stage_cfg("sa1", dt_sa)
        dt2, q2 = self._stage_cfg("sa2", dt_sa)
        dt3, q3 = self._stage_cfg("sa3", dt_sa)

        l1_xyz, l1_points = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [32, 64, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], an, dtype=dt1,
            fused=self.fused_ball_query,
            name="sa1")(l0_xyz, l0_points, train, bn_momentum)
        l1_points = self._maybe_quant(l1_points, q1)
        l2_xyz, l2_points = SetAbstractionMsg(
            128, [0.4, 0.8], [64, 128],
            [[128, 128, 256], [128, 196, 256]], an, dtype=dt2,
            fused=self.fused_ball_query, name="sa2")(
                l1_xyz, l1_points, train, bn_momentum)
        l2_points = self._maybe_quant(l2_points, q2)
        l3_xyz, l3_points = SetAbstraction(
            None, None, None, [256, 512, 1024], group_all=True,
            axis_name=an, dtype=dt3, name="sa3")(
                l2_xyz, l2_points, train, bn_momentum)
        l3_points = self._maybe_quant(l3_points, q3)

        dtf3, qf3 = self._stage_cfg("fp3", dt_fp)
        dtf2, qf2 = self._stage_cfg("fp2", dt_fp)
        l2_points = FeaturePropagation([256, 256], an, dtype=dtf3,
                                       name="fp3")(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum)
        l2_points = self._maybe_quant(l2_points, qf3)
        l1_points = FeaturePropagation([256, 128], an, dtype=dtf2,
                                       name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train, bn_momentum)
        l1_points = self._maybe_quant(l1_points, qf2)

        cls_onehot = jnp.broadcast_to(cls_label[:, None, :], (B, N, 16))
        skip = jnp.concatenate([cls_onehot, l0_xyz, l0_points], axis=-1)

        # extra_layers: fp1 has no MLP (the dense chain below runs f32),
        # so the encoder default dtype (mxsr since round 5) does not
        # apply — only an EXPLICIT stage_dtypes override is an error
        dtf1, qf1 = self._stage_cfg(
            "fp1", None if self.extra_layers else dt_fp)
        if self.extra_layers:
            if dtf1 is not None:
                raise ValueError(
                    "stage_dtypes fp1:bf16/fq is not supported with "
                    "extra_layers (the extra fp1 dense chain runs f32); "
                    "use fp1:q or drop the override")
            l0_points_ = FeaturePropagation([], an, name="fp1")(
                l0_xyz, l1_xyz, skip, l1_points, train, bn_momentum)
            l0_points_ = l0_points_.astype(jnp.float32)
            # reference quirk: the *_bn* layers here are 1x1 convs
            fp1_conv1_bn1 = nn.Dense(128, name="fp1_conv1_bn1")
            l0_points = nn.relu(nn.Dense(128, name="fp1_conv2_bn2")(
                nn.Dense(128, name="fp1_conv2")(nn.relu(
                    fp1_conv1_bn1(nn.Dense(128, name="fp1_conv1")(
                        l0_points_))))))
            l0_points = self._maybe_quant(l0_points, qf1)
        else:
            l0_points = FeaturePropagation([128, 128], an, dtype=dtf1,
                                           name="fp1")(
                l0_xyz, l1_xyz, skip, l1_points, train, bn_momentum)
            l0_points = self._maybe_quant(l0_points, qf1)

        # everything from the head on runs f32 (seg logits, embedding,
        # convex-loss geometry)
        l0_points = l0_points.astype(jnp.float32)
        feat = nn.relu(BatchNorm(axis_name=an, name="bn1")(
            nn.Dense(128, name="conv1")(l0_points),
            use_running_average=not train, momentum=bn_momentum))

        zero = jnp.zeros((), jnp.float32)
        total_loss, chamfer = zero, zero
        convex_out = None
        feat_embed = None

        extra_conv_emb = nn.Dense(128, name="extra_conv_emb")

        def _embedding():
            """The embedding the convex loss clusters — identical for
            ``embed=True`` callers (e.g. the point-SP step, which
            clusters outside the model) so both CLI paths optimize the
            same head."""
            if self.extra_layers:
                e = nn.relu(nn.Dense(128, name="fp1_embed_conv2_bn2")(
                    nn.Dense(128, name="fp1_embed_conv2")(nn.relu(
                        fp1_conv1_bn1(nn.Dense(
                            128, name="fp1_embed_conv1")(l0_points_))))))
                e = nn.relu(BatchNorm(axis_name=an, name="conv1_embed_bn")(
                    nn.Dense(128, name="conv1_embed")(e),
                    use_running_average=not train, momentum=bn_momentum))
                e = nn.relu(BatchNorm(axis_name=an, name="conv2_embed_bn")(
                    nn.Dense(128, name="conv2_embed")(e),
                    use_running_average=not train, momentum=bn_momentum))
                return extra_conv_emb(e)
            return extra_conv_emb(feat)

        if embed and not include_convex_loss:
            feat_embed = _embedding()

        if include_convex_loss:
            # entropy-weight decay beta *= 0.99 until 0.001 (reference
            # :96-99 mutates module state inside forward)
            beta_var = self.variable("selfsup_state", "beta",
                                     lambda: jnp.ones((), jnp.float32))
            beta = beta_var.value
            new_beta = jnp.where(beta > 0.001, beta * 0.99, beta)
            if not self.is_initializing() and \
                    self.is_mutable_collection("selfsup_state"):
                beta_var.value = new_beta
            beta_eff = jnp.where(beta > 0.001, new_beta, 0.0)

            feat_embed = _embedding()

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

        recon = None
        if self.reconstruct:
            z = jnp.mean(l0_points, axis=1)
            recon = AtlasNet(128, self.num_charts, self.num_points,
                             axis_name=an, name="atlasnet")(
                                 z, train, bn_momentum)
            total_loss = total_loss + chamfer_loss_dense(recon, l0_xyz)
            chamfer = zero

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
                         recon_points=recon, embedding=feat_embed)


def get_loss(pred, target, trans_feat=None):
    """NLL over log-probs (see ``nll_loss`` for the reference
    cross-entropy-on-log-probs quirk this corrects)."""
    return nll_loss(pred, target)


def get_selfsup_loss(feat, target, key, margin=0.5):
    """ACD pairwise contrastive loss
    (``models/pointnet2_part_seg_msg.py:147-171``)."""
    return pairwise_contrastive_loss(feat, target, key, margin)

"""DGCNN embedding/segmentation model (alternative PRIFIT encoder).

Rebuilds ``src/dgcnn.py:225-267`` behind the model-registry convention
(the reference selects it with ``'dgcnn' in args.model`` and constructs
``DGCNGn(emb_size=128, nn_nb=args.dgcnn_k)``,
``train_partseg_shapenet.py:226-228``).  Exposes the same convex-loss
forward contract as the PointNet++ models so the trainer treats them
interchangeably.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.geometry.convex_loss import convex_loss
from prifit_tpu.models.common import (
    SegOutput,
    nll_loss,
    pairwise_contrastive_loss,
)
from prifit_tpu.nn.dgcnn import DGCNNGn


class get_model(nn.Module):
    num_parts: int = 3
    emb_size: int = 128
    nn_nb: int = 80
    dilation: int = 1
    normal_channel: bool = False

    @nn.compact
    def __call__(self, xyz, cls_label=None, chamfer_points=None, *,
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
        """xyz [B, N, 3(+3)]; cls_label accepted for contract parity."""
        num_channels = 6 if self.normal_channel else 3
        embedding, seg = DGCNNGn(
            self.emb_size, num_channels, self.nn_nb, self.dilation,
            num_seg=self.num_parts, name="dgcnn")(xyz, train)

        zero = jnp.zeros((), jnp.float32)
        total_loss, chamfer = zero, zero
        convex_out = None
        if include_convex_loss:
            key = self.make_rng("selfsup") if train else None
            convex_out = convex_loss(
                xyz[..., :3], chamfer_points, embedding,
                quantile=quantile, iterations=msc_iterations,
                max_num_clusters=max_num_clusters, n_per_prim=n_per_prim,
                num_bandwidth_candidates=num_bandwidth_candidates,
                include_intersect_loss=include_intersect_loss,
                include_entropy_loss=include_entropy_loss,
                include_pruning=include_pruning,
                alpha=alpha, if_cuboid=if_cuboid,
                evaluation=evaluation, key=key)
            total_loss, chamfer = convex_out.total, convex_out.chamfer

        seg_logp = jax.nn.log_softmax(seg, axis=-1)
        return SegOutput(seg_logits=seg_logp, hidden=None, feat=embedding,
                         total_loss=total_loss, chamfer_loss=chamfer,
                         convex=convex_out)


def get_loss(pred, target, trans_feat=None):
    return nll_loss(pred, target)


def get_selfsup_loss(feat, target, key, margin=0.5):
    return pairwise_contrastive_loss(feat, target, key, margin)

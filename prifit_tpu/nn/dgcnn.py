"""DGCNN edge-convolution encoder and segmentation head (flax).

Rebuilds ``src/dgcnn.py:149-267``.  Edge features are
``[x_j - x_i, x_i]`` over a (dilated) kNN graph (``src/dgcnn.py:74-107``);
the per-batch-element kNN loop of the reference is a batched matmul +
``top_k`` here (``prifit_tpu.ops.pairwise``).  GroupNorm (flax native)
replaces the reference's GroupNorm one-to-one; LeakyReLU slope 0.2.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.ops.pairwise import knn_with_dilation, knn_points_normals
from prifit_tpu.ops.sampling import gather_neighbors


def get_graph_feature(x: jax.Array, k1: int, k2: int,
                      idx: jax.Array | None = None):
    """Edge features over the kNN graph (``src/dgcnn.py:74-107``).

    Args:
        x: ``[B, N, C]`` features.
    Returns:
        (``[B, N, k1, 2C]`` edge features ``[x_j - x_i, x_i]``, idx used).
    """
    if idx is None:
        idx = knn_with_dilation(x, k1, k2)
    # HIGHEST: the edge vectors `nbrs - center` are cancellation-sensitive
    # (same reason GroupedFirstLayer keeps its gathers exact); without it
    # the TPU one-hot gather would round neighbor features to bf16.
    nbrs = gather_neighbors(x, idx,
                            precision=jax.lax.Precision.HIGHEST)
    center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
    return jnp.concatenate([nbrs - center, center], axis=-1), idx


def get_graph_feature_with_normals(x: jax.Array, k1: int, k2: int):
    """Normals-aware variant for 6-channel input (``src/dgcnn.py:110-146``)."""
    idx = knn_points_normals(x, k1, k2)
    nbrs = gather_neighbors(x, idx,
                            precision=jax.lax.Precision.HIGHEST)
    center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
    return jnp.concatenate([nbrs - center, center], axis=-1), idx


class _EdgeConv(nn.Module):
    features: int
    groups: int

    @nn.compact
    def __call__(self, edge):                     # [B, N, K, C]
        y = nn.Dense(self.features, use_bias=False)(edge)
        y = nn.GroupNorm(num_groups=self.groups)(y)
        y = nn.leaky_relu(y, negative_slope=0.2)
        return jnp.max(y, axis=2)                 # [B, N, features]


class DGCNNEncoderGn(nn.Module):
    """3 EdgeConvs + 1024-d global feature (``src/dgcnn.py:149-222``)."""
    input_channels: int = 3
    nn_nb: int = 80
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x [B, N, 3|6] -> (global [B, 1024], per-point [B, N, 256])."""
        k = self.nn_nb
        if self.input_channels == 6:
            edge, _ = get_graph_feature_with_normals(x, k, k)
            k2 = k
        else:
            edge, _ = get_graph_feature(x, k, k * self.dilation)
            k2 = k * self.dilation
        x1 = _EdgeConv(64, 2)(edge)

        edge, idx = get_graph_feature(x1, k, k2 if self.input_channels == 3
                                      else k)
        x2 = _EdgeConv(64, 2)(edge)

        edge, _ = get_graph_feature(x2, k, k, idx=idx)  # reuse graph (:190)
        x3 = _EdgeConv(128, 2)(edge)

        feats = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 256]
        y = nn.Dense(1024)(feats)
        y = nn.GroupNorm(num_groups=8)(y)
        y = nn.relu(y)
        return jnp.max(y, axis=1), feats


class DGCNNGn(nn.Module):
    """Embedding + seg head (``src/dgcnn.py:225-267``).

    Returns ``(embedding [B, N, emb_size], seg [B, N, 3])`` — channel-last
    versions of the reference's outputs.
    """
    emb_size: int = 128
    num_channels: int = 3
    nn_nb: int = 80
    dilation: int = 1
    num_seg: int = 3

    @nn.compact
    def __call__(self, points, train: bool = True):
        B, N, _ = points.shape
        g, feats = DGCNNEncoderGn(self.num_channels, self.nn_nb,
                                  self.dilation)(points, train)
        x = jnp.concatenate(
            [jnp.broadcast_to(g[:, None, :], (B, N, 1024)), feats], axis=-1)

        def block(y, f, groups):
            y = nn.Dense(f)(y)
            y = nn.GroupNorm(num_groups=groups)(y)
            return nn.relu(y)

        x = block(x, 512, 8)
        x_all = block(x, 256, 4)
        x = block(x_all, 256, 4)
        seg = nn.Dense(self.num_seg)(x)
        embedding = nn.Dense(self.emb_size, use_bias=False)(x)
        return embedding, seg

"""DGCNN edge-convolution encoder and segmentation head (flax).

Rebuilds ``src/dgcnn.py:149-267``.  Edge features are
``[x_j - x_i, x_i]`` over a (dilated) kNN graph (``src/dgcnn.py:74-107``);
the per-batch-element kNN loop of the reference is a batched matmul +
``min_k_packed`` here (``prifit_tpu.ops.pairwise``).  GroupNorm (flax
native) replaces the reference's GroupNorm one-to-one; LeakyReLU 0.2.

TPU restructure (round 4): the reference materializes the ``[B,N,K,2C]``
edge tensor and runs the conv per EDGE.  The conv is affine, so it
decomposes around the gather exactly like
``nn/pointnet2.py::GroupedFirstLayer``:

    concat(x_j - x_i, x_i) @ [W_d; W_c] = x_j @ W_d + x_i @ (W_c - W_d)

i.e. project per POINT (K-fold fewer dense MACs), gather the projected
rows, and add the center term broadcast over K — no ``[B,N,K,2C]``
concat ever exists.  When the raw width is narrower than the output
(first layer: C=3), gather the raw neighborhood instead and apply the
two skinny denses per edge (the gather is the expensive side on TPU and
scales with the gathered WIDTH).  Both orders are the same math with
the same parameters.  Precision note: the projected-neighbor minus
projected-center difference is cancellation-sensitive (same argument as
GroupedFirstLayer's docstring), so gathers are exact and the affine
part runs f32/HIGHEST.
"""

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.ops.pairwise import knn_with_dilation, knn_points_normals
from prifit_tpu.ops.sampling import gather_neighbors


def get_graph_feature(x: jax.Array, k1: int, k2: int,
                      idx: jax.Array | None = None):
    """Edge features over the kNN graph (``src/dgcnn.py:74-107``).

    Kept as the reference-layout oracle for the fused EdgeConv path
    (tests/test_models.py asserts equivalence); the encoder itself no
    longer materializes this tensor.

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
    """One edge convolution: dense -> GroupNorm -> LeakyReLU -> max_K.

    Takes the POINT features and the kNN graph; the edge tensor is
    never concatenated (module docstring).  ``PRIFIT_EDGECONV`` forces
    the gather side for A/B: ``proj`` | ``edge`` | ``auto`` (default:
    project-first unless the raw input is strictly narrower than the
    output width).
    """
    features: int
    groups: int

    @nn.compact
    def __call__(self, x, idx):                   # [B,N,C], [B,N,K]
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * C, self.features))
        w_d, w_c = kernel[:C], kernel[C:]
        prec = jax.lax.Precision.HIGHEST
        mode = os.environ.get("PRIFIT_EDGECONV", "auto")
        project_first = mode == "proj" or (mode != "edge"
                                           and C >= self.features)
        if project_first:
            # gather width = features; per-point denses
            p_nbr = jnp.matmul(x, w_d, precision=prec)
            p_ctr = jnp.matmul(x, w_c - w_d, precision=prec)
            y = gather_neighbors(p_nbr, idx, precision=prec) \
                + p_ctr[:, :, None, :]
        else:
            # gather width = C (raw); skinny per-edge denses
            nbrs = gather_neighbors(x, idx, precision=prec)
            diff = nbrs - x[:, :, None, :]
            y = jnp.matmul(diff, w_d, precision=prec) \
                + jnp.matmul(x, w_c, precision=prec)[:, :, None, :]
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
            idx = knn_points_normals(x, k, k)
        else:
            idx = knn_with_dilation(x, k, k * self.dilation)
        x1 = _EdgeConv(64, 2)(x, idx)

        idx = knn_with_dilation(x1, k, k * self.dilation
                                if self.input_channels == 3 else k)
        x2 = _EdgeConv(64, 2)(x1, idx)

        x3 = _EdgeConv(128, 2)(x2, idx)           # reuse graph (:190)

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

"""Original PointNet blocks as flax modules (channel-last).

Rebuilds ``models/pointnet.py``: the spatial/feature transformer networks
(``STN3d``/``STNkd`` unified — they differ only in k), the shared encoder,
and the orthogonality regularizer.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.nn.norm import BatchNorm


class STN(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix.

    Reference ``STN3d`` (k=3, ``models/pointnet.py:10-45``) and ``STNkd``
    (``:48-85``) — identical towers, output initialized at identity by
    adding eye(k).
    """
    k: int = 3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        """x [B, N, C] -> [B, k, k]."""
        def block(y, f):
            y = nn.Dense(f)(y)
            y = BatchNorm(axis_name=self.axis_name)(
                y, use_running_average=not train, momentum=bn_momentum)
            return nn.relu(y)

        y = block(x, 64)
        y = block(y, 128)
        y = block(y, 1024)
        y = jnp.max(y, axis=1)                    # [B, 1024]
        y = block(y, 512)
        y = block(y, 256)
        y = nn.Dense(self.k * self.k,
                     kernel_init=nn.initializers.zeros)(y)
        eye = jnp.eye(self.k, dtype=y.dtype).reshape(-1)
        return (y + eye).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """Shared PointNet encoder (``models/pointnet.py:88-132``).

    Returns ``(features, trans, trans_feat)`` where features is the
    1024-d global vector (``global_feat``) or per-point
    ``concat([global, pointfeat])`` [B, N, 1088].
    """
    global_feat: bool = True
    feature_transform: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        """x [B, N, C>=3] (xyz first, extra channels pass the STN by)."""
        B, N, D = x.shape
        trans = STN(3, self.axis_name)(x, train, bn_momentum)
        xyz = jnp.matmul(x[..., :3], trans,
                         preferred_element_type=jnp.float32)
        if D > 3:
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1)
        else:
            x = xyz

        def block(y, f, relu=True):
            y = nn.Dense(f)(y)
            y = BatchNorm(axis_name=self.axis_name)(
                y, use_running_average=not train, momentum=bn_momentum)
            return nn.relu(y) if relu else y

        x = block(x, 64)
        if self.feature_transform:
            trans_feat = STN(64, self.axis_name)(x, train, bn_momentum)
            x = jnp.matmul(x, trans_feat,
                           preferred_element_type=jnp.float32)
        else:
            trans_feat = None
        pointfeat = x
        x = block(x, 128)
        x = block(x, 1024, relu=False)
        x = jnp.max(x, axis=1)                    # [B, 1024]
        if self.global_feat:
            return x, trans, trans_feat
        g = jnp.broadcast_to(x[:, None, :], (B, N, 1024))
        return jnp.concatenate([g, pointfeat], axis=-1), trans, trans_feat


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """Orthogonality penalty ``mean ||T (T^T - I)||_F``.

    Matches ``models/pointnet.py:135-141`` exactly — including the
    reference's quirk of computing ``T @ (T^T - I)`` rather than the
    textbook ``T T^T - I`` (same zero set, different off-minimum values).
    """
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    m = jnp.matmul(trans, jnp.swapaxes(trans, 1, 2) - eye[None],
                   preferred_element_type=jnp.float32)
    return jnp.mean(jnp.linalg.norm(m.reshape(m.shape[0], -1), axis=1))

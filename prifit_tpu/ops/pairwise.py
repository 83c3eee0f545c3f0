"""Pairwise distances and k-nearest-neighbour graphs.

TPU notes: every op here is a batched matmul plus elementwise work, which is
exactly what the MXU wants.  All shapes are static and channel-last
``[B, N, C]`` (the reference is channel-first torch, ``[B, C, N]``).

Reference behavior being reproduced:
  - ``square_distance``      models/pointnet_util.py:19-40
  - ``knn`` (with dilation)  src/dgcnn.py:9-27
  - ``knn_points_normals``   src/dgcnn.py:30-71
"""

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array,
                    precision=None) -> jax.Array:
    """Pairwise squared euclidean distance.

    ``dist[b, n, m] = ||src[b, n] - dst[b, m]||^2`` via the expanded form
    ``|s|^2 + |d|^2 - 2 s.d`` so the inner product rides the MXU.

    TPU note: the default matmul precision rounds inputs to bfloat16, which
    breaks the exact cancellation ``|s|^2 + |s|^2 - 2 s.s == 0`` (the
    sum-of-squares terms are computed in f32).  Callers that compare the
    result against an absolute threshold (ball query) or invert it (3-NN
    weights) must pass ``precision=jax.lax.Precision.HIGHEST``; relative-
    order consumers (kNN graphs, argmin) can keep the fast default.

    Args:
        src: ``[..., N, C]``
        dst: ``[..., M, C]``
    Returns:
        ``[..., N, M]`` squared distances (clamped at 0 against round-off).
    """
    inner = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=jnp.float32,
                       precision=precision)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    dist = s2 - 2.0 * inner + jnp.swapaxes(d2, -1, -2)
    return jnp.maximum(dist, 0.0)


def knn(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest neighbours of each point (self included).

    Args:
        x: ``[..., N, C]`` points/features.
        k: number of neighbours (static).
    Returns:
        ``[..., N, k]`` int32 indices, nearest first.
    """
    dist = square_distance(x, x)
    _, idx = jax.lax.top_k(-dist, k)
    return idx


def knn_with_dilation(x: jax.Array, k1: int, k2: int) -> jax.Array:
    """Dilated kNN: take every ``k2 // k1``-th of the ``k2`` nearest.

    Matches ``src/dgcnn.py:9-27``: compute the ``k2`` nearest neighbours and
    keep indices ``0, step, 2*step, ...`` with ``step = k2 // k1``.
    """
    idx = knn(x, k2)
    step = k2 // k1
    sel = jnp.arange(0, k2, step)[:k1]
    return idx[..., sel]


def knn_points_normals(x: jax.Array, k1: int, k2: int) -> jax.Array:
    """Normals-aware kNN for 6-channel input ``[..., N, 6]`` (xyz+normal).

    Distance metric from ``src/dgcnn.py:30-71``:
    ``d = d_xyz * (1 + d_normal)`` where ``d_normal = 2 - 2 <n_i, n_j>``,
    which pays less attention to normals than a plain sum.
    """
    p, n = x[..., :3], x[..., 3:6]
    d_p = square_distance(p, p)
    inner_n = jnp.matmul(n, jnp.swapaxes(n, -1, -2),
                         preferred_element_type=jnp.float32)
    d_n = 2.0 - 2.0 * inner_n
    dist = d_p * (1.0 + d_n)
    _, idx = jax.lax.top_k(-dist, k2)
    step = max(k2 // k1, 1)
    sel = jnp.arange(0, k2, step)[:k1]
    return idx[..., sel]

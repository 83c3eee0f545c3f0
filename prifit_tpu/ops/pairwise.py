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


def min_k(dist: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact k smallest values (+ indices) along the last axis, ascending.

    On TPU this lowers to XLA's PartialReduce via
    ``jax.lax.approx_min_k(recall_target=1.0)`` — exact at recall 1.0 and
    measured ~7x faster than ``lax.top_k`` (1.4 ms vs 9.9 ms at the sa1
    ball-query shape [24, 512, 2048], k=128, v5e), because ``top_k`` lowers
    to a full lane sort.  Elsewhere it falls back to ``top_k``.

    Tie-breaking among exactly-equal values is unspecified on the TPU path
    (``top_k`` breaks ties by ascending index); every caller here is either
    tie-free (distinct integer keys) or tie-agnostic (distance
    neighborhoods where equal values are interchangeable).

    Args:
        dist: ``[..., N]``; k: static, <= N.
    Returns:
        ``(values [..., k], indices [..., k] int32)``, ascending by value.
    """
    if jax.default_backend() == "tpu":
        vals, idx = jax.lax.approx_min_k(dist, k, recall_target=1.0)
        return vals, idx.astype(jnp.int32)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx.astype(jnp.int32)


def min_k_packed(dist: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """min-k values AND indices at values-only cost (TPU fast path).

    ``approx_min_k`` returning indices pays a full pair-aggregation sort
    (measured 7.7 ms vs 1.8 ms values-only at [24, 512, 2048] k=128,
    v5e).  Trick: for non-negative f32, the int32 bit pattern is
    order-preserving, so quantize the low ``ceil(log2 N)`` mantissa bits
    away and pack the candidate index there — a single values-only sort
    then carries the indices along for free:

        packed_i32 = (bitcast(d) & ~mask) | index  (+ 2^23 to keep all
                     values normal: TPU comparators may flush denormals)

    Order = (d quantized to ``23 - log2 N`` mantissa bits, then index) —
    near-ties (< 2^-12 relative at N=2048) resolve by ascending index
    (top_k's rule) instead of exact distance; in-radius membership tests
    against the returned values see the same < 2.5e-4 relative rounding.
    Falls back to the exact unpacked path off-TPU or when N needs more
    than 12 index bits.

    Args:
        dist: ``[..., N]`` non-negative distances.
    Returns:
        ``(values [..., k], indices [..., k] int32)``, ascending.
    """
    N = dist.shape[-1]
    bits = max((N - 1).bit_length(), 1)
    if jax.default_backend() != "tpu" or bits > 12:
        return min_k(dist, k)
    mask = jnp.int32((1 << bits) - 1)
    exp_bump = jnp.int32(1 << 23)
    # the exponent bump would map distances >= ~2^104 (incl. +inf, e.g.
    # masked-out entries) onto inf/NaN bit patterns and corrupt the
    # ordering; clamp to a large finite value well below that ceiling
    dist = jnp.minimum(jnp.maximum(dist, 0.0), jnp.float32(1e30))
    di = jax.lax.bitcast_convert_type(dist, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    packed = ((di & ~mask) | idx) + exp_bump
    pf = jax.lax.bitcast_convert_type(packed, jnp.float32)
    vals, _ = jax.lax.approx_min_k(pf, k, recall_target=1.0)
    vi = jax.lax.bitcast_convert_type(vals, jnp.int32) - exp_bump
    out_idx = vi & mask
    out_d = jax.lax.bitcast_convert_type(vi & ~mask, jnp.float32)
    return out_d, out_idx


def knn(x: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest neighbours of each point (self included).

    Args:
        x: ``[..., N, C]`` points/features.
        k: number of neighbours (static).
    Returns:
        ``[..., N, k]`` int32 indices, nearest first.
    """
    dist = square_distance(x, x)
    _, idx = min_k_packed(dist, k)
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
    _, idx = min_k_packed(dist, k2)
    step = max(k2 // k1, 1)
    sel = jnp.arange(0, k2, step)[:k1]
    return idx[..., sel]

"""Chamfer distances, fully on-device.

The reference computes chamfer either densely (``src/utils.py:271-294``) or
through a CPU sklearn KDTree round-trip (``src/utils.py:361-381``).  Here
both sides stay on device: the N x M squared-distance matrix is processed in
source-chunks with a ``lax.map`` so the full matrix is never materialized in
HBM for large N*M (the min-reduction happens per chunk).

Weights/masks replace ragged point sets: every input has a fixed size and an
optional validity weight per point.
"""

from functools import partial

import jax
import jax.numpy as jnp

from prifit_tpu.ops.sampling import index_points_onehot

_CHUNK = 1024


def _nn_idx_chunked(src: jax.Array, dst: jax.Array,
                    dst_mask: jax.Array | None, chunk: int) -> jax.Array:
    """argmin_m ||src_n - dst_m||^2 in chunks of the src axis -> [N] i32.

    Forward-only (int output, no gradient path).  Invalid dst entries
    are pushed to a large value before the argmin; ties resolve to the
    lowest index (torch/KDTree convention).
    """
    N = src.shape[0]
    if N % chunk != 0:
        # largest divisor of N that fits the budget (e.g. the primitive
        # sample count 25*256=6400 -> 800); a prime/odd N would otherwise
        # degrade to a tiny divisor (chunk=1 => N-iteration scan of
        # [1, M] rows), so fall back to one full-size chunk instead
        best = max((c for c in range(1, chunk + 1) if N % c == 0),
                   default=1)
        chunk = best if best >= chunk // 8 else N
    n_chunks = N // chunk
    src_c = src.reshape(n_chunks, chunk, src.shape[-1])
    big = jnp.float32(1e10)

    def one(s):
        # Explicit difference form, NOT the expanded matmul
        # (square_distance): a dot's output always lands in HBM, so the
        # matmul form materialized the [chunk, M] distance matrix
        # (1.26 GB at [24, 6400, 2048]), while this broadcast chain
        # fuses INTO the argmin reduce and nothing [chunk, M] ever
        # leaves registers.  At C=3 the MXU contraction was worthless
        # anyway, and the difference form is exact in f32 (no
        # cancellation: it's the form the value recompute below uses).
        # Per-coordinate accumulation keeps every intermediate in the
        # [chunk, M] lane layout — a [chunk, M, 3] diff tensor would put
        # the size-3 axis on the 128-wide lane dimension.
        d = None
        for c in range(s.shape[-1]):
            diff = s[:, c:c + 1] - dst[None, :, c]
            d = diff * diff if d is None else d + diff * diff
        if dst_mask is not None:
            d = jnp.where(dst_mask[None, :], d, big)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    if n_chunks == 1:
        return one(src_c[0])
    return jax.lax.map(one, src_c).reshape(N)


def _min_sqdist_chunked(src: jax.Array, dst: jax.Array,
                        dst_mask: jax.Array | None, chunk: int) -> jax.Array:
    """min_m ||src_n - dst_m||^2: argmin-select, then recompute -> [N].

    The selection is a no-grad chunked argmin (nothing [N, M] survives
    the forward) and the value is recomputed exactly through the
    selected pair, so the BACKWARD is one gather + elementwise ops —
    the earlier min-reduction formulation paid ~12x its forward in the
    backward (8.5 ms on chip at [24, 6400, 2048]) rematerializing
    [chunk, M] distance/mask blocks.  Gradient semantics match the
    reference's KDTree + gather (``src/utils.py:361-381``): flow through
    the selected pair only (ties pick one neighbor, both here and
    there).  The recomputed ``sum((src - nn)^2)`` is also *more*
    accurate than the expanded-form matrix entry the min used to return.
    """
    idx = jax.lax.stop_gradient(_nn_idx_chunked(src, dst, dst_mask,
                                                chunk))
    nn = index_points_onehot(dst[None], idx[None],
                             precision=jax.lax.Precision.HIGHEST)[0]
    d = jnp.sum(jnp.square(src - nn), axis=-1)
    if dst_mask is not None:
        # all-invalid dst: the old formulation returned the big sentinel
        d = jnp.where(jnp.any(dst_mask), d, jnp.float32(1e10))
    return d


def nn_squared_distance(src: jax.Array, dst: jax.Array,
                        dst_mask: jax.Array | None = None,
                        chunk: int = _CHUNK) -> jax.Array:
    """Squared distance of each src point to its nearest dst point.

    Unbatched ``[N, 3] x [M, 3] -> [N]``; vmap for batches.  Gradients flow
    to both clouds through the selected pair (same as KDTree + gather in the
    reference: index selection is effectively stop-gradient).
    """
    return _min_sqdist_chunked(src, dst, dst_mask, chunk)


@partial(jax.jit, static_argnames=("sqrt",))
def chamfer_distance(pred: jax.Array, gt: jax.Array, sqrt: bool = False,
                     pred_mask: jax.Array | None = None,
                     gt_mask: jax.Array | None = None) -> jax.Array:
    """Symmetric chamfer distance averaged over the batch.

    Matches ``src/utils.py:271-294``: mean over points of the min squared
    distance, two sides averaged, then /2.

    Args:
        pred: ``[B, N, 3]``; gt: ``[B, M, 3]``.
        pred_mask/gt_mask: optional ``[B, N]``/``[B, M]`` validity weights.
    """
    def one(p, g, pm, gm):
        d_pg = _min_sqdist_chunked(p, g, gm, _CHUNK)        # [N]
        d_gp = _min_sqdist_chunked(g, p, pm, _CHUNK)        # [M]
        if sqrt:
            from prifit_tpu.utils.guard import guard_sqrt
            d_pg, d_gp = guard_sqrt(d_pg), guard_sqrt(d_gp)
        m_pg = _masked_mean(d_pg, pm)
        m_gp = _masked_mean(d_gp, gm)
        return m_pg + m_gp

    B = pred.shape[0]
    pm = pred_mask if pred_mask is not None else jnp.ones(pred.shape[:2])
    gm = gt_mask if gt_mask is not None else jnp.ones(gt.shape[:2])
    cds = jax.vmap(one)(pred, gt, pm.astype(bool), gm.astype(bool))
    return jnp.mean(cds) / 2.0


def chamfer_distance_one_side(pred: jax.Array, gt: jax.Array,
                              side: int = 1) -> jax.Array:
    """One-sided chamfer (reference ``src/utils.py:297-321``).

    side=0: for each gt point, distance to nearest pred (min over pred axis);
    side=1: for each pred point, distance to nearest gt.
    """
    def one(p, g):
        if side == 0:
            return jnp.mean(_min_sqdist_chunked(g, p, None, _CHUNK))
        return jnp.mean(_min_sqdist_chunked(p, g, None, _CHUNK))

    return jnp.mean(jax.vmap(one)(pred, gt))


def chamfer_distance_single_shape(pred: jax.Array, gt: jax.Array,
                                  one_side: bool = False,
                                  sqrt: bool = False,
                                  reduce: bool = True) -> jax.Array:
    """Single-shape chamfer (reference ``src/utils.py:324-358``).

    Args:
        pred: ``[N, 3]``; gt: ``[M, 3]``.
        one_side: only gt -> pred direction (min over pred axis).
    """
    d_pg = _min_sqdist_chunked(pred, gt, None, _CHUNK)     # [N]
    d_gp = _min_sqdist_chunked(gt, pred, None, _CHUNK)     # [M]
    if sqrt:
        from prifit_tpu.utils.guard import guard_sqrt
        d_pg, d_gp = guard_sqrt(d_pg), guard_sqrt(d_gp)
    if one_side:
        return jnp.mean(d_gp) if reduce else d_gp
    if reduce:
        return (jnp.mean(d_pg) + jnp.mean(d_gp)) / 2.0
    return (d_pg, d_gp)


def chamfer_distance_pairwise_batch(source: jax.Array,
                                    target: jax.Array,
                                    sqrt: bool = False) -> jax.Array:
    """Batched symmetric chamfer, mean over shapes — on-device equivalent
    of the reference's sklearn-KDTree hybrid
    (``chamfer_distance_kdtree``, ``src/utils.py:361-381``)."""
    def one(s, t):
        d_ts = _min_sqdist_chunked(t, s, None, _CHUNK)
        d_st = _min_sqdist_chunked(s, t, None, _CHUNK)
        if sqrt:
            from prifit_tpu.utils.guard import guard_sqrt
            d_ts, d_st = guard_sqrt(d_ts), guard_sqrt(d_st)
        return (jnp.mean(d_ts) + jnp.mean(d_st)) / 2.0

    return jnp.mean(jax.vmap(one)(source, target))


def _masked_mean(x: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

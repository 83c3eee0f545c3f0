"""Hardware lane-gather of point rows (Pallas ``tpu.dynamic_gather``).

Replaces the one-hot MXU gather (``ops/sampling.py::index_points_onehot``)
for the SA/FP neighborhood gathers.  The one-hot path is bound by
generating (and, at HIGHEST precision, re-generating per pass) a
``[rows, N]`` comparison tensor on the VPU; XLA's native row gather is
row-count-bound in HBM (~157 M rows/s measured).  Mosaic instead exposes
the hardware's in-register shuffle as ``tpu.dynamic_gather`` through a
restricted ``lax.gather`` pattern: a 2-D *along-axis* gather whose
indices have the same shape as the operand
(jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule).

Layout trick: to gather R arbitrary rows of an ``[N, C]`` table with
that primitive, keep the table TRANSPOSED ``[C, N]`` in VMEM and gather
along the LANE axis:

    out[c, j] = tab[c, idx[j]]      (idx broadcast over the C sublanes)

Mosaic's ``tpu.dynamic_gather`` is an in-register lane shuffle: the
SOURCE of each gather must fit in ONE vreg along the gather axis (128
f32 lanes; larger tables raise "Not implemented: Multiple source vregs
along gather dimension").  ``gather_lanes`` therefore decomposes the
N-lane table into 128-lane chunks and each 128-lane output tile into a
chunk-local shuffle + per-lane select merge:

    out_t = select(idx_t // 128 == c, shuffle(tab_c, idx_t % 128), out_t)

Per output element this is ~2(N/128) VPU ops — the same op count as the
one-hot einsum's compare generation, without the MXU pass or the HBM
round trip.  Values are bit-exact (a gather moves bits) — this is the
f32-exactness path for free, with no 3-pass HIGHEST einsum.

Reference behavior: ``models/pointnet_util.py:43-60`` (index_points).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CHUNK = 128  # one vreg of f32 lanes — the dynamic_gather source limit


def gather_lanes(tab, idx_tile, R):
    """``out[f, j] = tab[f, idx[j]]`` inside a kernel, bit-exact.

    ``tab``: ``[F, N]`` VMEM value, N a multiple of 128.
    ``idx_tile``: callable ``t -> [1, 128]`` int32 — loads lane tile
    ``t`` of the R flat indices DIRECTLY FROM ITS REF (e.g.
    ``lambda t: idx_ref[0, pl.ds(t * 128, 128)]``).  Two Mosaic
    compiler crashes (probed 2026-08, opaque tpu_compile_helper exit 1)
    force this shape: lane-slicing a loaded ``[1, R]`` int value — or a
    sublane broadcast of one — dies; a 128-lane ref load followed by
    broadcast compiles.
    ``R``: total index count, a multiple of 128.

    Each constituent ``tpu.dynamic_gather`` sees a single-source-vreg
    ``[F, 128]`` shuffle (see module docstring) and chunks of the
    N-lane table are merged with per-lane selects.
    """
    F, N = tab.shape
    tiles = []
    for t in range(R // _CHUNK):
        ix = jnp.broadcast_to(idx_tile(t), (F, _CHUNK))
        lo_t, hi_t = ix % _CHUNK, ix // _CHUNK
        acc = None
        for c in range(N // _CHUNK):
            src = tab[:, c * _CHUNK:(c + 1) * _CHUNK]
            g = jnp.take_along_axis(src, lo_t, axis=1,
                                    mode="promise_in_bounds")
            acc = g if acc is None else jnp.where(hi_t == c, g, acc)
        tiles.append(acc)
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=1)


def _gather_kernel(tab_ref, idx_ref, out_ref):
    # the grid-step row of indices arrives via the BlockSpec index_map
    # (idx laid out [B, n_chunks, 1, N] so the (1, 1, 1, N) block keeps
    # full-size last-two dims — Mosaic rejects 1-sublane blocks of a
    # larger dim, and an in-kernel dynamic pl.ds row select crashes the
    # compiler outright; see gather_lanes docstring)
    tab = tab_ref[0]                                   # [C, N]
    N = tab.shape[1]
    out_ref[0, 0] = gather_lanes(
        tab, lambda t: idx_ref[0, 0, :, pl.ds(t * 128, 128)], N)


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(points: jax.Array, idx: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """``out[b, r, :] = points[b, idx[b, r], :]`` via lane dynamic_gather.

    Args:
        points: ``[B, N, C]`` float32 table (N is the gather axis).
        idx: ``[B, R]`` int32 row indices, all in ``[0, N)``.
    Returns:
        ``[B, R, C]`` float32.
    """
    B, N, C = points.shape
    if N % _CHUNK:
        raise ValueError(
            f"gather_rows_pallas: N={N} must be a multiple of {_CHUNK} "
            f"(gather_lanes covers only full 128-lane chunks)")
    R = idx.shape[1]
    n_chunks = -(-R // N)
    Rp = n_chunks * N
    if Rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, Rp - R)))
    idx_c = idx.reshape(B, n_chunks, 1, N).astype(jnp.int32)
    tab_t = jnp.swapaxes(points, 1, 2)                 # [B, C, N]

    out = pl.pallas_call(
        _gather_kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, C, N), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, N), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, C, N), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks, C, N), points.dtype),
        interpret=interpret,
    )(tab_t, idx_c)

    out = jnp.swapaxes(out, 2, 3).reshape(B, Rp, C)
    return out[:, :R] if Rp != R else out


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_vjp(n: int, points: jax.Array, idx: jax.Array):
    return gather_rows_pallas(points, idx)


def _grv_fwd(n, points, idx):
    return gather_rows_pallas(points, idx), idx


def _grv_bwd(n, idx, g):
    from prifit_tpu.ops.sampling import scatter_accumulate
    dpoints = scatter_accumulate(n, idx, g, exact_grad=True)
    return dpoints, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_gather_rows_vjp.defvjp(_grv_fwd, _grv_bwd)


def index_points_dg(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Differentiable batched row gather on the dynamic_gather fast path.

    Forward is the Pallas lane gather (bit-exact); backward accumulates
    through the asymmetric-precision one-hot einsum (exact f32
    cotangents, see ``ops/sampling.py::_gather_bwd``).

    Args:
        points: ``[B, N, C]`` f32; idx: ``[B, ...]`` int32.
    Returns:
        ``[B, ..., C]``.
    """
    B, N, C = points.shape
    flat = idx.reshape(B, -1)
    out = _gather_rows_vjp(N, points, flat)
    return out.reshape(idx.shape + (C,))

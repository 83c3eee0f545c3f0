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
along the LANE axis in chunks of exactly N indices:

    out[c, j] = tab[c, idx[j]]      (idx broadcast over the C sublanes)

so each grid step emits an ``[C, N]`` tile of gathered values and R is
tiled in ``R / N`` steps.  Values are bit-exact (a gather moves bits) —
this is the f32-exactness path for free, with no 3-pass HIGHEST einsum.

Reference behavior: ``models/pointnet_util.py:43-60`` (index_points).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(tab_ref, idx_ref, out_ref):
    # idx block is the per-batch [n_chunks, N] slab (a (1, 1, N) block
    # would put a 1 in the second-to-last dim against an n_chunks-sized
    # array dim, which Mosaic's tiling rules reject); select this grid
    # step's chunk row dynamically.
    r = pl.program_id(1)
    tab = tab_ref[0]                                   # [C, N]
    row = idx_ref[0, pl.ds(r, 1)]                      # [1, N]
    idx = jnp.broadcast_to(row, tab.shape)             # [C, N]
    out_ref[0, 0] = jnp.take_along_axis(
        tab, idx, axis=1, mode="promise_in_bounds")


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
    R = idx.shape[1]
    n_chunks = -(-R // N)
    Rp = n_chunks * N
    if Rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, Rp - R)))
    idx_c = idx.reshape(B, n_chunks, N).astype(jnp.int32)
    tab_t = jnp.swapaxes(points, 1, 2)                 # [B, C, N]

    out = pl.pallas_call(
        _gather_kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, C, N), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, N), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, C, N), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks, C, N), points.dtype),
        interpret=interpret,
    )(tab_t, idx_c)

    out = jnp.swapaxes(out, 2, 3).reshape(B, Rp, C)
    return out[:, :R] if Rp != R else out


def _gather_bwd_scatter(n, idx, g):
    """dpoints via one-hot einsum (same transpose the one-hot fwd has)."""
    B = idx.shape[0]
    flat_idx = idx.reshape(B, -1)
    flat_g = g.reshape(B, flat_idx.shape[1], g.shape[-1])
    onehot = (flat_idx[:, :, None]
              == jnp.arange(n)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum(
        "bpn,bpc->bnc", onehot, flat_g.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT,
                   jax.lax.Precision.HIGHEST)).astype(g.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_vjp(n: int, points: jax.Array, idx: jax.Array):
    return gather_rows_pallas(points, idx)


def _grv_fwd(n, points, idx):
    return gather_rows_pallas(points, idx), idx


def _grv_bwd(n, idx, g):
    dpoints = _gather_bwd_scatter(n, idx, g)
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

"""Fused mode-NMS passes: chordal-distance tiles recomputed in VMEM.

The jnp ``nms_fixed_slots`` (clustering/mean_shift.py) materializes the
``[N, N]`` mode-distance matrix in HBM and makes three dependent passes
over it (nearest-mode assign -> member counts; neighbor argmax -> elected
representatives; masked argmin -> distinct-label count) — ~64 MB of HBM
traffic per shape at N=2048 (measured ~2.7 ms of the cluster forward at
B=24).  The passes are sequential by nature (each consumes a full [N]
reduction of the previous), but none of them needs the distance matrix
*stored*: each kernel here recomputes its distance row-tile on the MXU
(modes stay VMEM-resident) and reduces in registers, so HBM only ever
sees [N]-sized vectors.

Semantics match the jnp path exactly on TPU: the distance matmul takes
bf16 operands with f32 accumulation — precisely what the jnp
``_chordal_sqdist``'s default-precision matmul lowers to on TPU — and
arg-reductions tie to the LOWEST index like ``jnp.argmin``/``argmax``.

No gradient: NMS feeds integer ids / masks (the jnp path's outputs are
index-typed too).  Reference anchor: ``src/mean_shift.py:162-202``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _dist_tile(q_ref, x_ref):
    q = q_ref[:].astype(jnp.bfloat16)
    xb = x_ref[:].astype(jnp.bfloat16)
    sim = jnp.dot(q, xb.T, preferred_element_type=jnp.float32)
    return 2.0 - 2.0 * sim                                  # [T, N] f32


def _argmin_lanes(val, iota, big):
    """Lowest-index argmin over the lane axis; (values, [T] i32).

    ``iota``/``big`` are int32 (Mosaic's tpu.iota only produces
    integers)."""
    v = jnp.min(val, axis=1, keepdims=True)                 # [T, 1]
    idx = jnp.min(jnp.where(val == v, iota, big), axis=1)
    return v[:, 0], idx.astype(jnp.int32)


def _counts_kernel(m_ref, x_ref, cnt_ref):
    i = pl.program_id(0)
    N = x_ref.shape[0]
    dist = _dist_tile(m_ref, x_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    _, assign = _argmin_lanes(dist, iota, jnp.int32(N))

    @pl.when(i == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    onehot = assign[:, None] == iota                        # [T, N]
    cnt_ref[:] += jnp.sum(onehot.astype(jnp.float32), axis=0,
                          keepdims=True)


def _rep_kernel(m_ref, x_ref, cnt_ref, occ_ref, bw_ref, isc_ref):
    """is_center[j] |= any_i occupied_i & (rep_i == j)."""
    i = pl.program_id(0)
    dist = _dist_tile(m_ref, x_ref)
    N = x_ref.shape[0]
    counts = cnt_ref[:]                                     # [1, N]
    bw = bw_ref[0, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    # rep_i = argmax_j (dist_ij < bw) * counts_j; elementwise product of
    # a 0/1 mask with integer-valued f32 counts is exact
    score = jnp.where(dist < bw, counts, 0.0)               # [T, N]
    smax = jnp.max(score, axis=1, keepdims=True)
    rep = jnp.min(jnp.where(score == smax, iota, jnp.int32(N)),
                  axis=1).astype(jnp.int32)                 # [T]

    @pl.when(i == 0)
    def _():
        isc_ref[:] = jnp.zeros_like(isc_ref)

    occ = occ_ref[:]                                        # [T, 1] f32
    hit = (rep[:, None] == iota).astype(jnp.float32) * occ  # [T, N]
    isc_ref[:] += jnp.sum(hit, axis=0, keepdims=True)


def _used_kernel(m_ref, x_ref, isc_ref, used_ref):
    """used[j] |= any_i (argmin over center-masked dist == j)."""
    i = pl.program_id(0)
    dist = _dist_tile(m_ref, x_ref)
    N = x_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    is_c = isc_ref[:] > 0.0                                 # [1, N]
    masked = jnp.where(is_c, dist, jnp.float32(jnp.inf))
    _, label = _argmin_lanes(masked, iota, jnp.int32(N))

    @pl.when(i == 0)
    def _():
        used_ref[:] = jnp.zeros_like(used_ref)

    hit = label[:, None] == iota
    used_ref[:] += jnp.sum(hit.astype(jnp.float32), axis=0,
                           keepdims=True)


def _call(kernel, modes, extra_inputs, extra_specs, interpret):
    N, D = modes.shape
    T = min(_ROW_TILE, N)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + extra_specs,
            out_specs=pl.BlockSpec((1, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        interpret=interpret,
    )(modes, modes, *extra_inputs)


def nms_passes_pallas(modes: jax.Array, bandwidth: jax.Array,
                      interpret: bool = False):
    """The three distance-dependent NMS reductions, fused.

    Args:
        modes: ``[N, D]`` converged (unit-norm) modes.
        bandwidth: scalar; neighbor threshold compares squared chordal
            distance against the UNSQUARED bandwidth (reference quirk,
            ``src/mean_shift.py:191`` — preserved by the jnp path too).
    Returns:
        (counts ``[N]`` f32, is_center ``[N]`` bool, used ``[N]`` bool).
    """
    N, D = modes.shape
    T = min(_ROW_TILE, N)
    lane = lambda: pl.BlockSpec((1, N), lambda i: (0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    counts = _call(_counts_kernel, modes, (), [], interpret)  # [1, N]
    occ_col = (counts[0] > 0.0).astype(jnp.float32).reshape(N, 1)
    is_center = _call(
        _rep_kernel, modes,
        (counts, occ_col, bandwidth.reshape(1, 1)),
        [lane(),
         pl.BlockSpec((T, 1), lambda i: (i, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 1), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)],
        interpret)
    used = _call(_used_kernel, modes, (is_center,), [lane()], interpret)
    return counts[0], is_center[0] > 0.0, used[0] > 0.0


def supports_nms_pallas(N: int, D: int) -> bool:
    T = min(_ROW_TILE, N)
    return D % 128 == 0 and N % T == 0 and 256 <= N <= 4096

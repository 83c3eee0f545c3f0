"""Fused mean-shift update step as flash-attention-style Pallas kernels.

One mean-shift iteration computes ``m_i = sum_j K_ij x_j / sum_j K_ij``
with ``K = exp((<q_i, x_j> - 1) / b^2)`` (Gaussian kernel on squared
chordal distance; reference ``src/mean_shift.py:50-84``).  The jnp version
materializes the ``[N, N]`` kernel matrix in HBM in the forward and
several more ``[N, N]`` intermediates in the backward.

Forward: stream column tiles of X through VMEM, accumulate ``K @ X`` and
the row sums on-core.  No max-subtraction pass is needed: unit vectors
give ``sim <= 1`` so the exponent is bounded above by 0 (the reference's
``guard_exp`` lower clamp at -13 is reproduced, including its gradient
cutoff).

Backward (custom VJP): with residuals ``(q, X, b^2, m, s)`` and cotangent
``g``,

    dK_ij = (g_i . x_j - g_i . m_i) / s_i
    t_ij  = K_ij dK_ij / b^2            (0 where the exponent clamped)
    dq_i  = sum_j t_ij x_j
    dx_j  = sum_i t_ij q_i + sum_i (K_ij / s_i) g_i

computed in two tiled passes that recompute K on the fly — the classic
flash-attention backward structure; nothing [N, N] ever touches HBM.
``b^2`` gets a zero cotangent (the reference computes the bandwidth under
``torch.no_grad``).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sweep on v5e at [24 x 2048 x 128], 5-iter fwd+bwd scan:
# (512,1024) 1.84 ms/iter, (256,2048) 1.59, (128,2048) 1.48,
# (256,1024) 1.26 <- picked; >=512-row tiles with 2048 cols fail to
# compile (VMEM)
_ROW_TILE = 256
_COL_TILE = 1024
_CLAMP_LO = -13.0
_CLAMP_HI = 75.0  # guard_exp clips both sides (src/guard.py)


def _fwd_kernel(bw2_ref, q_ref, x_ref, out_ref, s_out_ref, acc_ref, s_ref,
                *, col_tile):
    # q_ref: [T, D]; x_ref: [N, D] (full); out_ref: [T, D]; s_out: [T, 1]
    N = x_ref.shape[0]
    # bf16 matmul operands with f32 accumulation: bit-identical on TPU
    # (the MXU consumes bf16 at default precision regardless) and ~1.7x
    # faster by skipping the f32 operand handling
    q = q_ref[:].astype(jnp.bfloat16)
    inv_bw2 = 1.0 / bw2_ref[0, 0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    s_ref[:] = jnp.zeros_like(s_ref)

    def body(c, _):
        xc = x_ref[pl.ds(c * col_tile, col_tile), :]        # [C, D]
        xb = xc.astype(jnp.bfloat16)
        sim = jnp.dot(q, xb.T, preferred_element_type=jnp.float32)
        expo = jnp.clip((sim - 1.0) * inv_bw2, _CLAMP_LO, _CLAMP_HI)
        K = jnp.exp(expo)                                   # [T, C]
        acc_ref[:] += jnp.dot(K.astype(jnp.bfloat16), xb,
                              preferred_element_type=jnp.float32)
        s_ref[:] += jnp.sum(K, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, N // col_tile, body, 0)
    out_ref[:] = acc_ref[:] / s_ref[:]
    s_out_ref[:] = s_ref[:]


def _bwd_kernel(bw2_ref, q_ref, g_ref, c_ref, s_ref, x_ref,
                dq_ref, dx_ref, acc_ref, *, col_tile):
    """dq AND dX in one pass over the row tiles, 3 MXU calls per tile.

    ``sim = q x^T`` and ``gX = g x^T`` share one ``[2T, D] x [D, C]``
    call (rows stacked), and the dX contraction ``t^T q + (K/s)^T g`` is
    one ``[C, 2T] x [2T, D]`` call (columns stacked) — same MACs as the
    naive 5-call form but fewer/larger MXU dispatches, so the VPU
    epilogue (exp/clip/select) overlaps fewer pipeline flushes (A/B'd
    on-chip: 15.8 vs 16.7 ms for the 10-iteration fwd+grad chain; the
    5-call variant is deleted).  The kernel is VPU-bound, so the row
    statistics ``1/s_i`` (and ``c_i/s_i``, with ``1/bw^2`` folded in)
    are hoisted out of the column loop: per [T, C] tile the former two
    divisions become multiplies.  dX lives in a revisited [N, D] f32
    output block (1 MB at the flagship shape) accumulated across the
    sequential grid.
    """
    i = pl.program_id(0)
    N = x_ref.shape[0]
    T = q_ref.shape[0]
    qg = jnp.concatenate([q_ref[:], g_ref[:]], axis=0).astype(jnp.bfloat16)
    inv_bw2 = 1.0 / bw2_ref[0, 0]
    rs = 1.0 / s_ref[:]                                     # [T, 1]
    rs2 = rs * inv_bw2
    cs2 = c_ref[:] * rs2                                    # [T, 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    def body(c, _):
        xc = x_ref[pl.ds(c * col_tile, col_tile), :]        # [C, D]
        xb = xc.astype(jnp.bfloat16)
        sim_gx = jnp.dot(qg, xb.T, preferred_element_type=jnp.float32)
        sim, gX = sim_gx[:T], sim_gx[T:]                    # [T, C] each
        expo = (sim - 1.0) * inv_bw2
        K = jnp.exp(jnp.clip(expo, _CLAMP_LO, _CLAMP_HI))
        # t = K * (gX - c) / (s * bw^2), zeroed where the exponent
        # clamped (guard_exp's gradient cutoff)
        t = jnp.where((expo > _CLAMP_LO) & (expo < _CLAMP_HI),
                      K * (gX * rs2 - cs2), 0.0)
        tb = t.astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(tb, xb,
                              preferred_element_type=jnp.float32)
        tk = jnp.concatenate([tb, (K * rs).astype(jnp.bfloat16)],
                             axis=0)                        # [2T, C]
        dx_ref[pl.ds(c * col_tile, col_tile), :] += jax.lax.dot_general(
            tk, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, N // col_tile, body, 0)
    dq_ref[:] = acc_ref[:]


def _tiles(N):
    return min(_ROW_TILE, N), min(_COL_TILE, N)


def _pallas_fwd(q, X, bw2, interpret=False):
    N, D = X.shape
    T, C = _tiles(N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((T, D), jnp.float32),
                        pltpu.VMEM((T, 1), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, col_tile=C),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N, D), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * N * D, bytes_accessed=3 * N * D * 4,
            transcendentals=N * N),
    )(bw2.reshape(1, 1), q, X)


def _pallas_bwd(q, X, bw2, m, s, g, interpret=False):
    N, D = X.shape
    T, C = _tiles(N)
    cvec = jnp.sum(g * m, axis=1, keepdims=True)            # [N, 1]
    bw2r = bw2.reshape(1, 1)

    dq, dX = pl.pallas_call(
        functools.partial(_bwd_kernel, col_tile=C),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((T, D), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((N, D), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((T, D), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct((N, D), jnp.float32),
                   jax.ShapeDtypeStruct((N, D), jnp.float32)),
        interpret=interpret,
    )(bw2r, q, g, cvec, s, X)

    return dq, dX


def _ref_step(q, X, bw2):
    """jnp reference of the same update (fallback + oracle for tests)."""
    sim = jnp.matmul(q, X.T, preferred_element_type=jnp.float32)
    expo = jnp.clip((sim - 1.0) / bw2, _CLAMP_LO, _CLAMP_HI)
    K = jnp.exp(expo)
    s = jnp.sum(K, axis=1, keepdims=True)
    return jnp.matmul(K, X, preferred_element_type=jnp.float32) / s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mean_shift_step_pallas(q, X, bw2, interpret=False):
    """One fused mean-shift update: ``[N, D] -> [N, D]`` (unnormalized).

    ``bw2`` is the squared bandwidth (scalar; no-grad in the reference —
    it comes from a ``torch.no_grad`` quantile pass).
    """
    m, _ = _pallas_fwd(q, X, bw2, interpret)
    return m


def _fwd(q, X, bw2, interpret):
    m, s = _pallas_fwd(q, X, bw2, interpret)
    return m, (q, X, bw2, m, s)


def _bwd(interpret, res, g):
    q, X, bw2, m, s = res
    dq, dX = _pallas_bwd(q, X, bw2, m, s, g, interpret)
    return dq, dX, jnp.zeros_like(bw2)


mean_shift_step_pallas.defvjp(_fwd, _bwd)


def supports_pallas(N: int, D: int) -> bool:
    """Shape-alignment gate for the fused kernels.

    The upper bound keeps the full-array VMEM residents (X forward;
    q + g in the dX backward) within the ~16 MB v5e budget.
    """
    T, C = _tiles(N)
    return D % 128 == 0 and N % T == 0 and N % C == 0 \
        and 256 <= N <= 4096

"""Fused mean-shift update step as a flash-attention-style Pallas kernel.

One mean-shift iteration computes ``m_i = sum_j K_ij x_j / sum_j K_ij``
with ``K = exp((<q_i, x_j> - 1) / b^2)`` (Gaussian kernel on squared
chordal distance; reference ``src/mean_shift.py:50-84``).  The jnp version
materializes the ``[N, N]`` kernel matrix in HBM twice per iteration
(write after the first matmul, read by the second) — at N=2048, B=24,
10 iterations and 2 bandwidth candidates that is ~15 GB of HBM traffic
per forward, which dominates the pipeline.

This kernel streams column tiles of X through VMEM and accumulates
``K @ X`` and the row sums on-core, exactly like a flash-attention inner
loop.  No max-subtraction pass is needed: unit vectors give ``sim <= 1``
so the exponent is bounded above by 0 (the reference's ``guard_exp``
lower clamp at -13 is reproduced).

Differentiability: the op carries a ``custom_vjp`` whose backward
re-derives the step with jnp (one extra recompute; the backward still
materializes per-tile kernels but runs only under ``jax.grad``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 512
_COL_TILE = 1024


def _ms_kernel(bw2_ref, q_ref, x_ref, out_ref, acc_ref, s_ref, *, col_tile):
    # q_ref: [T, D]; x_ref: [N, D] (full); out_ref: [T, D]
    N = x_ref.shape[0]
    q = q_ref[:]
    inv_bw2 = 1.0 / bw2_ref[0, 0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    s_ref[:] = jnp.zeros_like(s_ref)

    def body(c, _):
        xc = x_ref[pl.ds(c * col_tile, col_tile), :]        # [C, D]
        sim = jnp.dot(q, xc.T, preferred_element_type=jnp.float32)
        expo = jnp.maximum((sim - 1.0) * inv_bw2, -13.0)    # guard_exp
        K = jnp.exp(expo)                                   # [T, C]
        acc_ref[:] += jnp.dot(K, xc, preferred_element_type=jnp.float32)
        s_ref[:] += jnp.sum(K, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, N // col_tile, body, 0)
    out_ref[:] = acc_ref[:] / s_ref[:]


def _pallas_step(q, X, bw2, interpret=False):
    N, D = X.shape
    T = min(_ROW_TILE, N)
    C = min(_COL_TILE, N)
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
        out_specs=pl.BlockSpec((T, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, D), jnp.float32),
                        pltpu.VMEM((T, 1), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_ms_kernel, col_tile=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * N * D, bytes_accessed=3 * N * D * 4,
            transcendentals=N * N),
    )(bw2.reshape(1, 1), q, X)


def _ref_step(q, X, bw2):
    """jnp reference of the same update (used for backward + fallback)."""
    sim = jnp.matmul(q, X.T, preferred_element_type=jnp.float32)
    expo = jnp.maximum((sim - 1.0) / bw2, -13.0)
    K = jnp.exp(expo)
    s = jnp.sum(K, axis=1, keepdims=True)
    return jnp.matmul(K, X, preferred_element_type=jnp.float32) / s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mean_shift_step_pallas(q, X, bw2, interpret=False):
    """One fused mean-shift update: ``[N, D] -> [N, D]`` (unnormalized).

    ``bw2`` is the squared bandwidth (scalar; no-grad in the reference —
    it comes from a ``torch.no_grad`` quantile pass).
    """
    return _pallas_step(q, X, bw2, interpret)


def _fwd(q, X, bw2, interpret):
    return _pallas_step(q, X, bw2, interpret), (q, X, bw2)


def _bwd(interpret, res, g):
    q, X, bw2 = res
    _, vjp = jax.vjp(_ref_step, q, X, bw2)
    dq, dX, _ = vjp(g)
    return dq, dX, jnp.zeros_like(bw2)


mean_shift_step_pallas.defvjp(_fwd, _bwd)


def supports_pallas(N: int, D: int) -> bool:
    """Shape-alignment gate for the fused kernel."""
    T = min(_ROW_TILE, N)
    C = min(_COL_TILE, N)
    return D % 128 == 0 and N % T == 0 and N % C == 0 and N >= 256

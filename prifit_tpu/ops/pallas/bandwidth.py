"""Fused kth-NN bandwidth kernel: distance matmul + in-VMEM bisection.

The jnp bisection (``clustering/mean_shift._kth_smallest_bisect``) reads
the [N, N] distance matrix from HBM once per counting pass (24 passes x
16 MB x batch ~ 9 GB at the bench shapes).  This kernel computes each
distance row-tile once on the MXU and runs the whole bisection while the
tile sits in VMEM — one HBM read of X per row tile instead of 24 reads of
the distance matrix.

No gradient: the reference computes the bandwidth under ``torch.no_grad``
(``src/mean_shift.py:29-31``), and callers wrap in stop_gradient anyway.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sweep on v5e at [24 x 2048 x 128], Ks=(102, 204): T=256 3.65 ms,
# T=512 3.09 <- picked, T=1024 4.14, T=2048 8.53
_ROW_TILE = 512
_ITERS = 24


def _bw_kernel(q_ref, x_ref, out_ref, *, Ks):
    # q_ref: [T, D] row tile; x_ref: [N, D]; out_ref: [T, C] kth values
    # bf16 matmul operands: matches what the jnp fallback's
    # default-precision matmul does on TPU anyway (an f32 matmul in
    # Mosaic is multi-pass and was ~1 ms of the 2 ms kernel)
    q = q_ref[:].astype(jnp.bfloat16)
    xb = x_ref[:].astype(jnp.bfloat16)
    sim = jnp.dot(q, xb.T, preferred_element_type=jnp.float32)
    dist = 2.0 - 2.0 * sim                                  # [T, N]
    T = dist.shape[0]
    # counting stays on the VPU: an MXU dot-with-ones count was tried
    # and measured 2x SLOWER (a [T, N] x [N, 1] matvec per bisect pass
    # uses 1/128 of the MXU output lanes)

    for c, K in enumerate(Ks):
        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) / 2.0
            cnt = jnp.sum((dist <= mid).astype(jnp.float32), axis=1,
                          keepdims=True)
            ge = cnt >= K
            return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

        lo = jnp.zeros((T, 1), jnp.float32)
        hi = jnp.full((T, 1), 4.0, jnp.float32)
        lo, hi = jax.lax.fori_loop(0, _ITERS, body, (lo, hi))
        out_ref[:, c:c + 1] = hi


@functools.partial(jax.jit, static_argnames=("Ks", "interpret"))
def kth_nn_distance_pallas(X: jax.Array, Ks: tuple,
                           interpret: bool = False) -> jax.Array:
    """Per-row K-th smallest squared chordal distance for several ranks.

    Args:
        X: ``[N, D]`` unit-norm embeddings.
        Ks: static tuple of C ranks.
    Returns:
        ``[C, N]`` kth values (matches ``_kth_smallest_bisect``).
    """
    N, D = X.shape
    T = min(_ROW_TILE, N)
    out = pl.pallas_call(
        functools.partial(_bw_kernel, Ks=tuple(Ks)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // T,),
            in_specs=[
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, len(Ks)), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, len(Ks)), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * N * D + _ITERS * len(Ks) * N * N,
            bytes_accessed=2 * N * D * 4, transcendentals=0),
    )(X, X)
    return out.T


def supports_bandwidth_pallas(N: int, D: int) -> bool:
    T = min(_ROW_TILE, N)
    return D % 128 == 0 and N % T == 0 and 256 <= N <= 4096

"""Differentiable least squares with automatic ridge fallback.

Rebuilds ``LeastSquares.lstsq`` + ``best_lambda``
(``src/fitting_utils.py:13-64``): QR solve when A has full column rank,
otherwise regularized normal equations with the smallest lambda from
{1e-6 * 10^k, k < 7} that makes ``A^T A + lambda I`` invertible.

TPU translation: the data-dependent rank checks and recursion become a
no-grad rank estimate + ``lax.cond`` between two static branches, and the
lambda search evaluates all 7 candidates at once and selects.
"""

import jax
import jax.numpy as jnp

_RANK_RTOL = 1e-6


def _rank(A: jax.Array) -> jax.Array:
    """No-grad numerical rank (torch.matrix_rank semantics)."""
    s = jax.lax.stop_gradient(jnp.linalg.svd(A, compute_uv=False))
    tol = jnp.max(s) * max(A.shape) * _RANK_RTOL
    return jnp.sum(s > tol)


def best_lambda(A: jax.Array) -> jax.Array:
    """Smallest {1e-6 * 10^k} making A + lambda I full rank
    (``fitting_utils.py:41-64``), all candidates evaluated in parallel."""
    n = A.shape[0]
    lambs = 1e-6 * (10.0 ** jnp.arange(7, dtype=jnp.float32))

    def ok(lamb):
        return _rank(A + lamb * jnp.eye(n)) == n

    oks = jax.vmap(ok)(lambs)
    idx = jnp.argmax(oks)                       # first True
    return jnp.where(jnp.any(oks), lambs[idx], lambs[-1])


def lstsq(A: jax.Array, Y: jax.Array, lamb: float = 0.0) -> jax.Array:
    """Solve ``min ||A x - Y||`` differentiably.

    Args:
        A: ``[m, n]`` (assumed m >= n); Y: ``[m]`` or ``[m, k]``.
        lamb: explicit ridge weight for the fallback branch (the reference
            recurses once with lamb=1; the normal-equation branch here
            already regularizes, making the recursion a no-op).
    """
    n = A.shape[1]
    full_rank = _rank(A) == n

    def qr_solve(_):
        q, r = jnp.linalg.qr(A)
        return jnp.linalg.inv(r) @ (q.T @ Y)

    def ridge_solve(_):
        AtA = A.T @ A
        l = jnp.maximum(best_lambda(jax.lax.stop_gradient(AtA)), lamb)
        return jnp.linalg.solve(AtA + l * jnp.eye(n), A.T @ Y)

    return jax.lax.cond(full_rank, qr_solve, ridge_solve, None)

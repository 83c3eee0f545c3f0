"""Weighted ellipsoid fitting with a guarded differentiable 3x3 eigh.

TPU-native rebuild of the reference fitting stack
(``src/ellipsoid_fitting.py:19-141``, ``src/fitting_utils.py:67-139``):

- The reference loops over shapes and clusters in Python and drops
  ill-conditioned clusters from a ragged list.  Here every cluster is a
  fixed slot: ``vmap`` over the K slot axis and again over the batch, and
  "dropped" becomes ``valid=False`` in the returned mask (the loss zeroes
  masked slots instead of skipping them).
- The reference decomposes the 3x3 weighted covariance with ``torch.svd``
  plus a custom backward that guards degenerate singular values and assumes
  dU = 0 (``src/fitting_utils.py:108-139``).  The covariance is symmetric
  PSD, so the natural TPU decomposition is ``jnp.linalg.eigh`` — we wrap it
  in :func:`eigh3_guarded`, a custom VJP with the same +-1e-6
  sign-preserving guard on eigenvalue gaps.  For a symmetric input the eigh
  pullback is the exact gradient (the reference's dU = 0 assumption is an
  approximation of it), and eigh on 3x3 matrices is robust enough that the
  reference's random-noise convergence patch (``ellipsoid_fitting.py:38``)
  is unnecessary.
- The condition-number rejection (S0/S2 > 1e5 => drop,
  ``ellipsoid_fitting.py:41-47``) becomes part of the validity mask.
- ``principal_axis_ellipsoid`` "slow" mode (``ellipsoid_fitting.py:119-141``)
  is reproduced exactly: reflection fix by flipping the third eigencolumn
  when det(V) < 0, then axis length = (max - min)/2 of the weight-scaled
  points expressed in the V basis.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PrimitiveParams(NamedTuple):
    """Fixed-slot primitive parameters for one shape (or a batch).

    Replaces the reference's ragged ``list(B) of list(K_b) of
    (r[3], V[3,3], center[3])`` with dense arrays plus a validity mask.
    """
    r: jax.Array        # [..., K, 3] principal-axis half-lengths
    V: jax.Array        # [..., K, 3, 3] principal axes (columns)
    center: jax.Array   # [..., K, 3]
    valid: jax.Array    # [..., K] bool


_GAP_EPS = 1e-6        # reference's eigen-gap guard (fitting_utils.py:90-97)
_COND_MAX = 1e5        # reference's condition-number cutoff (:43)
_WSUM_EPS = 1e-6       # minimum total weight for a slot to count


@jax.custom_vjp
def eigh3_guarded(A: jax.Array):
    """Eigendecomposition of a symmetric 3x3 matrix, descending eigenvalues.

    Forward is ``jnp.linalg.eigh``; backward is the symmetric-eigh pullback
    with the eigenvalue-gap denominators guarded by a sign-preserving
    ``max(|gap|, 1e-6)`` exactly like the reference's ``svd_grad_K``
    (``src/fitting_utils.py:82-105``) so repeated eigenvalues produce large
    but finite gradients instead of inf.

    Returns:
        s: ``[3]`` eigenvalues, descending (matches torch.svd order).
        V: ``[3, 3]`` eigenvectors as columns, ``A = V diag(s) V^T``.
    """
    s, V = _eigh3_fwd_impl(A)
    return s, V


def _eigh3_fwd_impl(A):
    w, v = jnp.linalg.eigh(A)          # ascending
    return w[::-1], v[:, ::-1]


def _eigh3_fwd(A):
    s, V = _eigh3_fwd_impl(A)
    return (s, V), (s, V)


def _eigh3_bwd(res, cotangents):
    s, V = res
    gs, gV = cotangents
    # F_ij = 1 / (s_j - s_i) off-diagonal, guarded; 0 on the diagonal.
    diff = s[None, :] - s[:, None]
    guarded = jnp.sign(diff) * jnp.maximum(jnp.abs(diff), _GAP_EPS)
    guarded = jnp.where(jnp.abs(diff) < _GAP_EPS,
                        jnp.where(diff < 0, -_GAP_EPS, _GAP_EPS), guarded)
    F = jnp.where(jnp.eye(3, dtype=bool), 0.0, 1.0 / guarded)
    VtgV = jnp.matmul(V.T, gV, preferred_element_type=jnp.float32)
    inner = F * VtgV
    inner = (inner + inner.T) / 2.0    # symmetrize (input is symmetric)
    gA = jnp.matmul(jnp.matmul(V, inner + jnp.diag(gs),
                               preferred_element_type=jnp.float32), V.T,
                    preferred_element_type=jnp.float32)
    # project onto symmetric matrices (cotangent of a symmetric input)
    gA = (gA + gA.T) / 2.0
    return (gA,)


eigh3_guarded.defvjp(_eigh3_fwd, _eigh3_bwd)


def _fix_reflection(V: jax.Array) -> jax.Array:
    """Flip the third eigencolumn if V is a reflection.

    Reference ``src/ellipsoid_fitting.py:133-135`` (det(V^T) == det(V)).
    """
    flip = jnp.where(jnp.linalg.det(V) < 0, -1.0, 1.0)
    return V.at[:, 2].multiply(flip)


def fit_ellipsoid_weighted(points: jax.Array, weights: jax.Array):
    """Weighted ellipsoid fit of one cluster (one weight column).

    Reference ``weighted_ellipsoid_fitting`` + ``principal_axis_ellipsoid``
    slow mode (``src/ellipsoid_fitting.py:19-49,119-141``):

      center = sum(w p) / sum(w)
      cov    = (w (p - center))^T (p - center) / sum(w)        [3, 3]
      s, V   = eigh(cov)  (descending; cond = s0/s2 must be <= 1e5)
      V      = reflection-fixed V
      axis   = (max - min)/2 over ((p - center) * w) @ V

    Args:
        points: ``[N, 3]``.
        weights: ``[N]`` soft membership of each point in this cluster.
    Returns:
        ``(r [3], V [3,3], center [3], valid [])`` — valid combines the
        minimum-weight and condition-number checks.
    """
    w = weights[:, None]
    sum_w = jnp.sum(weights)
    safe_sum = jnp.maximum(sum_w, _WSUM_EPS)
    center = jnp.sum(points * w, axis=0) / safe_sum
    centered = points - center
    cov = jnp.matmul((centered * w).T, centered,
                     preferred_element_type=jnp.float32) / safe_sum

    s, V = eigh3_guarded(cov)
    # condition check is no-grad in the reference (torch.no_grad pre-pass)
    s_ng = jax.lax.stop_gradient(s)
    cond_ok = s_ng[0] / jnp.maximum(s_ng[2], 1e-30) <= _COND_MAX
    valid = cond_ok & (sum_w > _WSUM_EPS)

    V = _fix_reflection(V)
    transformed = jnp.matmul(centered * w, V,
                             preferred_element_type=jnp.float32)
    r = (jnp.max(transformed, axis=0) - jnp.min(transformed, axis=0)) / 2.0
    return r, V, center, valid


def fit_ellipsoids(points: jax.Array, weights: jax.Array,
                   slot_valid: jax.Array | None = None) -> PrimitiveParams:
    """Fit one primitive per cluster slot of one shape.

    Reference ``weighted_ellipsoids_fitting`` (``ellipsoid_fitting.py:74-102``)
    — the per-cluster Python loop becomes ``vmap`` over the K axis.

    Args:
        points: ``[N, 3]``.
        weights: ``[N, K]`` per-slot soft membership.
        slot_valid: ``[K]`` bool from clustering (invalid slots stay invalid).
    Returns:
        :class:`PrimitiveParams` with K slots.
    """
    r, V, center, fit_valid = jax.vmap(
        fit_ellipsoid_weighted, in_axes=(None, 1))(points, weights)
    valid = fit_valid if slot_valid is None else fit_valid & slot_valid
    # zero masked slots so downstream consumers never see garbage params
    m = valid[:, None]
    return PrimitiveParams(
        r=jnp.where(m, r, 1.0),           # unit radii keep SDFs finite
        V=jnp.where(m[..., None], V, jnp.eye(3)[None]),
        center=jnp.where(m, center, 0.0),
        valid=valid,
    )


def fit_ellipsoids_batch(points: jax.Array, weights: jax.Array,
                         slot_valid: jax.Array | None = None
                         ) -> PrimitiveParams:
    """vmap of :func:`fit_ellipsoids` over the batch.

    Reference ``weighted_ellipsoid_fitting_batch``
    (``ellipsoid_fitting.py:104-117``).

    Args:
        points: ``[B, N, 3]``; weights: ``[B, N, K]``;
        slot_valid: ``[B, K]`` or None.
    """
    if slot_valid is None:
        return jax.vmap(lambda p, w: fit_ellipsoids(p, w))(points, weights)
    return jax.vmap(fit_ellipsoids)(points, weights, slot_valid)

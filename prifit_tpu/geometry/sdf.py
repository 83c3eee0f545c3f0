"""Signed distance functions of fitted primitives, batched over slots.

Formulas match the reference exactly:
  - ellipsoid approximate SDF ``k0 (k0 - 1) / k1``   convex_loss.py:313-328
  - cuboid exact SDF                                  convex_loss.py:473-487

Points are transformed into the primitive frame by ``(p - center) @ V``
(the reference computes ``(V^T (p - c)^T)^T`` which is the same thing).
All functions broadcast over a fixed slot axis K with a validity mask
handled by the callers.
"""

import jax
import jax.numpy as jnp


def _to_local(points: jax.Array, center: jax.Array,
              V: jax.Array) -> jax.Array:
    """World -> primitive frame: ``(p - center) @ V``.

    points [..., N, 3], center [..., 3], V [..., 3, 3] -> [..., N, 3]
    """
    return jnp.matmul(points - center[..., None, :], V,
                      preferred_element_type=jnp.float32)


def sdf_ellipsoid(points: jax.Array, r: jax.Array, V: jax.Array,
                  center: jax.Array) -> jax.Array:
    """Approximate ellipsoid SDF (reference ``convex_loss.py:313-328``).

    ``k0 = |p / r|, k1 = |p / r^2|, sdf = k0 (k0 - 1) / (k1 + 1e-6)``.

    Args:
        points: ``[N, 3]`` world-space query points.
        r: ``[3]`` axis lengths; V: ``[3, 3]``; center: ``[3]``.
    Returns:
        ``[N]`` approximate signed distance.
    """
    local = _to_local(points, center, V)
    k0 = jnp.linalg.norm(local / (r + 1e-6), axis=-1)
    k1 = jnp.linalg.norm(local / (r ** 2 + 1e-6), axis=-1)
    return k0 * (k0 - 1.0) / (k1 + 1e-6)


def sdf_cuboid(points: jax.Array, r: jax.Array, V: jax.Array,
               center: jax.Array) -> jax.Array:
    """Exact cuboid SDF with half-sides ``r`` (``convex_loss.py:473-487``)."""
    local = _to_local(points, center, V)
    q = jnp.abs(local) - r
    outside = jnp.linalg.norm(jax.nn.relu(q), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sdf_primitives(points: jax.Array, r: jax.Array, V: jax.Array,
                   center: jax.Array, cuboid: bool = False) -> jax.Array:
    """SDF of each of K primitive slots at each point.

    Args:
        points: ``[N, 3]``; r: ``[K, 3]``; V: ``[K, 3, 3]``;
        center: ``[K, 3]``.
    Returns:
        ``[N, K]`` (equivalent of the reference's stacked per-primitive
        lists ``compute_sdf_ellipsoids``, ``convex_loss.py:331-336``).
    """
    fn = sdf_cuboid if cuboid else sdf_ellipsoid
    out = jax.vmap(lambda rr, vv, cc: fn(points, rr, vv, cc))(r, V, center)
    return out.T

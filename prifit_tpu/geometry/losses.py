"""Self-supervision losses over fitted primitives, fully on device.

Rebuilds (with static shapes + masks instead of ragged lists and host
KDTrees):
  - ``entropy``                          convex_loss.py:209-225
  - ``analytic_chamfer_distance``        src/utils.py:384-426
  - ``compute_intersection_loss_volume_3``  convex_loss.py:374-413
    (the variant the reference *calls*; its ``scatter_mean`` import is
    commented out so it crashes as shipped — this implements the intended
    semantics per the v2/v4 variants: mean squared clamped SDF of each
    point w.r.t. every primitive EXCEPT the one it belongs to)
  - ``prune_points``                     convex_loss.py:444-470
    (boolean gather becomes a no-grad weight mask)
"""

import jax
import jax.numpy as jnp

from prifit_tpu.geometry.fitting import PrimitiveParams
from prifit_tpu.geometry.sdf import sdf_primitives
from prifit_tpu.ops.chamfer import nn_squared_distance


def entropy_loss(X: jax.Array, margin: float = 1.8) -> jax.Array:
    """Embedding-similarity entropy regularizer (convex_loss.py:209-225).

    ``relu(mean_b[ sum((1 + X_b X_b^T)^2) / n^2 ] - margin)`` — pushes
    initial identical embeddings apart so the convex loss has clusters to
    find.

    Args:
        X: ``[B, n, D]`` unit-norm embeddings (reference subsamples n=N/4).
    """
    n = X.shape[1]
    sim = jnp.matmul(X, jnp.swapaxes(X, 1, 2),
                     preferred_element_type=jnp.float32)
    l = jnp.sum((1.0 + sim) ** 2, axis=(1, 2)) / (n * n)
    return jax.nn.relu(jnp.mean(l) - margin)


def analytic_chamfer(params: PrimitiveParams, samples: jax.Array,
                     sample_w: jax.Array, target: jax.Array,
                     cuboid: bool = False) -> jax.Array:
    """SDF-based chamfer between fitted primitives and the target cloud.

    Reference ``analytic_chamfer_distance`` (``src/utils.py:384-426``):
      target side:  mean over target points of (min_k |sdf_k|)^2,
      source side:  mean over primitive samples of the squared distance to
                    the nearest target point (host KDTree there, tiled
                    on-device min here; index selection is no-grad either
                    way, gradients flow through the selected pair),
      per shape: (source + target) / 2, then mean over shapes that have at
      least one surviving primitive (0 if none — ``utils.py:421-423``).

    Args:
        params: batched K-slot primitives ``[B, K, ...]``.
        samples: ``[B, S, 3]`` primitive surface samples.
        sample_w: ``[B, S]`` area weights (0 for invalid slots).
        target: ``[B, M, 3]`` full-resolution target cloud.
    """
    def one(p, s, w, t):
        sdf = sdf_primitives(t, p.r, p.V, p.center, cuboid)   # [M, K]
        asdf = jnp.where(p.valid[None, :], jnp.abs(sdf), jnp.inf)
        d_ts = jnp.min(asdf, axis=1) ** 2                      # [M]
        d_st = nn_squared_distance(s, t)                       # [S]
        w_sum = jnp.maximum(jnp.sum(w), 1e-12)
        mean_st = jnp.sum(d_st * w) / w_sum
        has = jnp.any(p.valid)
        dist = (mean_st + jnp.mean(jnp.where(has, d_ts, 0.0))) / 2.0
        return jnp.where(has, dist, 0.0), has

    dists, has = jax.vmap(one)(params, samples, sample_w, target)
    n = jnp.maximum(jnp.sum(has), 1)
    return jnp.sum(dists) / n


def intersection_loss(params: PrimitiveParams, points: jax.Array,
                      cuboid: bool = False, clamp: float = -1e-3
                      ) -> jax.Array:
    """Primitive-overlap penalty (intended ``volume_3`` semantics).

    Per point: clamp each primitive's SDF from above at ``clamp``; the
    point "belongs" to its min-SDF primitive; average the clamped SDFs of
    the OTHER primitives, square, mean over points; mean over shapes with
    more than one valid primitive (convex_loss.py:374-413 intent — the
    shipped version NameErrors on the commented-out ``scatter_mean``).

    Args:
        params: ``[B, K, ...]``; points: ``[B, M, 3]`` jittered queries.
    """
    def one(p, pts):
        K = p.r.shape[0]
        sdf = sdf_primitives(pts, p.r, p.V, p.center, cuboid)  # [M, K]
        sdf = jnp.minimum(sdf, clamp)
        masked = jnp.where(p.valid[None, :], sdf, jnp.inf)
        own = jnp.argmin(masked, axis=1)                       # [M]
        own_onehot = jax.nn.one_hot(own, K, dtype=sdf.dtype)
        vmask = p.valid.astype(sdf.dtype)[None, :]
        others = vmask * (1.0 - own_onehot)                    # [M, K]
        denom = jnp.maximum(jnp.sum(others, axis=1), 1.0)
        mean_others = jnp.sum(sdf * others, axis=1) / denom    # [M]
        loss = jnp.mean(mean_others ** 2)
        multi = jnp.sum(p.valid) > 1
        return jnp.where(multi, loss, 0.0), multi

    losses, multi = jax.vmap(one)(params, points)
    n = jnp.maximum(jnp.sum(multi), 1)
    return jnp.sum(losses) / n


def sample_axis(r: jax.Array, V: jax.Array, center: jax.Array,
                num_samples: int = 40) -> tuple[jax.Array, jax.Array]:
    """Points along the principal axes of one primitive, more along
    longer axes (reference ``sample_axis``, convex_loss.py:285-311).

    The reference's data-dependent per-axis counts become a fixed
    ``num_samples`` per axis with axis-length weights — same estimator
    under the (axis-proportional) weighting used downstream.

    Returns:
        points ``[3 * num_samples, 3]``, weights ``[3 * num_samples]``.
    """
    scaled_axes = V * r[None, :]                 # columns scaled
    ratios = jnp.linspace(-0.9, 0.897, num_samples)
    pts = (ratios[None, :, None]
           * jnp.swapaxes(scaled_axes, 0, 1)[:, None, :])   # [3, S, 3]
    pts = pts.reshape(-1, 3) + center[None, :]
    w = jnp.repeat(jax.lax.stop_gradient(r) / jnp.maximum(
        jnp.sum(jax.lax.stop_gradient(r)), 1e-12), num_samples)
    return pts, w


def intersection_loss_surface(params: PrimitiveParams, samples: jax.Array,
                              sample_w: jax.Array, cuboid: bool = False,
                              clamp: float = -1e-3) -> jax.Array:
    """Surface-sample intersection penalty (``convex_loss.py:106-206``
    ellipsoid/cuboid variants): squared mean of the min-SDF over all
    primitives at the primitive surface samples, clamped from above."""
    def one(p, s, w):
        sdf = sdf_primitives(s, p.r, p.V, p.center, cuboid)
        sdf = jnp.where(p.valid[None, :], sdf, jnp.inf)
        m = jnp.minimum(jnp.min(sdf, axis=1), clamp)
        w_sum = jnp.maximum(jnp.sum(w), 1e-12)
        has = jnp.any(p.valid)
        return jnp.where(has, jnp.sum(m * w) / w_sum, 0.0) ** 2, has

    losses, has = jax.vmap(one)(params, samples, sample_w)
    n = jnp.maximum(jnp.sum(has), 1)
    return jnp.sum(losses) / n


def intersection_loss_volume(params: PrimitiveParams,
                             num_axis_samples: int = 40,
                             clamp: float = -1e-3) -> jax.Array:
    """Axis-sample volume intersection v1 (``convex_loss.py:227-282``):
    for each primitive, sample its principal axes and penalize the
    clamped min-SDF w.r.t. every OTHER primitive."""
    def one(p):
        K = p.r.shape[0]
        pts, w = jax.vmap(sample_axis, in_axes=(0, 0, 0, None))(
            p.r, p.V, p.center, num_axis_samples)      # [K, S, 3], [K, S]
        w = w * p.valid[:, None]

        def sdf_excl(i):
            sdf = sdf_primitives(pts[i], p.r, p.V, p.center)   # [S, K]
            mask = p.valid & (jnp.arange(K) != i)
            sdf = jnp.where(mask[None, :], sdf, jnp.inf)
            m = jnp.minimum(jnp.min(sdf, axis=1), clamp)
            w_sum = jnp.maximum(jnp.sum(w[i]), 1e-12)
            ok = jnp.any(mask)
            return jnp.where(ok, jnp.sum(m * w[i]) / w_sum, 0.0)

        sdfs = jax.vmap(sdf_excl)(jnp.arange(K))       # [K]
        cnt = jnp.maximum(jnp.sum(p.valid), 1)
        loss = jnp.sum((sdfs * p.valid) ** 2) / cnt
        multi = jnp.sum(p.valid) > 1
        return jnp.where(multi, loss, 0.0), multi

    losses, multi = jax.vmap(one)(params)
    n = jnp.maximum(jnp.sum(multi), 1)
    return jnp.sum(losses) / n


def intersection_loss_v2(params: PrimitiveParams, points: jax.Array,
                         cuboid: bool = False,
                         clamp: float = -1e-3) -> jax.Array:
    """Volume intersection v2 (``convex_loss.py:346-371``): clamped SDFs
    minus the (detached) per-point min, squared."""
    def one(p, pts):
        sdf = sdf_primitives(pts, p.r, p.V, p.center, cuboid)
        sdf = jnp.minimum(sdf, clamp)
        masked = jnp.where(p.valid[None, :], sdf, jnp.inf)
        mn = jax.lax.stop_gradient(jnp.min(masked, axis=1, keepdims=True))
        diff = jnp.where(p.valid[None, :], sdf - mn, 0.0)
        cnt = jnp.maximum(jnp.sum(p.valid), 1)
        loss = jnp.sum(diff ** 2) / (pts.shape[0] * cnt)
        multi = jnp.sum(p.valid) > 1
        return jnp.where(multi, loss, 0.0), multi

    losses, multi = jax.vmap(one)(params, points)
    n = jnp.maximum(jnp.sum(multi), 1)
    return jnp.sum(losses) / n


def intersection_loss_v4(params: PrimitiveParams, points: jax.Array,
                         clamp: float = -1e-3) -> jax.Array:
    """Volume intersection v4 (``convex_loss.py:416-441``): sum of squared
    clamped SDFs minus the squared per-point min."""
    def one(p, pts):
        sdf = sdf_primitives(pts, p.r, p.V, p.center)
        sdf = jnp.minimum(sdf, clamp)
        sdf = jnp.where(p.valid[None, :], sdf, 0.0)
        masked = jnp.where(p.valid[None, :], sdf, jnp.inf)
        multi = jnp.sum(p.valid) > 1          # reference skips K_b <= 1
        # guard the min against the all-invalid row (inf^2 -> -inf)
        mn = jnp.where(multi, jnp.min(masked, axis=1), 0.0)
        loss = jnp.mean(jnp.sum(sdf ** 2, axis=1) - mn ** 2)
        return jnp.where(multi, loss, 0.0), multi

    losses, multi = jax.vmap(one)(params, points)
    n = jnp.maximum(jnp.sum(multi), 1)
    return jnp.sum(losses) / n


def prune_mask(samples: jax.Array, params: PrimitiveParams,
               cuboid: bool = False, thres: float = -1e-3) -> jax.Array:
    """No-grad mask of samples on/near the union surface.

    Reference ``prune_points`` (convex_loss.py:444-470) gathers points with
    min-SDF > thres; static shapes make it a weight mask instead.

    Args:
        samples: ``[B, S, 3]``; params: ``[B, K, ...]``.
    Returns:
        ``[B, S]`` bool.
    """
    def one(p, s):
        sdf = sdf_primitives(s, p.r, p.V, p.center, cuboid)
        sdf = jnp.where(p.valid[None, :], sdf, jnp.inf)
        return jnp.min(sdf, axis=1) > thres

    return jax.lax.stop_gradient(jax.vmap(one)(params, samples))

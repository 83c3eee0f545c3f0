"""Degenerate-input numerics: the full convex pipeline (value AND
gradient) must stay finite on pathological clouds.

These are the regimes where guarded math earns its keep: collapsed
embeddings (the entropy-loss bootstrap case), coplanar/collinear points
(condition-number rejection), duplicated points (zero distances), and
single-cluster embeddings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.geometry import convex_loss, fit_ellipsoids_batch


def _grad_all_finite(pts, emb, **kw):
    def loss(e):
        return convex_loss(pts, pts, e, **kw).total

    val, g = jax.value_and_grad(loss)(emb)
    return np.isfinite(float(val)), np.all(np.isfinite(np.asarray(g)))


KW = dict(quantile=0.1, iterations=3, max_num_clusters=4, n_per_prim=16,
          include_entropy_loss=True, include_intersect_loss=True)


class TestDegenerateInputs:
    def test_collapsed_embeddings(self, rng):
        """All-identical embeddings: floored bandwidth, single cluster."""
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
        emb = jnp.ones((2, 128, 16))
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_coplanar_points(self, rng):
        """Planar clouds: every covariance is rank-2 (cond reject path)."""
        p2 = rng.normal(size=(2, 128, 2)).astype(np.float32)
        pts = jnp.asarray(np.concatenate(
            [p2, np.zeros((2, 128, 1), np.float32)], -1))
        emb = jnp.asarray(rng.normal(size=(2, 128, 16)), jnp.float32)
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_collinear_points(self):
        """1-D clouds: rank-1 covariance everywhere."""
        t = np.linspace(-1, 1, 128, dtype=np.float32)
        pts = jnp.asarray(np.stack(
            [np.stack([t, 0 * t, 0 * t], -1)] * 2))
        emb = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 128, 16)), jnp.float32)
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_duplicated_points(self, rng):
        """Every point duplicated: zero pairwise distances abound."""
        half = rng.normal(size=(2, 64, 3)).astype(np.float32)
        pts = jnp.asarray(np.concatenate([half, half], 1))
        emb_half = rng.normal(size=(2, 64, 16)).astype(np.float32)
        emb = jnp.asarray(np.concatenate([emb_half, emb_half], 1))
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_all_points_identical(self, rng):
        """The fully degenerate cloud: one point repeated."""
        one = rng.normal(size=(1, 1, 3)).astype(np.float32)
        pts = jnp.asarray(np.broadcast_to(one, (2, 128, 3)).copy())
        emb = jnp.asarray(rng.normal(size=(2, 128, 16)), jnp.float32)
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_tiny_scale_cloud(self, rng):
        """Micrometer-scale clouds: squared distances underflow-adjacent."""
        pts = jnp.asarray(
            1e-4 * rng.normal(size=(2, 128, 3)), jnp.float32)
        emb = jnp.asarray(rng.normal(size=(2, 128, 16)), jnp.float32)
        v_ok, g_ok = _grad_all_finite(pts, emb, **KW)
        assert v_ok and g_ok

    def test_fit_degenerate_weights(self, rng):
        """Weight columns that are all-zero or single-point spikes."""
        pts = jnp.asarray(rng.normal(size=(1, 128, 3)), jnp.float32)
        w = np.zeros((1, 128, 4), np.float32)
        w[0, 0, 1] = 1.0                  # single-point cluster
        w[0, :, 2] = 1e-12                # near-zero mass

        def loss(p):
            params = fit_ellipsoids_batch(p, jnp.asarray(w))
            return jnp.sum(jnp.where(params.valid[..., None], params.r,
                                     0.0))

        val, g = jax.value_and_grad(loss)(pts)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))

"""Tests for the remaining intersection-loss variants, axis sampling,
single-shape chamfer, and the numpy OBB sanity oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.geometry import (
    PrimitiveParams,
    fit_ellipsoids,
    intersection_loss_surface,
    intersection_loss_v2,
    intersection_loss_v4,
    intersection_loss_volume,
    sample_axis,
)
from prifit_tpu.geometry.synthetic import _fibonacci_sphere_np
from prifit_tpu.ops.chamfer import (
    chamfer_distance_pairwise_batch,
    chamfer_distance_single_shape,
)


def _two_spheres(gap):
    return PrimitiveParams(
        r=jnp.ones((1, 2, 3)),
        V=jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
        center=jnp.array([[[0.0, 0, 0], [gap, 0, 0]]]),
        valid=jnp.ones((1, 2), bool))


class TestIntersectionVariants:
    @pytest.fixture
    def qpts(self):
        return jnp.asarray(
            np.random.default_rng(0).uniform(-2, 4, (1, 256, 3)),
            jnp.float32)

    def test_volume_v1_overlap_ordering(self):
        l_over = intersection_loss_volume(_two_spheres(0.5))
        l_dis = intersection_loss_volume(_two_spheres(10.0))
        assert float(l_over) > float(l_dis)

    def test_v2_finite_and_nonneg(self, qpts):
        # v2's reference math (clamped SDF minus detached min, squared)
        # penalizes any interior point, not only overlaps — just check
        # it's well-behaved (it is an unused reference variant)
        l = intersection_loss_v2(_two_spheres(0.5), qpts)
        assert np.isfinite(float(l)) and float(l) >= 0

    def test_v4_overlap_ordering(self, qpts):
        l_over = intersection_loss_v4(_two_spheres(0.5), qpts)
        l_dis = intersection_loss_v4(_two_spheres(10.0), qpts)
        assert float(l_over) > float(l_dis)

    def test_surface_variant_finite(self, qpts):
        params = _two_spheres(1.0)
        samples = qpts
        w = jnp.ones(qpts.shape[:2])
        l = intersection_loss_surface(params, samples, w)
        assert np.isfinite(float(l))

    def test_single_primitive_zero(self, qpts):
        p = PrimitiveParams(
            r=jnp.ones((1, 2, 3)),
            V=jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
            center=jnp.zeros((1, 2, 3)),
            valid=jnp.array([[True, False]]))
        assert float(intersection_loss_volume(p)) == 0.0
        assert float(intersection_loss_v2(p, qpts)) == 0.0


class TestSampleAxis:
    def test_points_on_axes(self):
        r = jnp.array([3.0, 2.0, 1.0])
        pts, w = sample_axis(r, jnp.eye(3), jnp.zeros(3), num_samples=10)
        assert pts.shape == (30, 3)
        # first 10 points lie on the x axis, within +-0.9 * r_x
        np.testing.assert_allclose(np.asarray(pts[:10, 1:]), 0, atol=1e-6)
        assert np.abs(np.asarray(pts[:10, 0])).max() <= 0.9 * 3.0 + 1e-5
        # weights proportional to axis lengths
        np.testing.assert_allclose(float(w[:10].sum() / w[10:20].sum()),
                                   3.0 / 2.0, rtol=1e-5)


class TestChamferVariants:
    def test_single_shape_symmetric(self, rng):
        a = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        cd = chamfer_distance_single_shape(a, a)
        assert float(cd) < 1e-5

    def test_single_shape_one_side(self, rng):
        a = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        b = a + 10.0
        one = chamfer_distance_single_shape(a, b, one_side=True)
        # gt->pred one-sided: each b point to nearest a
        d = np.min(np.sum((np.asarray(b)[:, None] - np.asarray(a)) ** 2,
                          -1), 1)
        np.testing.assert_allclose(float(one), d.mean(), rtol=1e-5)

    def test_pairwise_batch(self, rng):
        a = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
        assert float(chamfer_distance_pairwise_batch(a, a)) < 1e-5


class TestOBBSanity:
    """Port of the reference's import-time sanity script
    ``src/ellipsoid_fitting_numpy.py``: an OBB/PCA fit must recover
    (a, b, c) = (5, 2, 1) from surface samples."""

    def test_recovers_axis_lengths(self):
        rng = np.random.default_rng(0)
        abc = np.array([5.0, 2.0, 1.0])
        dirs = _fibonacci_sphere_np(20000)
        area = np.linalg.norm(dirs / abc, axis=1)
        idx = rng.choice(len(dirs), 5000, replace=False,
                         p=area / area.sum())
        pts = dirs[idx] * abc
        params = fit_ellipsoids(jnp.asarray(pts, jnp.float32),
                                jnp.ones((5000, 1), jnp.float32))
        got = np.sort(np.asarray(params.r[0]))[::-1]
        np.testing.assert_allclose(got, abc, rtol=0.05)


class TestZeroValidGuards:
    def test_v4_zero_valid_is_zero(self):
        p = PrimitiveParams(
            r=jnp.ones((1, 3, 3)),
            V=jnp.broadcast_to(jnp.eye(3), (1, 3, 3, 3)),
            center=jnp.zeros((1, 3, 3)),
            valid=jnp.zeros((1, 3), bool))
        q = jnp.zeros((1, 32, 3))
        v = float(intersection_loss_v4(p, q))
        assert v == 0.0 and np.isfinite(v)

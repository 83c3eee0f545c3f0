"""Geometry subsystem tests: fitting, sampling, SDFs, losses, convex loss.

Oracles follow SURVEY.md §4: the synthetic known-parameter ellipsoid scene
(reference ``src/ellipsoid_fitting.py:144-193`` / ``fitting.py:26-74``) is
the correctness fixture for the whole fit pipeline, plus small
hand-computed/numpy golden cases for the individual pieces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.geometry import (
    PrimitiveParams,
    analytic_chamfer,
    convex_loss,
    create_synthetic_dataset,
    eigh3_guarded,
    entropy_loss,
    fit_ellipsoids,
    fit_ellipsoids_batch,
    intersection_loss,
    prune_mask,
    sdf_cuboid,
    sdf_ellipsoid,
    sdf_primitives,
)
from prifit_tpu.geometry.sampling import (
    box_surface_lattice,
    fibonacci_sphere,
    sample_ellipsoid_surface,
    sample_primitives,
)


# ---------------------------------------------------------------- eigh3


class TestEigh3:
    def test_reconstruction(self, rng):
        A = rng.normal(size=(3, 3))
        A = (A + A.T) / 2
        s, V = eigh3_guarded(jnp.asarray(A, jnp.float32))
        np.testing.assert_allclose(V @ np.diag(s) @ V.T, A, atol=1e-5)
        assert s[0] >= s[1] >= s[2]  # descending like torch.svd

    def test_gradient_matches_finite_difference(self, rng):
        A = rng.normal(size=(3, 3))
        A = np.asarray((A + A.T) / 2, np.float64)

        def f(a):
            s, V = eigh3_guarded(a)
            return jnp.sum(s * jnp.array([1.0, 2.0, 3.0])) + jnp.sum(
                V * jnp.arange(9.0).reshape(3, 3))

        g = jax.grad(f)(jnp.asarray(A, jnp.float32))
        eps = 1e-4
        for i in range(3):
            for j in range(3):
                dA = np.zeros((3, 3))
                dA[i, j] = eps
                dA = (dA + dA.T) / 2  # symmetric perturbation
                fd = (f(jnp.asarray(A + dA, jnp.float32))
                      - f(jnp.asarray(A - dA, jnp.float32))) / (2 * eps)
                # gradient is symmetric-projected; compare against sym fd
                got = (g[i, j] + g[j, i]) / 2 * (1.0 if i == j else 1.0)
                np.testing.assert_allclose(got, fd, rtol=2e-2, atol=2e-3)

    def test_degenerate_eigenvalues_finite_grad(self):
        A = jnp.eye(3)  # fully degenerate spectrum

        def f(a):
            s, V = eigh3_guarded(a)
            return jnp.sum(V ** 2) + jnp.sum(s)

        g = jax.grad(f)(A)
        assert np.all(np.isfinite(g))


# ---------------------------------------------------------------- fitting


class TestFitting:
    def test_recovers_synthetic_parameters(self):
        scene = create_synthetic_dataset(2, seed=3)
        params = fit_ellipsoids_batch(
            jnp.asarray(scene.points), jnp.asarray(scene.weights))
        for b in range(2):
            assert np.all(np.asarray(params.valid[b][:3]))
            assert not np.any(np.asarray(params.valid[b][3:]))
            for i in range(3):
                got = np.sort(np.asarray(params.r[b, i]))
                want = np.sort(scene.params[b, i])
                # axis lengths from (max-min)/2 of samples: a few % low
                np.testing.assert_allclose(got, want, rtol=0.08)
                np.testing.assert_allclose(np.asarray(params.center[b, i]),
                                           scene.centers[b, i], atol=0.6)

    def test_recovered_rotation_aligns_axes(self):
        scene = create_synthetic_dataset(1, seed=5)
        params = fit_ellipsoids_batch(
            jnp.asarray(scene.points), jnp.asarray(scene.weights))
        for i in range(3):
            abc = scene.params[0, i]
            if len(np.unique(abc)) < 3:
                continue  # ambiguous principal axes
            R_true = scene.rotations[0, i]      # local -> world via p @ R
            V = np.asarray(params.V[0, i])      # columns are principal axes
            # world axis directions of the true ellipsoid, longest first
            order = np.argsort(-abc)
            true_axes = R_true.T[:, order] if False else R_true[order]
            for k in range(3):
                c = abs(np.dot(true_axes[k], V[:, k]))
                assert c > 0.97, f"axis {k} misaligned: |cos|={c}"

    def test_zero_weight_slot_invalid(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        w = jnp.zeros((100, 4)).at[:, 0].set(1.0)
        params = fit_ellipsoids(pts, w)
        assert bool(params.valid[0])
        assert not np.any(np.asarray(params.valid[1:]))

    def test_degenerate_cluster_rejected_by_condition_number(self):
        # points on a line -> cov condition number explodes -> invalid
        t = jnp.linspace(-1, 1, 200)[:, None]
        pts = t * jnp.array([[1.0, 0.0, 0.0]])
        w = jnp.ones((200, 1))
        params = fit_ellipsoids(pts, w)
        assert not bool(params.valid[0])

    def test_no_reflection(self, rng):
        scene = create_synthetic_dataset(1, seed=7)
        params = fit_ellipsoids_batch(
            jnp.asarray(scene.points), jnp.asarray(scene.weights))
        dets = np.linalg.det(np.asarray(params.V[0, :3]))
        assert np.all(dets > 0)

    def test_fit_is_differentiable(self):
        scene = create_synthetic_dataset(1, seed=1)
        pts = jnp.asarray(scene.points)
        w = jnp.asarray(scene.weights)

        def loss(p):
            params = fit_ellipsoids_batch(p, w)
            return jnp.sum(params.r * params.valid[..., None])

        g = jax.grad(loss)(pts)
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0


# ---------------------------------------------------------------- sdf


class TestSDF:
    def test_ellipsoid_sign(self):
        r = jnp.array([2.0, 1.0, 0.5])
        V = jnp.eye(3)
        c = jnp.zeros(3)
        pts = jnp.array([[0.5, 0.0, 0.0],    # inside
                         [2.0, 0.0, 0.0],    # on surface
                         [4.0, 0.0, 0.0]])   # outside
        sdf = sdf_ellipsoid(pts, r, V, c)
        assert sdf[0] < 0
        assert abs(sdf[1]) < 1e-3
        assert sdf[2] > 0

    def test_cuboid_exact_values(self):
        r = jnp.array([1.0, 2.0, 3.0])
        sdf = sdf_cuboid(jnp.array([[3.0, 0.0, 0.0],
                                    [0.0, 0.0, 0.0],
                                    [0.5, 0.0, 0.0]]),
                         r, jnp.eye(3), jnp.zeros(3))
        np.testing.assert_allclose(sdf, [2.0, -1.0, -0.5], atol=1e-6)

    def test_rotation_and_center(self):
        # 90deg z-rotation: local x axis points along world y
        V = jnp.array([[0.0, -1.0, 0.0],
                       [1.0, 0.0, 0.0],
                       [0.0, 0.0, 1.0]]).T
        r = jnp.array([2.0, 1.0, 1.0])
        c = jnp.array([5.0, 0.0, 0.0])
        p_surface = jnp.array([[5.0, 2.0, 0.0]])  # center + 2 * world-y
        sdf = sdf_ellipsoid(p_surface, r, V, c)
        assert abs(float(sdf[0])) < 1e-3

    def test_primitives_batch_shape(self, rng):
        pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        r = jnp.ones((4, 3))
        V = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        c = jnp.zeros((4, 3))
        out = sdf_primitives(pts, r, V, c)
        assert out.shape == (50, 4)


# ---------------------------------------------------------------- sampling


class TestSampling:
    def test_fibonacci_unit_norm(self):
        d = fibonacci_sphere(256)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)

    def test_samples_on_surface(self):
        r = jnp.array([3.0, 2.0, 1.0])
        V = jnp.eye(3)
        c = jnp.array([1.0, -1.0, 0.5])
        pts, w = sample_ellipsoid_surface(r, V, c, fibonacci_sphere(512))
        sdf = sdf_ellipsoid(pts, r, V, c)
        assert np.abs(np.asarray(sdf)).max() < 1e-2
        assert np.all(np.asarray(w) > 0)

    def test_area_weights_integrate_to_surface_area(self):
        # sphere radius 2: area = 16 pi
        r = jnp.array([2.0, 2.0, 2.0])
        _, w = sample_ellipsoid_surface(r, jnp.eye(3), jnp.zeros(3),
                                        fibonacci_sphere(1024))
        np.testing.assert_allclose(float(jnp.sum(w)), 16 * np.pi, rtol=0.01)

    def test_gradients_reach_params(self):
        dirs = fibonacci_sphere(64)

        def f(r):
            pts, _ = sample_ellipsoid_surface(r, jnp.eye(3), jnp.zeros(3),
                                              dirs)
            return jnp.sum(pts ** 2)

        g = jax.grad(f)(jnp.array([1.0, 2.0, 3.0]))
        assert np.all(np.isfinite(g)) and np.all(np.abs(g) > 0)

    def test_cuboid_lattice_on_surface(self):
        lattice, axis = box_surface_lattice(600)
        on_face = np.abs(np.asarray(lattice)).max(axis=1)
        np.testing.assert_allclose(on_face, 1.0, atol=1e-6)
        taken = np.take_along_axis(np.abs(np.asarray(lattice)),
                                   np.asarray(axis)[:, None], 1)[:, 0]
        np.testing.assert_allclose(taken, 1.0, atol=1e-6)

    def test_invalid_slots_zero_weight(self):
        params = PrimitiveParams(
            r=jnp.ones((3, 3)),
            V=jnp.broadcast_to(jnp.eye(3), (3, 3, 3)),
            center=jnp.zeros((3, 3)),
            valid=jnp.array([True, False, True]))
        _, w = sample_primitives(params, n_per_prim=32)
        w = np.asarray(w).reshape(3, 32)
        assert np.all(w[1] == 0)
        assert np.all(w[[0, 2]] > 0)


# ---------------------------------------------------------------- losses


def _single_prim_params(r, center, B=1):
    return PrimitiveParams(
        r=jnp.broadcast_to(jnp.asarray(r), (B, 1, 3)),
        V=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        center=jnp.broadcast_to(jnp.asarray(center), (B, 1, 3)),
        valid=jnp.ones((B, 1), bool))


class TestLosses:
    def test_entropy_identical_embeddings_high(self):
        X = jnp.ones((2, 64, 8)) / jnp.sqrt(8.0)
        # all-same embeddings: D = (1+1)^2 = 4 -> mean 4 - 1.8 = 2.2
        np.testing.assert_allclose(float(entropy_loss(X)), 2.2, atol=1e-5)

    def test_entropy_orthogonal_embeddings_zero(self):
        X = jnp.broadcast_to(jnp.eye(64)[None], (1, 64, 64))
        # D = 1 except diag 4 -> mean ~1.05 < margin -> relu -> 0
        assert float(entropy_loss(X)) == 0.0

    def test_analytic_chamfer_perfect_fit_near_zero(self):
        r = jnp.array([2.0, 1.5, 1.0])
        params = _single_prim_params(r, jnp.zeros(3))
        target = fibonacci_sphere(1024) * r[None, :]
        samples, w = sample_ellipsoid_surface(
            r, jnp.eye(3), jnp.zeros(3), fibonacci_sphere(512))
        l = analytic_chamfer(params, samples[None], w[None], target[None])
        assert float(l) < 5e-3

    def test_analytic_chamfer_no_valid_prims_zero(self):
        params = PrimitiveParams(
            r=jnp.ones((1, 2, 3)), V=jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
            center=jnp.zeros((1, 2, 3)), valid=jnp.zeros((1, 2), bool))
        l = analytic_chamfer(params, jnp.zeros((1, 16, 3)),
                             jnp.zeros((1, 16)), jnp.ones((1, 32, 3)))
        assert float(l) == 0.0

    def test_intersection_overlapping_worse_than_disjoint(self):
        def two_spheres(gap):
            return PrimitiveParams(
                r=jnp.ones((1, 2, 3)),
                V=jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
                center=jnp.array([[[0.0, 0, 0], [gap, 0, 0]]]),
                valid=jnp.ones((1, 2), bool))

        qpts = jnp.asarray(
            np.random.default_rng(0).uniform(-2, 5, (1, 512, 3)), jnp.float32)
        l_overlap = intersection_loss(two_spheres(0.5), qpts)
        l_disjoint = intersection_loss(two_spheres(10.0), qpts)
        assert float(l_overlap) > float(l_disjoint)

    def test_intersection_single_prim_zero(self):
        params = _single_prim_params([1.0, 1, 1], jnp.zeros(3))
        l = intersection_loss(params, jnp.ones((1, 64, 3)))
        assert float(l) == 0.0

    def test_prune_mask_keeps_surface_points(self):
        params = _single_prim_params([1.0, 1.0, 1.0], jnp.zeros(3))
        pts = jnp.array([[[0.5, 0.0, 0.0],     # deep inside -> pruned
                          [1.0, 0.0, 0.0],     # on surface -> kept
                          [3.0, 0.0, 0.0]]])   # outside -> kept
        m = np.asarray(prune_mask(pts, params))
        assert list(m[0]) == [False, True, True]


# ---------------------------------------------------------------- pipeline


class TestConvexLossPipeline:
    """End-to-end oracle: the reference's fitting.py demo as a test."""

    @pytest.fixture(scope="class")
    def scene(self):
        return create_synthetic_dataset(2, seed=11)

    def test_full_pipeline_runs_and_is_finite(self, scene):
        pts = jnp.asarray(scene.points)
        # embeddings that perfectly separate the 3 ellipsoids
        emb = jnp.asarray(scene.weights[:, :, :8]) + 0.1
        out = convex_loss(pts, pts, emb, quantile=0.05, iterations=5,
                          max_num_clusters=8, n_per_prim=128,
                          include_entropy_loss=True,
                          include_intersect_loss=True,
                          key=jax.random.PRNGKey(0))
        assert np.isfinite(float(out.total))
        assert np.isfinite(float(out.chamfer))
        assert float(out.chamfer) > 0

    def test_good_embedding_beats_random(self, scene):
        pts = jnp.asarray(scene.points)
        good = jnp.asarray(scene.weights[:, :, :8]) + 0.05
        rnd = jax.random.normal(jax.random.PRNGKey(3), good.shape)
        out_good = convex_loss(pts, pts, good, quantile=0.05,
                               max_num_clusters=8, n_per_prim=128)
        out_rnd = convex_loss(pts, pts, rnd, quantile=0.05,
                              max_num_clusters=8, n_per_prim=128)
        assert float(out_good.chamfer) < float(out_rnd.chamfer)

    def test_backward_through_whole_pipeline(self, scene):
        pts = jnp.asarray(scene.points[:1])
        emb = jnp.asarray(scene.weights[:1, :, :8]) + 0.1

        def loss(e):
            return convex_loss(pts, pts, e, quantile=0.05,
                               max_num_clusters=8, n_per_prim=64).total

        g = jax.grad(loss)(emb)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_evaluation_mode_zero_chamfer(self, scene):
        pts = jnp.asarray(scene.points[:1])
        emb = jnp.asarray(scene.weights[:1, :, :8]) + 0.1
        out = convex_loss(pts, pts, emb, quantile=0.05, max_num_clusters=8,
                          n_per_prim=64, evaluation=True)
        assert float(out.total) == 0.0

    def test_jit_compiles(self, scene):
        pts = jnp.asarray(scene.points[:1])
        emb = jnp.asarray(scene.weights[:1, :, :8]) + 0.1

        @jax.jit
        def f(p, e):
            return convex_loss(p, p, e, quantile=0.05, max_num_clusters=8,
                               n_per_prim=64).total

        v1 = f(pts, emb)
        v2 = convex_loss(pts, pts, emb, quantile=0.05, max_num_clusters=8,
                         n_per_prim=64).total
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)


class TestCuboidPipeline:
    def test_cuboid_convex_loss_and_grad(self):
        scene = create_synthetic_dataset(1, seed=13)
        pts = jnp.asarray(scene.points)
        emb = jnp.asarray(scene.weights[:1, :, :8]) + 0.1

        def loss(e):
            return convex_loss(pts, pts, e, quantile=0.05,
                               max_num_clusters=8, n_per_prim=66,
                               if_cuboid=True,
                               include_intersect_loss=True,
                               include_pruning=True).total

        val, g = jax.value_and_grad(loss)(emb)
        assert np.isfinite(float(val)) and float(val) > 0
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

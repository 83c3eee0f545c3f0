"""Numerical parity against the reference's own code (used as an oracle).

These tests import modules from the read-only reference checkout at
/root/reference (torch-CPU-importable ones only) and compare their outputs
against ours on identical inputs.  Nothing from the reference is copied
into this repo — it is loaded as an external ground truth, the same role
the paper's released code plays for any reimplementation.

Skipped wholesale when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch

    # fitting_utils does `from open3d import *` for two unused symbols;
    # fake the module so the import succeeds on this box (no open3d).
    fake_utility = types.SimpleNamespace(Vector3dVector=None,
                                         Vector3iVector=None)
    fake_open3d = types.ModuleType("open3d")
    fake_open3d.utility = fake_utility
    sys.modules.setdefault("open3d", fake_open3d)

    import models.pointnet_util as ref_pu                  # noqa: E402
    from src.mean_shift import MeanShift                   # noqa: E402
    from src.guard import guard_exp as ref_guard_exp       # noqa: E402
    from src.guard import guard_sqrt as ref_guard_sqrt     # noqa: E402
    import src.fitting_utils as ref_fit                    # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prifit_tpu.clustering.mean_shift import (  # noqa: E402
    compute_bandwidth,
    mean_shift_iterations,
    membership,
)
from prifit_tpu.geometry.fitting import eigh3_guarded  # noqa: E402
from prifit_tpu.ops.pairwise import square_distance  # noqa: E402
from prifit_tpu.ops.sampling import (  # noqa: E402
    farthest_point_sample,
    index_points,
    query_ball_point,
)
from prifit_tpu.utils.guard import guard_exp, guard_sqrt  # noqa: E402


@pytest.fixture
def cloud(rng):
    return rng.normal(size=(2, 128, 3)).astype(np.float32)


def _patched_randint_zero(monkeypatch):
    """Reference FPS starts at torch.randint; pin it to 0 like our
    deterministic mode."""
    real = torch.randint

    def zero(*args, **kwargs):
        out = real(*args, **kwargs)
        return torch.zeros_like(out)

    return zero


class TestGeometricOps:
    def test_square_distance(self, cloud):
        ref = ref_pu.square_distance(torch.tensor(cloud),
                                     torch.tensor(cloud)).numpy()
        got = np.asarray(square_distance(
            jnp.asarray(cloud), jnp.asarray(cloud),
            precision=jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_index_points(self, cloud, rng):
        idx = rng.integers(0, 128, (2, 16, 4))
        ref = ref_pu.index_points(torch.tensor(cloud),
                                  torch.tensor(idx)).numpy()
        got = np.asarray(index_points(jnp.asarray(cloud),
                                      jnp.asarray(idx)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_farthest_point_sample(self, cloud, monkeypatch):
        monkeypatch.setattr(torch, "randint",
                            _patched_randint_zero(monkeypatch))
        ref = ref_pu.farthest_point_sample(torch.tensor(cloud), 32).numpy()
        got = np.asarray(farthest_point_sample(jnp.asarray(cloud), 32,
                                               deterministic=True))
        np.testing.assert_array_equal(got, ref)

    def test_query_ball_point(self, cloud):
        q = cloud[:, :32]
        ref = ref_pu.query_ball_point(0.5, 16, torch.tensor(cloud),
                                      torch.tensor(q)).numpy()
        got = np.asarray(query_ball_point(0.5, 16, jnp.asarray(cloud),
                                          jnp.asarray(q)))
        np.testing.assert_array_equal(got, ref)

    def test_sample_and_group_pipeline(self, cloud, monkeypatch):
        """FPS -> ball query chained (the sa-layer geometry path)."""
        monkeypatch.setattr(torch, "randint",
                            _patched_randint_zero(monkeypatch))
        t = torch.tensor(cloud)
        fps_ref = ref_pu.farthest_point_sample(t, 16)
        centers_ref = ref_pu.index_points(t, fps_ref)
        ball_ref = ref_pu.query_ball_point(0.4, 8, t, centers_ref).numpy()

        j = jnp.asarray(cloud)
        fps = farthest_point_sample(j, 16, deterministic=True)
        centers = index_points(j, fps)
        ball = np.asarray(query_ball_point(0.4, 8, j, centers))
        np.testing.assert_array_equal(ball, ball_ref)


class TestGuards:
    def test_guard_exp(self, rng):
        x = rng.normal(scale=30, size=(100,)).astype(np.float32)
        ref = ref_guard_exp(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(guard_exp(jnp.asarray(x))),
                                   ref, rtol=1e-6)

    def test_guard_sqrt(self, rng):
        x = rng.normal(size=(100,)).astype(np.float32)
        ref = ref_guard_sqrt(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(guard_sqrt(jnp.asarray(x))),
                                   ref, rtol=1e-6)


class TestMeanShiftParity:
    @pytest.fixture
    def emb(self, rng):
        x = rng.normal(size=(128, 16)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def test_bandwidth(self, emb):
        ms = MeanShift()
        with torch.no_grad():
            ref = float(ms.compute_bandwidth(torch.tensor(emb), 128, 0.1))
        got = float(compute_bandwidth(jnp.asarray(emb), 0.1))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    @pytest.mark.parametrize("kernel", ["gaussian", "epanechnikov"])
    def test_iterations(self, emb, kernel):
        ms = MeanShift()
        bw = 0.7
        with torch.no_grad():
            ref, _ = ms.mean_shift_(torch.tensor(emb), b=torch.tensor(bw),
                                    iterations=5, kernel_type=kernel)
        got = mean_shift_iterations(jnp.asarray(emb), jnp.float32(bw), 5,
                                    kernel_type=kernel)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)

    def test_membership(self, emb):
        ms = MeanShift()
        centers = emb[:8]
        bw = 0.7
        with torch.no_grad():
            ref = ms.membership(torch.tensor(centers), torch.tensor(emb),
                                torch.tensor(bw)).numpy()
        got = np.asarray(membership(
            jnp.asarray(centers), jnp.ones(8, bool), jnp.asarray(emb),
            jnp.float32(bw)))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_nms_cluster_count(self, emb, monkeypatch):
        """End-to-end mean_shift(): same number of distinct clusters."""
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        monkeypatch.setattr(torch, "get_device", lambda t: -1,
                            raising=False)
        ms = MeanShift()
        with torch.no_grad():
            centers, bw, labels = ms.mean_shift(
                torch.tensor(emb), 128, 0.1, 5)
        ref_count = int(torch.unique(labels).shape[0])

        from prifit_tpu.clustering.mean_shift import cluster_single
        res = cluster_single(jnp.asarray(emb), quantile=0.1, iterations=5,
                             max_num_clusters=64, num_candidates=1)
        got_count = int(np.asarray(res.num_clusters))
        assert got_count == ref_count


class TestSVDGradientParity:
    def test_eigh3_vjp_matches_customsvd(self, rng, monkeypatch):
        """Gradient parity with the reference CustomSVD on a symmetric
        3x3 (SURVEY hard part 2): same loss through (S, V) must produce
        matching input cotangents."""
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        A = rng.normal(size=(3, 3))
        A = np.asarray((A + A.T) / 2 + 2 * np.eye(3), np.float32)
        W_s = rng.normal(size=(3,)).astype(np.float32)
        W_v = rng.normal(size=(3, 3)).astype(np.float32)

        t = torch.tensor(A, requires_grad=True)
        U, S, V = ref_fit.customsvd(t)
        loss = (S * torch.tensor(W_s)).sum() \
            + (V * torch.tensor(W_v)).sum()
        loss.backward()
        ref_grad = t.grad.numpy()

        def f(a):
            s, v = eigh3_guarded(a)
            return jnp.sum(s * jnp.asarray(W_s)) \
                + jnp.sum(v * jnp.asarray(W_v))

        got = np.asarray(jax.grad(f)(jnp.asarray(A)))
        # the reference assumes dU = 0 and returns an unsymmetrized
        # gradient; for a symmetric input the true gradient is the
        # symmetric part of either — compare those
        ref_sym = (ref_grad + ref_grad.T) / 2
        got_sym = (got + got.T) / 2
        np.testing.assert_allclose(got_sym, ref_sym, atol=5e-4)


class TestMeanShiftEffParity:
    def test_seeded_iterations(self, rng):
        """Seeded eff variant (src/mean_shift.py:86-118) — including its
        similarity-kernel and replace-update quirks."""
        from prifit_tpu.clustering.mean_shift import (
            mean_shift_eff_iterations,
        )

        x = rng.normal(size=(128, 16)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        seeds = x[::2]
        ms = MeanShift()
        with torch.no_grad():
            ref, _ = ms.mean_shift_eff_(
                torch.tensor(x), torch.tensor(seeds.copy()),
                b=torch.tensor(0.7), iterations=5)
        got = mean_shift_eff_iterations(jnp.asarray(x), jnp.asarray(seeds),
                                        jnp.float32(0.7), 5)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)

    def test_seeded_epanechnikov(self, rng):
        from prifit_tpu.clustering.mean_shift import (
            mean_shift_eff_iterations,
        )

        x = rng.normal(size=(96, 8)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        seeds = x[:48]
        ms = MeanShift()
        with torch.no_grad():
            ref, _ = ms.mean_shift_eff_(
                torch.tensor(x), torch.tensor(seeds.copy()),
                b=torch.tensor(0.8), iterations=4,
                kernel_type="epanechnikov")
        got = mean_shift_eff_iterations(jnp.asarray(x), jnp.asarray(seeds),
                                        jnp.float32(0.8), 4,
                                        kernel_type="epanechnikov")
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)

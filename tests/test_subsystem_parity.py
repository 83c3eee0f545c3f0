"""Subsystem-level numerical parity vs the reference convex-loss stack.

``test_reference_parity.py`` oracles individual ops; this file oracles the
*subsystems* the VERDICT flagged as unverified, importing the reference's
own code (read-only checkout at /root/reference) as the ground truth:

  - ``clustering`` driver weights           src/ellipsoid_utils.py:31-73
  - ``weighted_ellipsoid_fitting_batch``    src/ellipsoid_fitting.py:104-117
  - ellipsoid / cuboid SDFs                 convex_loss.py:313-343,473-502
  - ``entropy``                             convex_loss.py:209-225
  - ``analytic_chamfer_distance``           src/utils.py:384-426 (sklearn
    KDTree on the host there, tiled on-device min here)
  - ``prune_points``                        convex_loss.py:444-470
  - intersection losses v2 / v4             convex_loss.py:346-371,416-441
  - gradients through the fit -> SDF -> chamfer chain (weights & points)

Since real-data mIoU parity is impossible in this environment (no
ShapeNet-Part/ACD data), end-to-end numerical agreement on the loss stack
is the strongest available proxy.  trimesh / open3d / transforms3d / ipdb
are faked only so the reference modules *import*; no faked function is
ever executed (primitive *sampling*, the one genuinely trimesh-backed
stage, is the documented exception tested separately by distribution in
test_geometry.py).  Nothing from the reference is copied into this repo.
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
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    def _ns(**kw):
        return types.SimpleNamespace(**kw)

    # --- stub the viz/mesh deps so the reference modules import ---
    # (test_reference_parity.py may have installed a minimal open3d fake
    # already; augment whatever is there)
    o3d = sys.modules.get("open3d")
    if o3d is None:
        o3d = types.ModuleType("open3d")
        sys.modules["open3d"] = o3d
    if not hasattr(o3d, "utility"):
        o3d.utility = _ns(Vector3dVector=None, Vector3iVector=None)
    if not hasattr(o3d, "visualization"):
        o3d.visualization = _ns(draw_geometries=None)
    if not hasattr(o3d, "geometry"):
        o3d.geometry = _ns(PointCloud=None)

    if "trimesh" not in sys.modules:
        tm = types.ModuleType("trimesh")
        tm.creation = _ns(icosphere=None)
        tm.sample = _ns(sample_surface_even=None)
        sys.modules["trimesh"] = tm
    if "ipdb" not in sys.modules:
        ip = types.ModuleType("ipdb")
        ip.set_trace = lambda: None
        sys.modules["ipdb"] = ip
    if "transforms3d" not in sys.modules:
        t3d = types.ModuleType("transforms3d")
        aff = types.ModuleType("transforms3d.affines")
        aff.compose = None
        eul = types.ModuleType("transforms3d.euler")
        eul.euler2mat = None
        t3d.affines, t3d.euler = aff, eul
        sys.modules["transforms3d"] = t3d
        sys.modules["transforms3d.affines"] = aff
        sys.modules["transforms3d.euler"] = eul

    import convex_loss as ref_cl                        # noqa: E402
    import src.ellipsoid_fitting as ref_ef              # noqa: E402
    import src.ellipsoid_utils as ref_eu                # noqa: E402
    from src.utils import (                             # noqa: E402
        analytic_chamfer_distance as ref_analytic_chamfer,
    )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prifit_tpu.clustering.mean_shift import cluster_batch  # noqa: E402
from prifit_tpu.geometry.fitting import (  # noqa: E402
    PrimitiveParams,
    fit_ellipsoids_batch,
)
from prifit_tpu.geometry.losses import (  # noqa: E402
    analytic_chamfer,
    entropy_loss,
    intersection_loss_v2,
    intersection_loss_v4,
    prune_mask,
)
from prifit_tpu.geometry.sdf import sdf_primitives  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_torch(monkeypatch):
    """Make the reference's hard-coded .cuda() calls no-ops on this box."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch, "get_device", lambda t: -1, raising=False)


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
    return q.astype(np.float32)


def _random_params(rng, B, K):
    """Well-conditioned random primitive parameter sets."""
    r = rng.uniform(0.5, 2.0, (B, K, 3)).astype(np.float32)
    V = np.stack([np.stack([_random_rotation(rng) for _ in range(K)])
                  for _ in range(B)]).astype(np.float32)
    center = rng.normal(scale=2.0, size=(B, K, 3)).astype(np.float32)
    return r, V, center


def _to_ref_params(r, V, center, valid=None):
    """Dense slots -> the reference's ragged list(B) of (r, V, c) tuples."""
    B, K = r.shape[:2]
    out = []
    for b in range(B):
        shape_params = []
        for k in range(K):
            if valid is not None and not valid[b, k]:
                continue
            shape_params.append((torch.tensor(r[b, k]),
                                 torch.tensor(V[b, k]),
                                 torch.tensor(center[b, k])))
        out.append(shape_params)
    return out


def _dense_params(r, V, center, valid=None):
    B, K = r.shape[:2]
    v = np.ones((B, K), bool) if valid is None else valid
    return PrimitiveParams(r=jnp.asarray(r), V=jnp.asarray(V),
                           center=jnp.asarray(center), valid=jnp.asarray(v))


def _blob_cloud(rng, K=3, n_per=64, spread=4.0):
    """K well-separated gaussian blobs + soft one-hot-ish weights."""
    centers = rng.normal(scale=spread, size=(K, 3))
    pts, w = [], []
    for k in range(K):
        scales = rng.uniform(0.3, 1.2, size=3)
        pts.append(centers[k] + rng.normal(size=(n_per, 3)) * scales)
        col = np.full((n_per, K), 0.02)
        col[:, k] = 1.0
        w.append(col)
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(w).astype(np.float32))


class TestSDFParity:
    @pytest.mark.parametrize("cuboid", [False, True])
    def test_sdf_values(self, rng, cuboid):
        B, K, M = 2, 4, 128
        r, V, center = _random_params(rng, B, K)
        pts = rng.normal(scale=3.0, size=(B, M, 3)).astype(np.float32)

        ref_fn = (ref_cl.compute_sdf_cuboid_batch if cuboid
                  else ref_cl.compute_sdf_ellipsoids_batch)
        ref = ref_fn(torch.tensor(pts), _to_ref_params(r, V, center))
        ref = np.stack([torch.stack(s, 1).numpy() for s in ref])  # [B, M, K]

        p = _dense_params(r, V, center)
        got = np.stack([np.asarray(sdf_primitives(
            jnp.asarray(pts[b]), p.r[b], p.V[b], p.center[b], cuboid))
            for b in range(B)])
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_sdf_gradient(self, rng):
        """d(sdf)/d(r) parity — the axis lengths carry the fit gradient."""
        r, V, center = _random_params(rng, 1, 1)
        pts = rng.normal(scale=3.0, size=(32, 3)).astype(np.float32)

        rt = torch.tensor(r[0, 0], requires_grad=True)
        ref_cl.compute_sdf_ellipsoid(torch.tensor(pts),
                                     torch.tensor(center[0, 0]), rt,
                                     torch.tensor(V[0, 0])).sum().backward()

        def f(rr):
            from prifit_tpu.geometry.sdf import sdf_ellipsoid
            return jnp.sum(sdf_ellipsoid(jnp.asarray(pts), rr,
                                         jnp.asarray(V[0, 0]),
                                         jnp.asarray(center[0, 0])))

        got = np.asarray(jax.grad(f)(jnp.asarray(r[0, 0])))
        np.testing.assert_allclose(got, rt.grad.numpy(), atol=1e-4)


class TestEntropyParity:
    def test_values(self, rng):
        X = rng.normal(size=(3, 64, 16)).astype(np.float32)
        X /= np.linalg.norm(X, axis=2, keepdims=True)
        ref = float(ref_cl.entropy(torch.tensor(X)))
        got = float(entropy_loss(jnp.asarray(X)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_below_margin_is_zero(self, rng):
        # orthogonal-ish embeddings: similarity ~0 -> mean (1+s)^2 ~1 < 1.8
        X = np.eye(64, 64, dtype=np.float32)[None]
        assert float(ref_cl.entropy(torch.tensor(X))) == 0.0
        assert float(entropy_loss(jnp.asarray(X))) == 0.0


class TestAnalyticChamferParity:
    @pytest.mark.parametrize("cuboid", [False, True])
    def test_values(self, rng, cuboid):
        B, K, S, M = 3, 4, 200, 256
        r, V, center = _random_params(rng, B, K)
        src = rng.normal(scale=2.0, size=(B, S, 3)).astype(np.float32)
        tgt = rng.normal(scale=2.0, size=(B, M, 3)).astype(np.float32)

        ref = float(ref_analytic_chamfer(
            _to_ref_params(r, V, center),
            [torch.tensor(src[b]) for b in range(B)],
            torch.tensor(tgt), cuboid=cuboid))

        got = float(analytic_chamfer(
            _dense_params(r, V, center), jnp.asarray(src),
            jnp.ones((B, S), jnp.float32), jnp.asarray(tgt), cuboid=cuboid))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_shape_with_no_primitives(self, rng):
        """Reference skips shapes whose sample list is -1 (utils.py:402-405);
        ours masks them out — means must agree."""
        B, K, S, M = 3, 4, 200, 256
        r, V, center = _random_params(rng, B, K)
        valid = np.ones((B, K), bool)
        valid[1] = False
        src = rng.normal(scale=2.0, size=(B, S, 3)).astype(np.float32)
        tgt = rng.normal(scale=2.0, size=(B, M, 3)).astype(np.float32)

        ref_src = [torch.tensor(src[0]), -1, torch.tensor(src[2])]
        ref = float(ref_analytic_chamfer(
            _to_ref_params(r, V, center, valid), ref_src,
            torch.tensor(tgt)))

        w = np.ones((B, S), np.float32)
        w[1] = 0.0
        got = float(analytic_chamfer(
            _dense_params(r, V, center, valid), jnp.asarray(src),
            jnp.asarray(w), jnp.asarray(tgt)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_gradient_wrt_params(self, rng):
        B, K, S, M = 1, 3, 64, 128
        r, V, center = _random_params(rng, B, K)
        src = rng.normal(scale=2.0, size=(B, S, 3)).astype(np.float32)
        tgt = rng.normal(scale=2.0, size=(B, M, 3)).astype(np.float32)

        rt = [torch.tensor(r[0, k], requires_grad=True) for k in range(K)]
        ref_params = [[(rt[k], torch.tensor(V[0, k]),
                        torch.tensor(center[0, k])) for k in range(K)]]
        ref_analytic_chamfer(ref_params, [torch.tensor(src[0])],
                             torch.tensor(tgt)).backward()
        ref_grad = np.stack([t.grad.numpy() for t in rt])

        def f(rr):
            p = PrimitiveParams(r=rr[None], V=jnp.asarray(V),
                                center=jnp.asarray(center),
                                valid=jnp.ones((B, K), bool))
            return analytic_chamfer(p, jnp.asarray(src),
                                    jnp.ones((B, S), jnp.float32),
                                    jnp.asarray(tgt))

        got = np.asarray(jax.grad(f)(jnp.asarray(r[0])))
        np.testing.assert_allclose(got, ref_grad, atol=1e-4)


class TestPruneParity:
    @pytest.mark.parametrize("cuboid", [False, True])
    def test_mask(self, rng, cuboid):
        B, K, S = 2, 3, 256
        r, V, center = _random_params(rng, B, K)
        pts = rng.normal(scale=2.0, size=(B, S, 3)).astype(np.float32)

        if cuboid:
            # reference prune_points is ellipsoid-only; emulate its cuboid
            # analog through the same stacked-min rule
            sdfs = ref_cl.compute_sdf_cuboid_batch(
                torch.tensor(pts), _to_ref_params(r, V, center))
            ref = np.stack([(torch.stack(s, 1).min(1)[0] > -1e-3).numpy()
                            for s in sdfs])
        else:
            pruned = ref_cl.prune_points(torch.tensor(pts),
                                         _to_ref_params(r, V, center))
            sdfs = ref_cl.compute_sdf_ellipsoids_batch(
                torch.tensor(pts), _to_ref_params(r, V, center))
            ref = np.stack([(torch.stack(s, 1).min(1)[0] > -1e-3).numpy()
                            for s in sdfs])
            # sanity: the gathered points match the mask we compare against
            for b in range(B):
                assert pruned[b].shape[0] == int(ref[b].sum())

        got = np.asarray(prune_mask(jnp.asarray(pts),
                                    _dense_params(r, V, center), cuboid))
        np.testing.assert_array_equal(got, ref)


class TestIntersectionParity:
    def test_v2(self, rng):
        B, K, M = 3, 4, 128
        r, V, center = _random_params(rng, B, K)
        # overlapping primitives so the clamp branch is exercised
        center *= 0.3
        pts = rng.normal(scale=1.0, size=(B, M, 3)).astype(np.float32)

        ref = float(ref_cl.compute_intersection_loss_volume_2(
            _to_ref_params(r, V, center), torch.tensor(pts)))
        got = float(intersection_loss_v2(_dense_params(r, V, center),
                                         jnp.asarray(pts)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)

    def test_v4(self, rng):
        B, K, M = 3, 4, 128
        r, V, center = _random_params(rng, B, K)
        center *= 0.3
        pts = rng.normal(scale=1.0, size=(B, M, 3)).astype(np.float32)

        ref = float(ref_cl.compute_intersection_loss_volume_4(
            _to_ref_params(r, V, center), torch.tensor(pts)))
        got = float(intersection_loss_v4(_dense_params(r, V, center),
                                         jnp.asarray(pts)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def _match_columns(got, ref):
    """Bijective column matching between two [N, K] weight matrices.

    Converged mean-shift modes form numerically-identical clumps; WHICH
    clump member gets elected cluster representative is pure argmin/argmax
    tie-breaking over ~equal f32 values, so the reference's np.unique slot
    order is not reproducible across frameworks (verified: same center
    vectors, different mode ids).  Every downstream consumer (fit ->
    min-over-primitives chamfer/intersection) is permutation-invariant, so
    the meaningful parity statement is equality up to a column permutation.

    Returns perm with got[:, perm[j]] ~ ref[:, j]; asserts the match is a
    clean bijection (cosine > 0.99).
    """
    gn = got / (np.linalg.norm(got, axis=0, keepdims=True) + 1e-12)
    rn = ref / (np.linalg.norm(ref, axis=0, keepdims=True) + 1e-12)
    sim = gn.T @ rn                                   # [K, K]
    perm = np.argmax(sim, axis=0)
    assert len(set(perm.tolist())) == len(perm), "no clean column bijection"
    assert (sim[perm, np.arange(len(perm))] > 0.99).all()
    return perm


class TestClusteringDriverParity:
    """Oracle `clustering` (src/ellipsoid_utils.py:31-73): the membership
    WEIGHTS the fit consumes, not just cluster counts."""

    @pytest.fixture
    def emb(self, rng):
        # structured embeddings (blobs on the sphere) so clustering finds
        # a stable handful of modes
        B, N, D, G = 2, 128, 16, 4
        protos = rng.normal(size=(B, G, D))
        assign = rng.integers(0, G, size=(B, N))
        X = protos[np.arange(B)[:, None], assign] \
            + 0.15 * rng.normal(size=(B, N, D))
        X = X.astype(np.float32)
        return X / np.linalg.norm(X, axis=2, keepdims=True)

    def test_weights_match(self, emb):
        B, N, _ = emb.shape
        with torch.no_grad():
            ref_w, ref_labels = ref_eu.clustering(
                torch.tensor(emb), num_samples=N, quantile=0.1,
                iterations=5, max_num_clusters=25)

        res = cluster_batch(jnp.asarray(emb), quantile=0.1, iterations=5,
                            max_num_clusters=25, num_candidates=2)
        for b in range(B):
            k_ref = ref_w[b].shape[1]
            valid = np.asarray(res.valid[b])
            assert int(valid.sum()) == k_ref
            got = np.asarray(res.weights[b])[:, valid]       # [N, K_b]
            ref = ref_w[b].numpy()
            perm = _match_columns(got, ref)
            np.testing.assert_allclose(got[:, perm], ref, atol=1e-4)

    def test_chained_into_fitting(self, emb, rng, monkeypatch):
        """clustering -> weighted_ellipsoid_fitting_batch, both stacks fed
        identical inputs end-to-end (the full self-sup fit path minus
        primitive sampling)."""
        monkeypatch.setattr(torch, "rand",
                            lambda *a, **k: torch.zeros(*a))  # reference's
        # SVD-convergence noise (ellipsoid_fitting.py:38) pinned to zero
        B, N, _ = emb.shape
        pts = rng.normal(scale=2.0, size=(B, N, 3)).astype(np.float32)

        with torch.no_grad():
            ref_w, _ = ref_eu.clustering(torch.tensor(emb), num_samples=N,
                                         quantile=0.1, iterations=5,
                                         max_num_clusters=25)
            ref_params = ref_ef.weighted_ellipsoid_fitting_batch(
                torch.tensor(pts), ref_w)

        res = cluster_batch(jnp.asarray(emb), quantile=0.1, iterations=5,
                            max_num_clusters=25, num_candidates=2)
        got = fit_ellipsoids_batch(jnp.asarray(pts), res.weights, res.valid)

        for b in range(B):
            slot_valid = np.asarray(res.valid[b])
            valid_idx = np.flatnonzero(np.asarray(got.valid[b]))
            # all clusters survive the cond check on this data
            assert len(valid_idx) == len(ref_params[b]) \
                == int(slot_valid.sum()) == ref_w[b].shape[1]
            ours_w = np.asarray(res.weights[b])[:, slot_valid]
            perm = _match_columns(ours_w, ref_w[b].numpy())
            for j, (s_ref, v_ref, c_ref) in enumerate(ref_params[b]):
                k = valid_idx[perm[j]]
                np.testing.assert_allclose(np.asarray(got.r[b, k]),
                                           s_ref.numpy(), atol=2e-3)
                np.testing.assert_allclose(np.asarray(got.center[b, k]),
                                           c_ref.numpy(), atol=2e-3)
                # eigenvector columns match up to sign
                dots = np.asarray(got.V[b, k]).T @ v_ref.numpy()
                np.testing.assert_allclose(np.abs(np.diag(dots)),
                                           np.ones(3), atol=5e-3)


class TestFittingParity:
    def test_fit_batch_values(self, rng, monkeypatch):
        monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a))
        B = 2
        pts_list, w_list = zip(*[_blob_cloud(rng) for _ in range(B)])
        pts = np.stack(pts_list)
        w = np.stack(w_list)

        with torch.no_grad():
            ref_params = ref_ef.weighted_ellipsoid_fitting_batch(
                torch.tensor(pts), [torch.tensor(w[b]) for b in range(B)])

        got = fit_ellipsoids_batch(jnp.asarray(pts), jnp.asarray(w))
        for b in range(B):
            valid_idx = np.flatnonzero(np.asarray(got.valid[b]))
            assert len(valid_idx) == len(ref_params[b])
            for i, k in enumerate(valid_idx):
                s_ref, v_ref, c_ref = ref_params[b][i]
                np.testing.assert_allclose(np.asarray(got.r[b, k]),
                                           s_ref.numpy(), atol=1e-4)
                np.testing.assert_allclose(np.asarray(got.center[b, k]),
                                           c_ref.numpy(), atol=1e-4)
                dots = np.asarray(got.V[b, k]).T @ v_ref.numpy()
                np.testing.assert_allclose(np.abs(np.diag(dots)),
                                           np.ones(3), atol=1e-3)

    def test_cond_number_rejection(self, rng, monkeypatch):
        """A collinear cluster trips the reference's S0/S2 > 1e5 drop
        (ellipsoid_fitting.py:41-47) and our valid=False the same way."""
        monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a))
        pts, w = _blob_cloud(rng, K=2)
        # third cluster: points on a line
        line = (np.linspace(0, 1, 64)[:, None]
                * np.array([[1.0, 2.0, 3.0]])).astype(np.float32)
        pts = np.concatenate([pts, line + 10.0])
        w = np.concatenate([np.pad(w, ((0, 0), (0, 1))),
                            np.pad(np.zeros((64, 2), np.float32),
                                   ((0, 0), (0, 1)), constant_values=1.0)])

        with torch.no_grad():
            ref_params = ref_ef.weighted_ellipsoid_fitting_batch(
                torch.tensor(pts[None]), [torch.tensor(w)])
        assert len(ref_params[0]) == 2  # collinear cluster dropped

        got = fit_ellipsoids_batch(jnp.asarray(pts[None]),
                                   jnp.asarray(w[None]))
        assert np.asarray(got.valid[0]).tolist() == [True, True, False]

    def test_gradients_through_fit_and_chamfer(self, rng, monkeypatch):
        """d(analytic_chamfer ∘ fit)/d(weights, points) — the actual
        self-sup training gradient — matches the reference's
        customsvd-backward chain."""
        monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a))
        pts_np, w_np = _blob_cloud(rng)
        tgt = rng.normal(scale=2.0, size=(1, 128, 3)).astype(np.float32)
        src = rng.normal(scale=2.0, size=(1, 96, 3)).astype(np.float32)

        pts_t = torch.tensor(pts_np[None], requires_grad=True)
        w_t = torch.tensor(w_np, requires_grad=True)
        ref_params = ref_ef.weighted_ellipsoid_fitting_batch(pts_t, [w_t])
        assert len(ref_params[0]) == w_np.shape[1]
        ref_analytic_chamfer(ref_params, [torch.tensor(src[0])],
                             torch.tensor(tgt)).backward()
        ref_gw, ref_gp = w_t.grad.numpy(), pts_t.grad.numpy()

        def f(w, p):
            params = fit_ellipsoids_batch(p, w)
            return analytic_chamfer(params, jnp.asarray(src),
                                    jnp.ones((1, 96), jnp.float32),
                                    jnp.asarray(tgt))

        got_gw, got_gp = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(w_np[None]), jnp.asarray(pts_np[None]))
        scale = max(np.abs(ref_gw).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got_gw[0]), ref_gw,
                                   atol=2e-3 * scale)
        scale_p = max(np.abs(ref_gp).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got_gp), ref_gp,
                                   atol=2e-3 * scale_p)


class TestOrchestratorParity:
    """End-to-end `convex_loss` orchestrator oracle (convex_loss.py:27-103)
    in evaluation mode — the one configuration that exercises the
    reference's full normalize -> entropy -> clustering -> fitting
    composition without its trimesh-only sampling stage (patched to
    return no samples; `evaluation=True` zeroes the chamfer term exactly
    as the reference does at :84-94)."""

    def test_eval_mode_total_and_params(self, rng, monkeypatch):
        B, N, D, G = 2, 128, 16, 4
        protos = rng.normal(size=(B, G, D))
        assign = rng.integers(0, G, size=(B, N))
        X = (protos[np.arange(B)[:, None], assign]
             + 0.15 * rng.normal(size=(B, N, D))).astype(np.float32)
        pts = rng.normal(scale=2.0, size=(B, N, 3)).astype(np.float32)
        beta = 0.7

        # deterministic N/4 entropy subsample: every 4th point, matching
        # our key=None path (geometry/convex_loss.py:94)
        monkeypatch.setattr(
            np.random, "choice",
            lambda a, size, replace=True: np.arange(0, a, 4)[:size])
        monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a))
        monkeypatch.setattr(ref_cl, "sample_from_pred_params",
                            lambda params, n, **k: [-1] * len(params))

        with torch.no_grad():
            ref_total, ref_l, ref_params, ref_labels = ref_cl.convex_loss(
                torch.tensor(np.swapaxes(pts, 1, 2)),     # [B, 3, N]
                torch.tensor(np.swapaxes(pts, 1, 2)),
                torch.tensor(np.swapaxes(X, 1, 2)),       # [B, D, N]
                quantile=0.1, iterations=5, max_num_clusters=25,
                include_entropy_loss=True, beta=beta, evaluation=True)

        from prifit_tpu.geometry.convex_loss import convex_loss

        out = convex_loss(jnp.asarray(pts), jnp.asarray(pts),
                          jnp.asarray(X), quantile=0.1, iterations=5,
                          max_num_clusters=25, n_per_prim=8,
                          include_entropy_loss=True, beta=beta,
                          evaluation=True, key=None)

        assert float(out.chamfer) == 0.0 and float(ref_l) == 0.0
        np.testing.assert_allclose(float(out.total), float(ref_total),
                                   rtol=1e-4, atol=1e-6)

        # fitted primitives agree end-to-end through the orchestrator
        # (up to the representative tie-break column permutation)
        weights = np.asarray(out.clusters.weights)
        for b in range(B):
            valid = np.asarray(out.clusters.valid[b])
            fit_valid = np.flatnonzero(np.asarray(out.params.valid[b]))
            assert len(ref_params[b]) == len(fit_valid)
            # match our slots to reference clusters via fitted centers
            ref_centers = np.stack([p[2].numpy() for p in ref_params[b]])
            ours_centers = np.asarray(out.params.center[b])[fit_valid]
            d = np.linalg.norm(ours_centers[:, None] - ref_centers[None],
                               axis=-1)
            perm = np.argmin(d, axis=0)
            assert len(set(perm.tolist())) == len(perm)
            for j, (s_ref, v_ref, c_ref) in enumerate(ref_params[b]):
                k = fit_valid[perm[j]]
                np.testing.assert_allclose(
                    np.asarray(out.params.r[b, k]), s_ref.numpy(),
                    atol=2e-3)
                np.testing.assert_allclose(
                    np.asarray(out.params.center[b, k]), c_ref.numpy(),
                    atol=2e-3)

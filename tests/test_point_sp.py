"""Point-axis sequence parallelism (parallel/point_sp.py) vs the
unsharded pipeline on a 2x4 (data, points) CPU mesh.

Slot order depends on argmin tie-breaks among numerically-identical
converged modes (accumulation order differs between the ring and the
single-device matmul), so comparisons match columns first — downstream
losses are permutation-invariant (see test_subsystem_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.clustering.mean_shift import cluster_batch
from prifit_tpu.geometry.fitting import fit_ellipsoids_batch
from prifit_tpu.parallel.point_sp import (
    cluster_and_fit_point_sharded,
    make_dp_sp_mesh,
)


def _blob_embeddings(rng, B=2, N=128, D=16, G=4):
    protos = rng.normal(size=(B, G, D))
    assign = rng.integers(0, G, size=(B, N))
    X = (protos[np.arange(B)[:, None], assign]
         + 0.15 * rng.normal(size=(B, N, D))).astype(np.float32)
    return X / np.linalg.norm(X, axis=2, keepdims=True)


def _match(gw, rw):
    gn = gw / (np.linalg.norm(gw, axis=0, keepdims=True) + 1e-12)
    rn = rw / (np.linalg.norm(rw, axis=0, keepdims=True) + 1e-12)
    perm = np.argmax(gn.T @ rn, axis=0)
    assert len(set(perm.tolist())) == len(perm)
    return perm


@pytest.fixture
def data(rng):
    X = _blob_embeddings(rng)
    pts = rng.normal(scale=2.0, size=(2, 128, 3)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(pts)


KW = dict(quantile=0.1, iterations=5, max_num_clusters=25)


class TestPointSharded:
    def test_cluster_and_fit_match_unsharded(self, data):
        X, pts = data
        mesh = make_dp_sp_mesh(2, 4)
        res, params = cluster_and_fit_point_sharded(X, pts, mesh=mesh,
                                                    **KW)
        ref = cluster_batch(X, num_candidates=1, **KW)
        ref_fit = fit_ellipsoids_batch(pts, ref.weights, ref.valid)

        np.testing.assert_array_equal(np.asarray(res.num_clusters),
                                      np.asarray(ref.num_clusters))
        np.testing.assert_allclose(np.asarray(res.bandwidth),
                                   np.asarray(ref.bandwidth), rtol=1e-6)
        for b in range(X.shape[0]):
            gv = np.asarray(res.valid[b])
            rv = np.asarray(ref.valid[b])
            assert gv.sum() == rv.sum()
            gw = np.asarray(res.weights[b])[:, gv]
            rw = np.asarray(ref.weights[b])[:, rv]
            perm = _match(gw, rw)
            np.testing.assert_allclose(gw[:, perm], rw, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(params.r[b])[gv][perm],
                np.asarray(ref_fit.r[b])[rv], atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(params.center[b])[gv][perm],
                np.asarray(ref_fit.center[b])[rv], atol=1e-4)
            # labels agree after slot relabeling
            gl = np.asarray(res.labels[b])
            rl = np.asarray(ref.labels[b])
            gidx = np.flatnonzero(gv)
            ridx = np.flatnonzero(rv)
            relabel = {int(gidx[perm[j]]): int(ridx[j])
                       for j in range(len(perm))}
            np.testing.assert_array_equal(
                np.vectorize(relabel.get)(gl), rl)

    def test_gradients_match_unsharded(self, data):
        """d(loss)/d(points, X) through ring mean-shift -> membership ->
        psum fit equals the single-device chain (the loss is slot-
        permutation invariant)."""
        X, pts = data
        mesh = make_dp_sp_mesh(2, 4)

        def loss_sp(x, p):
            _, params = cluster_and_fit_point_sharded(x, p, mesh=mesh,
                                                      **KW)
            m = params.valid.astype(jnp.float32)
            return (jnp.sum(params.r * m[..., None])
                    + jnp.sum(params.center ** 2 * m[..., None]))

        def loss_ref(x, p):
            res = cluster_batch(x, num_candidates=1, **KW)
            params = fit_ellipsoids_batch(p, res.weights, res.valid)
            m = params.valid.astype(jnp.float32)
            return (jnp.sum(params.r * m[..., None])
                    + jnp.sum(params.center ** 2 * m[..., None]))

        g_sp = jax.grad(loss_sp, argnums=(0, 1))(X, pts)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(X, pts)
        # X-gradients traverse 5 iterations of the mean-shift map, where
        # ring-vs-matmul f32 accumulation-order differences amplify;
        # require direction agreement plus a loose elementwise band there,
        # tight agreement for the direct (points) gradient
        for gs, gr, atol_f in zip(g_sp, g_ref, (5e-2, 3e-3)):
            gs, gr = np.asarray(gs), np.asarray(gr)
            cos = (gs * gr).sum() / (
                np.linalg.norm(gs) * np.linalg.norm(gr) + 1e-12)
            assert cos > 0.999, f"gradient direction diverged: {cos}"
            scale = max(float(np.abs(gr).max()), 1e-6)
            np.testing.assert_allclose(gs, gr, atol=atol_f * scale)

    def test_pure_sp_mesh(self, rng):
        """1 x 8 mesh: all devices on the point axis."""
        X = jnp.asarray(_blob_embeddings(rng, B=1, N=256))
        pts = jnp.asarray(
            rng.normal(scale=2.0, size=(1, 256, 3)).astype(np.float32))
        mesh = make_dp_sp_mesh(1, 8)
        res, params = cluster_and_fit_point_sharded(X, pts, mesh=mesh,
                                                    **KW)
        assert np.isfinite(np.asarray(params.r)).all()
        assert int(res.num_clusters[0]) >= 1

    def test_bandwidth_subsample_cap(self, data):
        """Capped bandwidth subsample still yields a working pipeline
        (the documented large-N mode)."""
        X, pts = data
        mesh = make_dp_sp_mesh(2, 4)
        res, _ = cluster_and_fit_point_sharded(
            X, pts, mesh=mesh, bandwidth_samples=64, **KW)
        assert np.isfinite(np.asarray(res.bandwidth)).all()
        assert (np.asarray(res.num_clusters) >= 1).all()


class TestShardedConvexLoss:
    def test_loss_matches_unsharded(self, data):
        """Full SP fit loss (ring cluster -> psum fit -> sharded chamfer)
        equals the unsharded pipeline — the scalar is slot-permutation
        invariant."""
        from prifit_tpu.geometry.losses import analytic_chamfer
        from prifit_tpu.geometry.sampling import sample_primitives_batch
        from prifit_tpu.parallel.point_sp import (
            convex_fit_loss_point_sharded,
        )

        X, pts = data
        rng = np.random.default_rng(7)
        target = jnp.asarray(
            rng.normal(scale=2.0, size=(2, 256, 3)).astype(np.float32))
        mesh = make_dp_sp_mesh(2, 4)

        loss_sp, params_sp = convex_fit_loss_point_sharded(
            X, pts, target, mesh=mesh, n_per_prim=16, **KW)

        res = cluster_batch(X, num_candidates=1, **KW)
        params = fit_ellipsoids_batch(pts, res.weights, res.valid)
        samples, w = sample_primitives_batch(params, n_per_prim=16)
        loss_ref = analytic_chamfer(params, samples, w, target)

        np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                                   rtol=2e-4)
        assert np.isfinite(np.asarray(params_sp.r)).all()

    def test_loss_gradient_matches(self, data):
        from prifit_tpu.geometry.losses import analytic_chamfer
        from prifit_tpu.geometry.sampling import sample_primitives_batch
        from prifit_tpu.parallel.point_sp import (
            convex_fit_loss_point_sharded,
        )

        X, pts = data
        rng = np.random.default_rng(7)
        target = jnp.asarray(
            rng.normal(scale=2.0, size=(2, 256, 3)).astype(np.float32))
        mesh = make_dp_sp_mesh(2, 4)

        def f_sp(p):
            loss, _ = convex_fit_loss_point_sharded(
                X, p, target, mesh=mesh, n_per_prim=16, **KW)
            return loss

        def f_ref(p):
            res = cluster_batch(X, num_candidates=1, **KW)
            params = fit_ellipsoids_batch(p, res.weights, res.valid)
            samples, w = sample_primitives_batch(params, n_per_prim=16)
            return analytic_chamfer(params, samples, w, target)

        g_sp = np.asarray(jax.grad(f_sp)(pts))
        g_ref = np.asarray(jax.grad(f_ref)(pts))
        scale = max(float(np.abs(g_ref).max()), 1e-6)
        np.testing.assert_allclose(g_sp, g_ref, atol=3e-3 * scale)

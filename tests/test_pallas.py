"""Pallas kernel tests (interpreter mode on CPU; bit-parity vs jnp refs)."""

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.ops.pallas.fps import farthest_point_sample_pallas
from prifit_tpu.ops.pallas.mean_shift import (
    _ref_step,
    mean_shift_step_pallas,
    supports_pallas,
)
from prifit_tpu.ops.sampling import farthest_point_sample


class TestPallasFPS:
    def test_matches_scan_version(self, rng):
        pts = jnp.asarray(rng.normal(size=(3, 256, 3)), jnp.float32)
        ref = farthest_point_sample(pts, 32, deterministic=True)
        pal = farthest_point_sample_pallas(pts, 32, deterministic=True,
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))

    def test_random_start_matches(self, rng):
        pts = jnp.asarray(rng.normal(size=(2, 128, 3)), jnp.float32)
        key = jax.random.PRNGKey(7)
        ref = farthest_point_sample(pts, 16, key=key)
        pal = farthest_point_sample_pallas(pts, 16, key=key,
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))


class TestPallasMeanShift:
    def test_matches_reference_step(self, rng):
        N, D = 256, 128
        X = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        bw2 = jnp.float32(0.3)
        ref = _ref_step(X, X, bw2)
        pal = mean_shift_step_pallas(X, X, bw2, True)
        # kernel matmuls take bf16 operands (identical on TPU where the
        # MXU consumes bf16 anyway; interpret mode on CPU really rounds)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   atol=5e-3)

    def test_gradient_matches_reference(self, rng):
        N, D = 256, 128
        X = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        bw2 = jnp.float32(0.3)

        g_pal = jax.grad(lambda x: jnp.sum(
            mean_shift_step_pallas(x, x, bw2, True) ** 2))(X)
        g_ref = jax.grad(lambda x: jnp.sum(
            _ref_step(x, x, bw2) ** 2))(X)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=2e-2)

    def test_supports_gate(self):
        assert supports_pallas(2048, 128)
        assert not supports_pallas(100, 128)
        assert not supports_pallas(2048, 96)

    def test_backward_clamp_cutoff(self, rng):
        """Gradients are zeroed exactly where guard_exp clamps — the
        where-mask must survive the hoisted-reciprocal epilogue (the
        3-call backward folds 1/s and c/(s*bw^2) into row statistics).

        Two antipodal blobs at bw2=0.15: cross-blob sims ~= -1 give
        exponents ~ -13.3 < _CLAMP_LO (clamped, zero gradient), in-blob
        sims ~= 1 stay live.  The reference rounds matmul operands to
        bf16 like the kernel does (interpret mode really rounds) so the
        two sides compute the same clamp mask; pathological bandwidths
        (bw2 << 0.01, where 1/bw2 amplifies bf16 rounding of the
        COTANGENT beyond any tolerance) are floored upstream by the
        clustering bandwidth guard and not a kernel contract."""
        N, D = 256, 128
        c = rng.normal(size=(1, D))
        blob = c + 0.05 * rng.normal(size=(N // 2, D))
        X = jnp.asarray(np.concatenate([blob, -blob]), jnp.float32)
        X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        bw2 = jnp.float32(0.15)

        def ref(x):
            xb = x.astype(jnp.bfloat16).astype(jnp.float32)
            return _ref_step(xb, xb, bw2)

        # sanity: the regime really exercises both sides of the clamp
        sim = np.asarray(X @ X.T)
        expo = (sim - 1.0) / 0.15
        assert (expo < -13.0).any() and (expo > -13.0).any()

        g_pal = jax.grad(lambda x: jnp.sum(
            mean_shift_step_pallas(x, x, bw2, True) ** 2))(X)
        g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(X)
        assert np.isfinite(np.asarray(g_pal)).all()
        scale = float(np.max(np.abs(np.asarray(g_ref)))) + 1e-12
        np.testing.assert_allclose(np.asarray(g_pal) / scale,
                                   np.asarray(g_ref) / scale, atol=2e-2)


class TestPallasBandwidth:
    def test_matches_bisect(self, rng):
        import jax.numpy as jnp
        from prifit_tpu.clustering.mean_shift import (
            _chordal_sqdist,
            _kth_smallest_bisect,
        )
        from prifit_tpu.ops.pallas.bandwidth import kth_nn_distance_pallas

        X = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
        X = X / jnp.linalg.norm(X, axis=1, keepdims=True)
        # the kernel's matmul takes bf16 operands — the same rounding the
        # jnp fallback's default-precision matmul applies on TPU; the CPU
        # oracle must round explicitly to compare at tight tolerance
        Xb = X.astype(jnp.bfloat16)
        dist = 2.0 - 2.0 * jnp.matmul(Xb, Xb.T,
                                      preferred_element_type=jnp.float32)
        ref = _kth_smallest_bisect(dist, [13, 26])
        got = kth_nn_distance_pallas(X, (13, 26), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


class TestGuardExpParity:
    def test_tiny_bandwidth_no_nan(self, rng):
        """Collapsed embeddings + floored bandwidth (bw2 ~ 1e-6) must not
        overflow: guard_exp clips the exponent on BOTH sides."""
        import jax
        N, D = 256, 128
        X = jnp.ones((N, D)) / jnp.sqrt(float(D))  # identical embeddings
        bw2 = jnp.float32(1e-6)
        out = mean_shift_step_pallas(X, X, bw2, True)
        assert np.all(np.isfinite(np.asarray(out)))
        g = jax.grad(lambda x: jnp.sum(
            mean_shift_step_pallas(x, x, bw2, True) ** 2))(X)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPallasGather:
    def test_forward_bit_exact(self, rng):
        import jax.numpy as jnp
        from prifit_tpu.ops.pallas.gather import gather_rows_pallas

        B, N, C, R = 3, 256, 5, 600      # R % N != 0, odd C
        pts = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)
        out = gather_rows_pallas(pts, idx, interpret=True)
        ref = np.stack([np.asarray(pts)[b][np.asarray(idx)[b]]
                        for b in range(B)])
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_backward_matches_scatter_add(self, rng):
        import jax
        import jax.numpy as jnp
        import prifit_tpu.ops.pallas.gather as G
        from prifit_tpu.ops.sampling import index_points

        B, N, C = 3, 256, 5
        pts = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(B, 60, 10)), jnp.int32)
        orig = G.gather_rows_pallas
        G.gather_rows_pallas = \
            lambda p, i, interpret=False: orig(p, i, interpret=True)
        try:
            g1 = jax.grad(
                lambda p: jnp.sum(G.index_points_dg(p, idx) ** 2))(pts)
        finally:
            G.gather_rows_pallas = orig
        g2 = jax.grad(
            lambda p: jnp.sum(index_points(p, idx) ** 2))(pts)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4)


class TestPallasNMS:
    def _oracle(self, modes, bw, K):
        """jnp NMS passes on a bf16-rounded distance matrix — the same
        operand rounding the kernel's (and TPU XLA's default-precision)
        matmul applies."""
        mb = modes.astype(jnp.bfloat16)
        dist = 2.0 - 2.0 * jnp.matmul(mb, mb.T,
                                      preferred_element_type=jnp.float32)
        N = modes.shape[0]
        iota = jnp.arange(N)
        assign = jnp.argmin(dist, axis=-1)
        counts = jnp.sum((assign[:, None] == iota[None, :])
                         .astype(jnp.float32), axis=0)
        occupied = counts > 0
        nbrs = (dist < bw).astype(jnp.float32)
        rep = jnp.argmax(nbrs * counts[None, :], axis=1)
        is_center = jnp.any((rep[:, None] == iota[None, :]) &
                            occupied[:, None], axis=0)
        masked = jnp.where(is_center[None, :], dist, jnp.inf)
        label = jnp.argmin(masked, axis=-1)
        used = jnp.any(label[:, None] == iota[None, :], axis=0)
        return counts, is_center, used

    def test_passes_match_jnp(self, rng):
        from prifit_tpu.ops.pallas.nms import nms_passes_pallas

        N, D = 256, 128
        # clustered modes: k well-separated anchors + tiny jitter, like
        # converged mean-shift output
        anchors = rng.normal(size=(7, D))
        pts = anchors[rng.integers(0, 7, N)] + 1e-4 * rng.normal(
            size=(N, D))
        modes = jnp.asarray(pts, jnp.float32)
        modes = modes / jnp.linalg.norm(modes, axis=1, keepdims=True)
        bw = jnp.float32(0.35)
        counts, is_center, used = nms_passes_pallas(modes, bw,
                                                    interpret=True)
        rc, ric, ru = self._oracle(modes, bw, 25)
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(rc))
        np.testing.assert_array_equal(np.asarray(is_center),
                                      np.asarray(ric))
        np.testing.assert_array_equal(np.asarray(used), np.asarray(ru))

    def test_supports_gate(self):
        from prifit_tpu.ops.pallas.nms import supports_nms_pallas
        assert supports_nms_pallas(2048, 128)
        assert not supports_nms_pallas(100, 128)

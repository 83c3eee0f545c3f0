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
        ref = _kth_smallest_bisect(_chordal_sqdist(X, X), [13, 26])
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


class TestFusedSAScale:
    """Fused eval-mode SA scale kernel (ops/pallas/fused_sa.py)."""

    def _inputs(self, rng, N, K, S, widths, B=2):
        F1 = widths[0]
        pre = jnp.asarray(rng.normal(size=(B, N, F1)), jnp.float32)
        cen = jnp.asarray(rng.normal(size=(B, S, F1)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
        ws = [jnp.asarray(rng.normal(size=(a, b)) * 0.1, jnp.float32)
              for a, b in zip(widths[:-1], widths[1:])]
        bs = [jnp.asarray(rng.normal(size=(b,)) * 0.1, jnp.float32)
              for b in widths[1:]]
        return pre, cen, idx, ws, bs

    def test_matches_reference_all_scales(self, rng):
        from prifit_tpu.ops.pallas import fused_sa as F
        # the flagship sa1/sa2 scale shapes (at reduced B)
        for N, K, S, widths in [(2048, 32, 512, [32, 32, 64]),
                                (2048, 64, 512, [64, 64, 128]),
                                (2048, 128, 512, [64, 96, 128]),
                                (512, 64, 128, [128, 128, 256]),
                                (512, 128, 128, [128, 196, 256])]:
            assert F.has_fused_plan(N, K, S, widths)
            pre, cen, idx, ws, bs = self._inputs(rng, N, K, S, widths, B=1)
            out_k = np.asarray(
                F.fused_sa_scale(pre, cen, idx, ws, bs, interpret=True))
            out_r = np.asarray(
                F.fused_sa_scale_reference(pre, cen, idx, ws, bs))
            # identical ops modulo f32 accumulation order; near ReLU /
            # max-over-K decision boundaries a reassociated sum can flip
            # the branch, so allow a vanishing fraction of outliers
            # (on real TPU both paths are bit-identical — verified on
            # chip 2026-08-17, max |diff| = 0.0)
            err = np.abs(out_k - out_r)
            tol = 5e-4 + 1e-5 * np.abs(out_r)
            frac = float((err > tol).mean())
            assert frac < 5e-4, (frac, float(err.max()))
            assert float(err.max()) < 0.05

    def test_sa_msg_module_dispatch(self, rng):
        from prifit_tpu.nn.pointnet2 import SetAbstractionMsg
        B, N = 2, 512
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        args = dict(npoint=128, radius_list=[0.1, 0.2, 0.4],
                    nsample_list=[32, 64, 128],
                    mlp_list=[[32, 32, 64], [64, 64, 128], [64, 96, 128]])
        mod_j = SetAbstractionMsg(**args, sa_eval_kernel="off")
        mod_k = SetAbstractionMsg(**args, sa_eval_kernel="interpret")
        v = mod_j.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1)}, xyz, xyz, True)
        new_xyz_j, out_j = mod_j.apply(v, xyz, xyz, False)
        new_xyz_k, out_k = mod_k.apply(v, xyz, xyz, False)
        np.testing.assert_array_equal(np.asarray(new_xyz_j),
                                      np.asarray(new_xyz_k))
        # kernel rounds matmul operands to bf16 (the TPU default-precision
        # class); CPU jnp path computes exact f32 -> ~0.5% relative
        scale = float(jnp.max(jnp.abs(out_j)))
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_j),
                                   atol=0.02 * scale)

    def test_model_eval_forward_dispatch(self, rng):
        from prifit_tpu.models.pointnet2_part_seg_msg import get_model
        B, N = 2, 256
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        cls = jnp.zeros((B, 16), jnp.float32).at[:, 0].set(1.0)
        m_off = get_model(num_parts=50, sa_eval_kernel="off")
        m_int = get_model(num_parts=50, sa_eval_kernel="interpret")
        v = m_off.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)}, xyz, cls,
                       train=False)
        out_off = m_off.apply(v, xyz, cls, train=False)
        out_int = m_int.apply(v, xyz, cls, train=False)
        probs_off = np.exp(np.asarray(out_off.seg_logits))
        probs_int = np.exp(np.asarray(out_int.seg_logits))
        np.testing.assert_allclose(probs_int, probs_off, atol=0.03)

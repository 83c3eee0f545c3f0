"""nn/mixed.py — bf16-storage / f32-cotangent (mx) region tests.

The oracle for the hand-derived backward is autodiff of an f32 emulation
of the same bf16 forward (straight-through rounding, fq-style): that
graph's gradients ARE the f32 cotangents mx must produce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.nn import pointnet2 as pn2
from prifit_tpu.nn.mixed import MX, mx_chain


def _rt(x):
    """Straight-through bf16 value rounding (test-side fq emulator)."""
    x = jnp.asarray(x, jnp.float32)
    r = x.astype(jnp.bfloat16).astype(jnp.float32)
    return x + jax.lax.stop_gradient(r - x)


def _ref_layer(x, w, b, scale, bias, eps=1e-5):
    """f32 emulation of mixed._layer_fwd (values match bf16 arithmetic,
    gradients are exact f32): z = x @ w in bf16, explicit BN stats over
    z (f32 reductions), bf16 scale/shift + relu.  The dense bias is
    skipped in the pre-activation (BN mean subtraction cancels it) and
    only shifts the reported running mean."""
    xr = _rt(x)
    z = _rt(xr @ _rt(w))
    mean = jnp.mean(z, axis=0)
    var = jnp.maximum(jnp.mean(z ** 2, axis=0) - mean ** 2, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = _rt(scale * inv)
    c = _rt(bias - mean * scale * inv)
    return jax.nn.relu(_rt(z * a + c)), (mean + b, var)


def _ref_chain(pre, params, has_pre_bn, has_max, eps=1e-5):
    pre_bn, chain = params
    shape = pre.shape
    x = _rt(pre).reshape(-1, shape[-1])
    if has_pre_bn:
        scale, bias = pre_bn
        mean = jnp.mean(x, axis=0)
        var = jnp.maximum(jnp.mean(x ** 2, axis=0) - mean ** 2, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a = _rt(scale * inv)
        c = _rt(bias - mean * scale * inv)
        x = jax.nn.relu(_rt(x * a + c))
    for layer in chain:
        x, _ = _ref_layer(x, *layer)
    if has_max:
        B, S, K = shape[0], shape[1], shape[2]
        x = jnp.max(x.reshape(B * S, K, x.shape[-1]), axis=1)
        return x.reshape(B, S, -1)
    return x.reshape(*shape[:-1], x.shape[-1])


def _params(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    chain = []
    for k, (fi, fo) in zip(ks, zip(dims[:-1], dims[1:])):
        w = jax.random.normal(k, (fi, fo), jnp.float32) / np.sqrt(fi)
        chain.append((w, jnp.zeros((fo,)),
                      jnp.ones((fo,)), jnp.zeros((fo,))))
    return tuple(chain)


class TestMxChain:
    @pytest.mark.parametrize("has_pre_bn,has_max", [
        (True, True), (False, True), (False, False)])
    def test_matches_f32_emulation(self, has_pre_bn, has_max):
        key = jax.random.PRNGKey(0)
        B, S, K, F = 2, 8, 16, 24
        shape = (B, S, K, F) if has_max else (B, S * K, F)
        pre = jax.random.normal(key, shape, jnp.float32)
        chain = _params(jax.random.PRNGKey(1), [F, 32, 48])
        pre_bn = (jnp.ones((F,)) * 1.3, jnp.ones((F,)) * 0.1) \
            if has_pre_bn else None
        params = (pre_bn, chain)
        cfg = (has_pre_bn, has_max)

        out, stats = mx_chain(cfg, pre, params)
        ref = _ref_chain(pre, params, has_pre_bn, has_max)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

        # hand backward vs autodiff of the f32 emulation
        g_mx = jax.grad(lambda p, pr: jnp.sum(
            mx_chain(cfg, pr, p)[0] ** 2), argnums=(0, 1))(params, pre)
        g_ref = jax.grad(lambda p, pr: jnp.sum(
            _ref_chain(pr, p, has_pre_bn, has_max) ** 2),
            argnums=(0, 1))(params, pre)
        # relu/max masks can flip at bf16 decision boundaries where the
        # real-bf16 and emulated-f32 forwards round differently (the true
        # function is nonsmooth there), so compare statistically: high
        # cosine alignment and few outliers, not elementwise equality
        for a, b in zip(jax.tree_util.tree_leaves(g_mx),
                        jax.tree_util.tree_leaves(g_ref)):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            denom = np.linalg.norm(a) * np.linalg.norm(b)
            if denom < 1e-12:
                continue
            cos = float(a @ b / denom)
            assert cos > 0.995, cos
            scale_ref = max(np.abs(b).max(), 1e-3)
            frac_bad = np.mean(np.abs(a - b) > 0.05 * scale_ref)
            assert frac_bad < 0.08, frac_bad

    def test_stats_match_bf16_chain(self):
        """Region batch stats == explicit-chain stats of the same bf16
        values (up to accumulation order)."""
        key = jax.random.PRNGKey(2)
        pre = jax.random.normal(key, (4, 64, 16), jnp.float32)
        chain = _params(jax.random.PRNGKey(3), [16, 32])
        (_, stats) = mx_chain((False, False), pre, (None, chain))
        (mean, var), = stats
        xb = pre.astype(jnp.bfloat16).astype(jnp.float32).reshape(-1, 16)
        a = xb @ chain[0][0] + chain[0][1]
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(jnp.mean(a, 0)),
                                   atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(
            np.asarray(var),
            np.asarray(jnp.mean(a ** 2, 0) - jnp.mean(a, 0) ** 2),
            atol=1e-2, rtol=2e-2)


class TestMxModules:
    def test_sa_msg_mx_forward_tracks_bf16(self):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
        xyz = xyz / jnp.max(jnp.linalg.norm(xyz, axis=-1, keepdims=True),
                            axis=1, keepdims=True)
        key = jax.random.PRNGKey(0)

        def build(dt):
            return pn2.SetAbstractionMsg(
                64, [0.2, 0.4], [8, 16], [[16, 16, 32], [16, 24, 32]],
                dtype=dt)

        m_mx, m_bf = build(MX), build(jnp.bfloat16)
        v = m_mx.init({"params": key, "sampling": key}, xyz, None,
                      train=True)
        (_, o_mx), muts = m_mx.apply(v, xyz, None, train=True,
                                     rngs={"sampling": key},
                                     mutable=["batch_stats"])
        (_, o_bf), _ = m_bf.apply(v, xyz, None, train=True,
                                  rngs={"sampling": key},
                                  mutable=["batch_stats"])
        assert o_mx.dtype == jnp.float32
        # mx folds BN to z*a+c (bf16) while the explicit chain computes
        # (z-mean)*inv*scale+bias — different bf16 rounding can flip a
        # relu/max winner at a decision boundary, so allow a tiny
        # mismatch fraction rather than elementwise equality
        a = np.asarray(o_mx, np.float32)
        bref = np.asarray(o_bf, np.float32)
        bad = np.abs(a - bref) > (5e-2 + 5e-2 * np.abs(bref))
        assert np.mean(bad) < 1e-3, np.mean(bad)
        # running stats were written
        flat = jax.tree_util.tree_leaves(muts["batch_stats"])
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)

    def test_sa_msg_mx_grads_finite_f32(self):
        rng = np.random.default_rng(1)
        xyz = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
        xyz = xyz / jnp.max(jnp.linalg.norm(xyz, axis=-1, keepdims=True),
                            axis=1, keepdims=True)
        key = jax.random.PRNGKey(0)
        mod = pn2.SetAbstractionMsg(
            64, [0.2, 0.4], [8, 16], [[16, 16, 32], [16, 24, 32]],
            dtype=MX)
        v = mod.init({"params": key, "sampling": key}, xyz, None,
                     train=True)

        def loss(p):
            (_, out), _ = mod.apply({**v, "params": p}, xyz, None,
                                    train=True, rngs={"sampling": key},
                                    mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(x.dtype == jnp.float32 for x in leaves)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
        assert np.isfinite(total) and total > 0

    def test_model_level_mx_runs(self):
        from prifit_tpu.models import get_module
        mod = get_module("pointnet2_part_seg_msg")
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = jnp.zeros((2, 16), jnp.float32)
        model = mod.get_model(num_parts=50, compute_dtype="mx")
        v = model.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)},
                       pts, cls, train=True)

        def loss(p):
            out, _ = model.apply(
                {**v, "params": p}, pts, cls, train=True,
                rngs={"sampling": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.sum(out.seg_logits ** 2)

        g = jax.grad(loss)(v["params"])
        total = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0
        # eval mode runs through the bf16 fallback path
        o = model.apply(v, pts, cls, train=False)
        assert bool(jnp.isfinite(o.seg_logits).all())


class TestStochasticRounding:
    """mxsr: the mx region with stochastically-rounded bf16 cotangents."""

    @pytest.mark.parametrize("bits", ["hash", "threefry"])
    def test_sr_bf16_unbiased_and_exact(self, bits, monkeypatch):
        monkeypatch.setenv("PRIFIT_SR_BITS", bits)
        from prifit_tpu.nn.mixed import sr_bf16
        # exactly-representable values never move
        x = jnp.asarray([0.0, 1.0, -2.5, 3.141592e8], jnp.float32)
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        for s in range(4):
            y = sr_bf16(jax.random.PRNGKey(s), x)
            np.testing.assert_array_equal(np.asarray(y, np.float32),
                                          np.asarray(x, np.float32))
        # values strictly between grid points: mean over keys -> x
        # (1 + 1/3 ulp(bf16) should round up ~1/3 of the time)
        ulp = np.float32(jnp.asarray(1.0078125, jnp.bfloat16)) - 1.0
        x = jnp.full((4096,), 1.0 + ulp / 3, jnp.float32)
        ys = [np.asarray(sr_bf16(jax.random.PRNGKey(s), x), np.float32)
              for s in range(8)]
        frac_up = np.mean([np.mean(y > 1.0) for y in ys])
        assert 0.28 < frac_up < 0.39, frac_up
        mean = np.mean([y.mean() for y in ys])
        np.testing.assert_allclose(mean, 1.0 + ulp / 3, rtol=3e-4)
        assert sr_bf16(jax.random.PRNGKey(0), x).dtype == jnp.bfloat16

    def test_requires_key(self):
        pre = jnp.ones((2, 8, 4), jnp.float32)
        chain = _params(jax.random.PRNGKey(1), [4, 8])
        with pytest.raises(ValueError, match="rng key"):
            mx_chain((False, False, True), pre, (None, chain))

    @pytest.mark.parametrize("has_pre_bn,has_max", [
        (True, True), (False, False)])
    def test_forward_matches_mx(self, has_pre_bn, has_max):
        key = jax.random.PRNGKey(0)
        B, S, K, F = 2, 8, 16, 24
        shape = (B, S, K, F) if has_max else (B, S * K, F)
        pre = jax.random.normal(key, shape, jnp.float32)
        chain = _params(jax.random.PRNGKey(1), [F, 32, 48])
        pre_bn = (jnp.ones((F,)) * 1.3, jnp.ones((F,)) * 0.1) \
            if has_pre_bn else None
        params = (pre_bn, chain)
        out_mx, st_mx = mx_chain((has_pre_bn, has_max), pre, params)
        out_sr, st_sr = mx_chain((has_pre_bn, has_max, True), pre,
                                 params, key=jax.random.PRNGKey(7))
        # sr regions emit bf16 stage outputs (the inter-stage fabric
        # runs bf16 like the plain bf16 mode); values identical
        assert out_mx.dtype == jnp.float32
        assert out_sr.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out_mx), np.asarray(out_sr.astype(jnp.float32)))
        for a, b in zip(jax.tree_util.tree_leaves(st_mx),
                        jax.tree_util.tree_leaves(st_sr)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grads_unbiased(self, monkeypatch):
        """Mean over SR keys of the mxsr grads converges to the exact
        expectation: the SAME region code with ``sr_bf16`` patched to
        identity (the backward is linear in cotangents, so the
        rounding-free run IS ``E[grads]``; forward, masks and matmul
        operand values are bit-identical between oracle and draws).
        Deterministic bf16 cotangents (the ``bf16`` mode) keep a bias
        no amount of averaging removes — this is the property that
        motivates mxsr (STATUS.md round-3 bisection)."""
        from prifit_tpu.nn import mixed

        key = jax.random.PRNGKey(0)
        B, S, K, F = 2, 8, 16, 24
        pre = jax.random.normal(key, (B, S, K, F), jnp.float32)
        chain = _params(jax.random.PRNGKey(1), [F, 32, 48])
        pre_bn = (jnp.ones((F,)) * 1.3, jnp.ones((F,)) * 0.1)
        params = (pre_bn, chain)

        def gradfn(p, pr, k):
            return jax.grad(
                lambda p_, pr_: jnp.sum(mx_chain(
                    (True, True, True), pr_, p_,
                    key=k)[0].astype(jnp.float32) ** 2),
                argnums=(0, 1))(p, pr)

        monkeypatch.setattr(mixed, "sr_bf16", lambda k, x: x)
        g_exp = gradfn(params, pre, jax.random.PRNGKey(99))
        monkeypatch.undo()
        draws = [gradfn(params, pre, jax.random.PRNGKey(100 + s))
                 for s in range(24)]

        ref = [np.asarray(x, np.float64)
               for x in jax.tree_util.tree_leaves(g_exp)]
        mean = [np.mean([np.asarray(jax.tree_util.tree_leaves(d)[i],
                                    np.float64) for d in draws], axis=0)
                for i in range(len(ref))]
        one = [np.asarray(x, np.float64)
               for x in jax.tree_util.tree_leaves(draws[0])]
        for r, m, o in zip(ref, mean, one):
            nr = np.linalg.norm(r) + 1e-12
            err_mean = np.linalg.norm(m - r) / nr
            err_one = np.linalg.norm(o - r) / nr
            if err_one < 1e-7:      # leaf untouched by any rounding
                continue
            # unbiased => the 24-draw mean tightens ~1/sqrt(24) = 0.2x;
            # a biased cast could not beat ~1x
            assert err_mean < 0.45 * err_one, (err_mean, err_one)
            cos = float((m.ravel() @ r.ravel())
                        / (np.linalg.norm(m) * nr))
            assert cos > 0.999, cos

    def test_same_key_deterministic(self):
        pre = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 16))
        chain = _params(jax.random.PRNGKey(4), [16, 32])

        def g(k):
            return jax.grad(lambda pr: jnp.sum(mx_chain(
                (False, False, True), pr, (None, chain),
                key=k)[0].astype(jnp.float32) ** 2))(pre)

        a, b = g(jax.random.PRNGKey(5)), g(jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = g(jax.random.PRNGKey(6))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

    def test_model_level_mxsr_runs(self):
        from prifit_tpu.models import get_module
        mod = get_module("pointnet2_part_seg_msg")
        rng = np.random.default_rng(5)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = jnp.zeros((2, 16), jnp.float32)
        model = mod.get_model(num_parts=50, compute_dtype="mxsr")
        v = model.init({"params": jax.random.PRNGKey(0),
                        "sampling": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)},
                       pts, cls, train=True)

        def loss(p):
            out, _ = model.apply(
                {**v, "params": p}, pts, cls, train=True,
                rngs={"sampling": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.sum(out.seg_logits ** 2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(x.dtype == jnp.float32 for x in leaves)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
        assert np.isfinite(total) and total > 0
        o = model.apply(v, pts, cls, train=False)
        assert bool(jnp.isfinite(o.seg_logits).all())

    def test_bf16_pre_boundary(self):
        """mxsr with a bf16 stage input: identical forward values (the
        region casts to bf16 regardless), bf16 SR'd exit cotangent."""
        key = jax.random.PRNGKey(0)
        B, S, K, F = 2, 8, 16, 24
        pre = jax.random.normal(key, (B, S, K, F), jnp.float32)
        chain = _params(jax.random.PRNGKey(1), [F, 32, 48])
        pre_bn = (jnp.ones((F,)) * 1.3, jnp.ones((F,)) * 0.1)
        params = (pre_bn, chain)
        k = jax.random.PRNGKey(11)

        out32, st32 = mx_chain((True, True, True), pre, params, key=k)
        outbf, stbf = mx_chain((True, True, True),
                               pre.astype(jnp.bfloat16), params, key=k)
        np.testing.assert_array_equal(np.asarray(out32),
                                      np.asarray(outbf))
        for a, b in zip(jax.tree_util.tree_leaves(st32),
                        jax.tree_util.tree_leaves(stbf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(pr):
            out, _ = mx_chain((True, True, True), pr, params, key=k)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g32 = jax.grad(loss)(pre)
        gbf = jax.grad(loss)(pre.astype(jnp.bfloat16))
        assert g32.dtype == jnp.float32
        assert gbf.dtype == jnp.bfloat16
        # the bf16 exit cotangent is the SR rounding of the f32 one's
        # neighborhood: within one bf16 ulp elementwise
        a = np.asarray(g32, np.float64)
        b = np.asarray(gbf, np.float64)
        tol = np.abs(a) * 2.0 ** -7 + 1e-6
        assert np.mean(np.abs(a - b) > tol) < 0.02

    def test_axis_name_train_fallback_is_f32(self):
        """MX/MXSR with a cross-replica axis cannot run the region;
        the explicit-chain fallback must be f32 in TRAINING (the bf16
        chain would reintroduce the biased cotangents these modes
        exist to avoid) while eval keeps the cheap bf16 path."""
        from types import SimpleNamespace
        from prifit_tpu.nn.mixed import MXSR
        from prifit_tpu.nn.pointnet2 import _run_dtype

        m = SimpleNamespace(dtype=MXSR, axis_name="data")
        assert _run_dtype(m, True) is None
        assert _run_dtype(m, False) == jnp.bfloat16
        m2 = SimpleNamespace(dtype=MX, axis_name="data")
        assert _run_dtype(m2, True) is None
        m3 = SimpleNamespace(dtype=jnp.bfloat16, axis_name="data")
        assert _run_dtype(m3, True) == jnp.bfloat16
        m4 = SimpleNamespace(dtype=MXSR, axis_name=None)
        assert _run_dtype(m4, False) == jnp.bfloat16


class TestF32MaxRegion:
    """The f32-storage closed-form [last layer + K-max] region
    (``mx_chain(..., storage=jnp.float32)``) vs plain f32 autodiff."""

    def _autodiff(self, pre, params):
        B, S, K, F = pre.shape
        (w, b, scale, bias), = params
        z = pre.reshape(-1, F) @ w            # region skips +b (BN
        mean = jnp.mean(z, axis=0)            # mean absorbs it exactly
        var = jnp.maximum(jnp.mean(z ** 2, axis=0) - mean ** 2, 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = jax.nn.relu((z - mean) * inv * scale + bias)
        return jnp.max(y.reshape(B * S, K, -1), axis=1).reshape(B, S, -1)

    def test_forward_and_grads_match_autodiff(self):
        key = jax.random.PRNGKey(3)
        B, S, K, Fi, Fo = 2, 6, 5, 16, 24
        pre = jax.random.normal(key, (B, S, K, Fi), jnp.float32)
        params = _params(jax.random.fold_in(key, 1), (Fi, Fo))

        def region(pre, params):
            out, _ = mx_chain((False, True, False), pre, (None, params),
                              storage=jnp.float32)
            return out

        o1 = region(pre, params)
        o2 = self._autodiff(pre, params)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)

        def loss_r(pre, params):
            return jnp.sum(jnp.sin(region(pre, params)))

        def loss_a(pre, params):
            return jnp.sum(jnp.sin(self._autodiff(pre, params)))

        g1 = jax.grad(loss_r, argnums=(0, 1))(pre, params)
        g2 = jax.grad(loss_a, argnums=(0, 1))(pre, params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-4)

    def test_call_max_matches_fallback(self):
        """PointMLP.call_max with the opt-in region (PRIFIT_MAX_REGION=on)
        vs the default autodiff max-of-call path on the same train
        call."""
        import os
        from flax.core import freeze

        stack = pn2.PointMLP(features=(24, 32), d_in=16)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 5, 16),
                              jnp.float32)
        vs = stack.init({"params": jax.random.PRNGKey(0)}, x, True)

        def run(flag):
            os.environ["PRIFIT_MAX_REGION"] = flag
            try:
                out, _ = stack.apply(
                    vs, x, True, method=stack.call_max,
                    mutable=["batch_stats"])
            finally:
                os.environ.pop("PRIFIT_MAX_REGION", None)
            return out

        on, off = run("on"), run("off")
        np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                                   rtol=2e-5, atol=2e-5)

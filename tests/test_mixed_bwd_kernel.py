"""Fused mxsr layer-backward Pallas kernels vs the jnp hand backward.

Bit-compat strategy: the kernels replicate ``nn/mixed.py``'s SR bit
stream exactly (same counter hash over the same global linear index,
same folded keys), so on data where every f32 reduction is EXACT
(small-integer values, power-of-two BN stats — partial sums of binary
fractions are order-independent) the fused backward must match the jnp
path bit for bit, SR included.  Float-data tests then bound the
reduction-order noise, and a region-level test drives the real
``mx_chain`` wiring through ``PRIFIT_MXSR_KERNEL=interpret``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.nn.mixed import MXDT, _layer_bwd, bf16_affine, sr_bf16
from prifit_tpu.ops.pallas.mixed_bwd import (
    layer_bwd_max_pallas,
    layer_bwd_pallas,
    supports_layer_bwd,
    supports_layer_bwd_max,
)


def _int_layer(rng, n, fi, fo, float_data=False):
    """Residuals + cotangent; integer-grid unless ``float_data``."""
    def arr(shape, lo, hi, dtype):
        if float_data:
            return jnp.asarray(rng.normal(size=shape), jnp.float32) \
                .astype(dtype)
        return jnp.asarray(rng.integers(lo, hi, shape), jnp.float32) \
            .astype(dtype)

    xf = arr((n, fi), -3, 4, MXDT)
    w = arr((fi, fo), -2, 3, jnp.float32)
    z = arr((n, fo), -4, 5, MXDT)
    g = arr((n, fo), -3, 4, MXDT)
    a = arr((fo,), 1, 3, MXDT)
    c = arr((fo,), -1, 2, MXDT)
    if float_data:
        scale = jnp.asarray(rng.normal(size=fo), jnp.float32)
        mean = jnp.asarray(rng.normal(size=fo), jnp.float32)
        inv = jnp.asarray(np.abs(rng.normal(size=fo)) + 0.1, jnp.float32)
    else:
        scale = jnp.asarray(2.0 ** rng.integers(-1, 2, fo), jnp.float32)
        mean = jnp.asarray(rng.integers(-2, 3, fo), jnp.float32)
        inv = jnp.asarray(2.0 ** rng.integers(-2, 1, fo), jnp.float32)
    res_bn = (z, a, c, scale, mean, inv, jnp.float32(n))
    return (xf, w, res_bn), g


def _bits(x):
    return np.asarray(x).view(
        np.uint16 if x.dtype == MXDT else np.uint32)


class TestPlainKernel:
    def setup_method(self):
        os.environ["PRIFIT_SR_BITS"] = "hash"

    @pytest.mark.parametrize("sr_out", [True, False])
    def test_bit_exact_on_integer_grid(self, sr_out):
        rng = np.random.default_rng(0)
        n, fi, fo = 2048, 16, 32          # 2 row tiles of 1024
        res, g = _int_layer(rng, n, fi, fo)
        key = jax.random.PRNGKey(7)
        dx_ref, grads_ref = _layer_bwd(res, g, sr_key=key, sr_out=sr_out)
        dx_k, grads_k = layer_bwd_pallas(res, g, key, sr_out,
                                         interpret=True)
        assert dx_k.dtype == dx_ref.dtype
        np.testing.assert_array_equal(_bits(dx_k), _bits(dx_ref))
        for rk, rr in zip(grads_k, grads_ref):
            np.testing.assert_array_equal(np.asarray(rk),
                                          np.asarray(rr))

    def test_float_data_tolerance(self):
        rng = np.random.default_rng(1)
        n, fi, fo = 1024, 24, 40
        res, g = _int_layer(rng, n, fi, fo, float_data=True)
        key = jax.random.PRNGKey(3)
        dx_ref, grads_ref = _layer_bwd(res, g, sr_key=key, sr_out=True)
        dx_k, grads_k = layer_bwd_pallas(res, g, key, True,
                                         interpret=True)
        np.testing.assert_allclose(
            np.asarray(dx_k, np.float32), np.asarray(dx_ref, np.float32),
            rtol=0.1, atol=0.05)
        labels = ["dw", "db", "dscale", "dbias"]
        for lab, rk, rr in zip(labels, grads_k, grads_ref):
            np.testing.assert_allclose(np.asarray(rk), np.asarray(rr),
                                       rtol=5e-3, atol=1e-3,
                                       err_msg=lab)

    def test_gates(self):
        assert supports_layer_bwd(2048, 16, 32)
        assert supports_layer_bwd(393216, 128, 196)     # sa2's odd width
        assert not supports_layer_bwd(1000, 16, 32)     # no tile divides
        assert not supports_layer_bwd(4096, 2049, 32)   # width cap
        assert supports_layer_bwd_max(128, 16, 16, 32)
        assert supports_layer_bwd_max(12288, 128, 96, 128)  # sa1 scale 3

    def test_odd_width_bit_exact(self):
        # the reference's sa2 [128, 196, 256] widths are not multiples
        # of 8 — lane padding must not change the SR bit stream, which
        # is indexed by the UNPADDED linear index
        rng = np.random.default_rng(5)
        n, fi, fo = 1024, 20, 196
        res, g = _int_layer(rng, n, fi, fo)
        key = jax.random.PRNGKey(13)
        dx_ref, grads_ref = _layer_bwd(res, g, sr_key=key, sr_out=True)
        dx_k, grads_k = layer_bwd_pallas(res, g, key, True,
                                         interpret=True)
        np.testing.assert_array_equal(_bits(dx_k), _bits(dx_ref))
        for rk, rr in zip(grads_k, grads_ref):
            np.testing.assert_array_equal(np.asarray(rk), np.asarray(rr))


class TestMaxKernel:
    def setup_method(self):
        os.environ["PRIFIT_SR_BITS"] = "hash"

    def _jnp_max_path(self, res, g_out, out_bf, region_key, sr_key,
                      sr_out):
        """The jnp composite the fused kernel replaces (_mx_bwd's max
        prologue + that layer's _layer_bwd)."""
        xf, w, res_bn = res
        z, a, c = res_bn[0], res_bn[1], res_bn[2]
        rows, F = out_bf.shape
        h = jax.nn.relu(bf16_affine(z, a, c))
        h3 = h.reshape(rows, -1, F)
        mask = h3 == out_bf[:, None, :]
        cnt = jnp.sum(mask, axis=1)
        gsm = g_out.astype(jnp.float32) / cnt
        gsm = sr_bf16(jax.random.fold_in(region_key, 255), gsm)
        gh = jnp.where(mask, gsm[:, None, :], jnp.zeros((), gsm.dtype))
        return _layer_bwd(res, gh.reshape(-1, F), sr_key=sr_key,
                          sr_out=sr_out)

    @pytest.mark.parametrize("float_data", [False, True])
    def test_matches_jnp_composite(self, float_data):
        rng = np.random.default_rng(2)
        rows, K, fi, fo = 128, 16, 16, 32
        n = rows * K
        res, _ = _int_layer(rng, n, fi, fo, float_data=float_data)
        xf, w, res_bn = res
        z, a, c = res_bn[0], res_bn[1], res_bn[2]
        if not float_data:
            # force a UNIQUE strictly-positive max per [row, f] window:
            # with ties, gsm = g / cnt has a full mantissa and the
            # dbias/dscale sums become reduction-order dependent —
            # cnt == 1 keeps every addend a small binary fraction, so
            # the bit-equality contract applies
            bonus = np.zeros((rows, K, fo), np.float32)
            kpick = rng.integers(0, K, (rows, fo))
            bonus[np.arange(rows)[:, None], kpick,
                  np.arange(fo)[None, :]] = 16.0
            z = (z.astype(jnp.float32)
                 + jnp.asarray(bonus.reshape(n, fo))).astype(MXDT)
            res_bn = (z, *res_bn[1:])
            res = (xf, w, res_bn)
        h = jax.nn.relu(bf16_affine(z, a, c))
        out_bf = jnp.max(h.reshape(rows, K, fo), axis=1)
        if float_data:
            g_out = jnp.asarray(rng.normal(size=(rows, fo)),
                                jnp.float32).astype(MXDT)
        else:
            g_out = jnp.asarray(rng.integers(-3, 4, (rows, fo)),
                                jnp.float32).astype(MXDT)
        region_key = jax.random.PRNGKey(11)
        sr_key = jax.random.fold_in(region_key, 0)
        dx_ref, grads_ref = self._jnp_max_path(
            res, g_out, out_bf, region_key, sr_key, True)
        dx_k, grads_k = layer_bwd_max_pallas(
            res, g_out, out_bf, region_key, sr_key, True, interpret=True)
        if float_data:
            np.testing.assert_allclose(
                np.asarray(dx_k, np.float32),
                np.asarray(dx_ref, np.float32), rtol=0.1, atol=0.05)
            for rk, rr in zip(grads_k, grads_ref):
                np.testing.assert_allclose(
                    np.asarray(rk), np.asarray(rr), rtol=5e-3, atol=1e-3)
        else:
            np.testing.assert_array_equal(_bits(dx_k), _bits(dx_ref))
            for rk, rr in zip(grads_k, grads_ref):
                np.testing.assert_array_equal(np.asarray(rk),
                                              np.asarray(rr))


class TestRegionWiring:
    """PRIFIT_MXSR_KERNEL=interpret drives the real _mx_bwd dispatch."""

    def _region_grads(self, monkeypatch, mode):
        monkeypatch.setenv("PRIFIT_MXSR_KERNEL", mode)
        monkeypatch.setenv("PRIFIT_SR_BITS", "hash")
        from prifit_tpu.nn.mixed import mx_chain
        rng = np.random.default_rng(4)
        B, S, K, F0 = 2, 16, 32, 16
        pre = jnp.asarray(rng.normal(size=(B, S, K, F0)),
                          jnp.float32).astype(MXDT)
        pre_bn = (jnp.asarray(rng.normal(size=F0), jnp.float32),
                  jnp.asarray(rng.normal(size=F0), jnp.float32))
        chain = []
        fi = F0
        for fo in (16, 32):
            chain.append(
                (jnp.asarray(rng.normal(size=(fi, fo)) * 0.3,
                             jnp.float32),
                 jnp.zeros(fo, jnp.float32),
                 jnp.ones(fo, jnp.float32),
                 jnp.zeros(fo, jnp.float32)))
            fi = fo
        params = (pre_bn, tuple(chain))
        key = jax.random.PRNGKey(5)

        def loss(pre_, params_):
            out, _ = mx_chain((True, True, True), pre_, params_, key=key)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1))(pre, params)

    def test_interpret_matches_jnp(self, monkeypatch):
        g_ref = self._region_grads(monkeypatch, "off")
        g_k = self._region_grads(monkeypatch, "interpret")
        flat_r, _ = jax.tree.flatten(g_ref)
        flat_k, _ = jax.tree.flatten(g_k)
        assert len(flat_r) == len(flat_k)
        for rr, rk in zip(flat_r, flat_k):
            np.testing.assert_allclose(
                np.asarray(rk, np.float32), np.asarray(rr, np.float32),
                rtol=0.05, atol=0.02)

"""Mixed-precision SA/FP chains: bf16 storage, f32 cotangents (``mx``).

The round-3 bisection (STATUS.md) isolated the bf16-encoder few-shot
instability to COTANGENT rounding: ``sa_all_fq`` — bf16-equivalent
forward values with exact f32 gradients — matches f32 exactly (0.586)
while ``sa_all_bf16`` (same forward, bf16 cotangents) loses 5 mIoU
points.  This module implements the fq numerics at bf16 speed: a
scale-level ``jax.custom_vjp`` region whose

- forward runs the real bf16 chain (bf16 activations in HBM — the
  [B, S, K, F] neighborhood tensors that dominate encoder traffic),
- backward is hand-derived with every cotangent held in f32; the only
  bf16 arrays it touches are the stored residual activations, whose
  VALUE rounding the bisection proved benign.

Region boundaries (stage inputs/outputs — post-max [B, S, F] tensors,
small) stay f32 primals, so no cotangent is ever rounded anywhere.

Layers use the explicit dense -> BN -> relu formulation on bf16
storage: stats reduce over the [n, Fo] pre-activation the layer
materializes anyway (the dense bias cancels analytically in BN's mean
subtraction and is skipped).  A folded-into-dense variant with
input-covariance stats was tried and reverted: its [Fi+1]^2 covariance
matmul + transpose cost more than the dense itself at wide-input
layers (see ``nn/pointnet2.py::_dense_bn_relu_folded``, now opt-in).

Rebuilds the training path of ``models/pointnet_util.py:204-261`` (SA)
and ``:264-314`` (FP) with identical parameters; numerics match the
``fq`` oracle (tests/test_mixed.py).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MX = "mx"
"""Sentinel compute dtype: bf16-storage forward, f32-cotangent backward
via the scale-level custom-VJP region (this module)."""

MXSR = "mxsr"
"""Sentinel compute dtype: the mx region with STOCHASTICALLY-ROUNDED
bf16 cotangents.  The bisection (STATUS.md round 3) proved the bf16
few-shot instability is deterministic round-to-nearest BIAS in the
backward — each stage's cotangent rounding is correlated with the
values, and the bias compounds across depth.  Stochastic rounding makes
each cast unbiased (``E[sr(x)] = x``), so this mode tests whether
UNBIASED bf16 cotangents train like f32 while paying bf16 traffic:
inter-layer cotangents and the backward matmul outputs are stored bf16
(half the backward HBM bytes of ``mx``), param/BN grads accumulate f32.
Randomness comes from a per-region fold of the step's ``sampling`` rng,
so runs stay reproducible."""

MXDT = jnp.bfloat16
_EPS = 1e-5


def _hash_bits16(key, shape):
    """Uniform 16-bit noise as a FUSABLE elementwise epilogue.

    ``jax.random.bits`` (threefry) measured +23 ms on the mxsr sup step
    (93.8 vs mx's 70.4): XLA materializes the big bits tensors and the
    20-round hash doesn't ride the matmul epilogue.  This generator is
    a Weyl-sequence + splitmix32 finalizer over an in-fusion iota —
    ~8 elementwise int ops, no HBM bytes, uniform and well-avalanched
    (not crypto-grade; SR only needs marginal uniformity, validated by
    tests/test_mixed.py::test_sr_bf16_unbiased_and_exact which runs
    both sources)."""
    data = jax.random.key_data(key) \
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    seed = data.ravel().astype(jnp.uint32)
    # linear index from per-dim broadcasted iotas: every op is a
    # fusable elementwise generator IN the target shape — a 1-D
    # iota + reshape re-tiles the layout for narrow minor dims
    # (F=32 lanes), which materialized the bits and cost ~20 ms at
    # sa1 scale-1 (tools/bench_region_vs_chain.py)
    x = None
    stride = 1
    for d in range(len(shape) - 1, -1, -1):
        it = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        c = it * jnp.uint32(stride)
        x = c if x is None else x + c
        stride *= shape[d]
    x = x * jnp.uint32(0x9E3779B9)
    x = x + seed[0] * jnp.uint32(0x85EBCA6B) + seed[-1]
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x >> 16


def sr_bf16(key, x):
    """Stochastically round f32 -> bf16, unbiased (``E[sr(x)] = x``).

    Adds uniform random low-16 bits to the f32 bit pattern and
    truncates: the carry into the bf16 mantissa fires with probability
    equal to the truncated fraction (exact SR in sign-magnitude space;
    works for either sign since float magnitude bits are monotone).
    Finite-input precondition: |x| must be < ~3.4e38 - 1ulp (gradient
    values by construction); inf/NaN inputs propagate as garbage bits.

    Bit source: ``PRIFIT_SR_BITS=hash`` (default; fusable counter-hash,
    ~zero cost) or ``threefry`` (jax.random.bits; measured +23 ms/step
    at B=24 — kept for A/B).
    """
    if os.environ.get("PRIFIT_SR_BITS", "hash") == "threefry":
        bits = jax.random.bits(key, x.shape,
                               jnp.uint16).astype(jnp.uint32)
    else:
        bits = _hash_bits16(key, x.shape)
    xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    y = (xi + bits) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(y, jnp.float32).astype(MXDT)


def bf16_affine(x, a, c):
    """Single-rounded bf16 ``x * a + c`` — the canonical BN-affine value.

    XLA compiles bf16 ``x * a + c`` as an f32 FMA chain rounded ONCE on
    TPU (``--xla_allow_excess_precision``), but CPU XLA double-rounds
    plain bf16 arithmetic, and the fused Pallas backward
    (``ops/pallas/mixed_bwd.py``) recomputes in f32.  Writing the f32
    form explicitly makes the forward, the jnp hand backward, and the
    fused kernel agree bit for bit on EVERY backend (bf16 products are
    exact in f32, so the only roundings are the f32 add and the final
    cast) — the relu and max masks recomputed in the backward then
    always match the forward's values, so max counts are never zero.
    """
    return (x.astype(jnp.float32) * a.astype(jnp.float32)
            + c.astype(jnp.float32)).astype(MXDT)


# ---------------------------------------------------------------- layers

def _layer_fwd(xf, w, b, scale, bias):
    """One dense+BN+relu layer on bf16 storage (explicit-BN form).

    ``xf``: [n, Fi] bf16.  Returns (y [n, Fo] bf16, (mean, var) for the
    running stats, residuals for the hand backward).

    The dense bias is NOT added to the pre-activation: BN's mean
    subtraction cancels it analytically, so only the reported running
    mean carries ``+ b``.  The earlier folded-into-dense formulation
    (input-covariance stats, ``_moment_stats``-style) was measured
    SLOWER in training — the [Fi+1]^2 covariance matmul and its
    transpose dwarf the dense itself at wide-input layers (FP stages,
    Fi ~ 1.3k) — so stats come from one reduction over the [n, Fo]
    pre-activation this layer materializes anyway."""
    z = jax.lax.dot_general(xf, w.astype(MXDT),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=MXDT)
    y, (mean_z, var), res_bn = _prebn_fwd(z, scale, bias)
    mean = mean_z + b.astype(jnp.float32)
    return y, (mean, var), (xf, w, res_bn)


def _layer_bwd(res, g, sr_key=None, sr_out=True):
    """Exact transpose of ``_layer_fwd``.

    ``g``: [n, Fo] f32 (mx) or bf16 (mxsr).  Returns (dx [n, Fi],
    (dw, db, dscale, dbias)).  ``db`` is exactly zero — BN's mean
    subtraction absorbs the dense bias analytically (its only effect is
    the running mean, which feeds stop_gradient'd updates).

    With ``sr_key`` (mxsr) the inter-op cotangents ``dz`` and ``dx`` are
    stochastically rounded to bf16 — the backward matmuls read/write
    bf16 (half the HBM bytes) while every reduction still accumulates
    f32.  ``sr_out=False`` keeps ``dx`` f32 (the region-exit cotangent).
    """
    xf, w, res_bn = res
    dz, (dscale, dbias) = _prebn_bwd(res_bn, g)            # [n, Fo] f32
    if sr_key is not None:
        dz = sr_bf16(jax.random.fold_in(sr_key, 0), dz)
        # bf16-VALUED operands in dz's container dtype: a no-op for the
        # real sr_bf16 (dz bf16), and with the test-side identity patch
        # (dz f32) this computes the exact rounding-free EXPECTATION of
        # the SR backward — the backward is linear in cotangents, so
        # E[grads] is the same graph with every sr cast removed
        x_in = xf.astype(dz.dtype)
        w_in = w.astype(MXDT).astype(dz.dtype)
    else:
        x_in, w_in = xf.astype(jnp.float32), w.astype(jnp.float32)
    dx = jax.lax.dot_general(dz, w_in, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if sr_key is not None and sr_out:
        dx = sr_bf16(jax.random.fold_in(sr_key, 1), dx)
    dw = jax.lax.dot_general(x_in, dz, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx, (dw, jnp.zeros(w.shape[1], jnp.float32), dscale, dbias)


def _prebn_fwd(xf, scale, bias):
    """BN+relu on an externally-computed pre-activation (the grouped
    first layer's affine output).  ``xf``: [n, F] bf16.

    Only ``xf`` is saved for the backward — ``y`` is recomputed from it
    there (one cheap elementwise pass instead of a second [n, F] HBM
    round trip)."""
    n = xf.shape[0]
    x32m = xf.astype(jnp.float32)
    mean = jnp.mean(x32m, axis=0)
    var = jnp.maximum(jnp.mean(x32m ** 2, axis=0) - mean ** 2, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = (scale * inv).astype(MXDT)
    c = (bias - mean * scale * inv).astype(MXDT)
    y = jax.nn.relu(bf16_affine(xf, a, c))
    res = (xf, a, c, scale, mean, inv, jnp.asarray(n, jnp.float32))
    return y, (mean, var), res


def _prebn_bwd(res, g):
    """Standard BN backward, f32 cotangent out, bf16 residuals.

    ``g`` may arrive bf16 (mxsr): every reduction and the returned ``dx``
    are f32 regardless (the casts live inside the fusion — registers,
    not HBM)."""
    xf, a, c, scale, mean, inv, n = res
    y = bf16_affine(xf, a, c)            # recompute relu sign, bf16
    gb = jnp.where(y > 0, g, 0).astype(jnp.float32)
    xhat = (xf.astype(jnp.float32) - mean) * inv
    dbias = jnp.sum(gb, axis=0)
    dscale = jnp.sum(gb * xhat, axis=0)
    dxhat = gb * scale
    dx = inv * (dxhat - dbias * scale / n
                - xhat * (dscale * scale / n))
    return dx, (dscale, dbias)


# ---------------------------------------------------------------- region

def _mx_impl(cfg, pre, params):
    has_pre_bn, has_max = cfg[0], cfg[1]
    pre_bn, chain = params
    shape = pre.shape
    xf = pre.astype(MXDT).reshape(-1, shape[-1])
    stats, residuals = [], []
    if has_pre_bn:
        xf, st, res = _prebn_fwd(xf, *pre_bn)
        stats.append(st)
        residuals.append(res)
    for layer in chain:
        xf, st, res = _layer_fwd(xf, *layer)
        stats.append(st)
        residuals.append(res)
    # sr (mxsr) regions return bf16 stage outputs so the inter-stage
    # fabric (downstream gathers, projections, skip concats) runs bf16
    # like the plain bf16 mode: f32 outputs made every downstream
    # HIGHEST gather a multi-pass f32 einsum and doubled inter-stage
    # traffic (measured: the whole 20 ms mxsr-vs-bf16 step gap).  The
    # seam cotangent rounding this implies was isolated as benign by
    # the bisection's single-stage bf16 variants (STATUS.md).  mx keeps
    # f32 outputs (its contract is f32 cotangents everywhere).
    out_dtype = MXDT if cfg[2] else jnp.float32
    if has_max:
        B, S, K = shape[0], shape[1], shape[2]
        h = xf.reshape(B * S, K, xf.shape[-1])
        out_bf = jnp.max(h, axis=1)
        out = out_bf.astype(out_dtype).reshape(B, S, -1)
        # h is the last layer's y — by default recomputed in the
        # backward from that layer's stored pre-activation, so only the
        # K-reduced max is saved.  PRIFIT_MXSR_SAVE_H=1 saves y itself
        # (one more [n, F] bf16 residual write) so the backward's
        # max-mask fusion doesn't carry the recompute — an A/B for the
        # XLA fusion-planner behavior seen in the sa1 HLO diff.
        if os.environ.get("PRIFIT_MXSR_SAVE_H", "0") == "1":
            max_res = (out_bf, xf)
        else:
            max_res = (out_bf, None)
    else:
        out = xf.astype(out_dtype).reshape(*shape[:-1], xf.shape[-1])
        max_res = None
    return out, tuple(stats), (residuals, max_res, shape)


def mx_chain(cfg, pre, params, key=None):
    """bf16-forward chain region (f32 or SR-bf16 cotangents).

    ``cfg = (has_pre_bn, has_max[, sr])`` static; ``pre`` the f32 stage
    input ([B, S, K, F] grouped pre-activation for SA scales, [B, N, F]
    features for FP); ``params = (pre_bn | None, ((w, b, scale, bias),
    ...))``; ``key`` the SR rng (required when ``sr``).  Returns
    (out f32, per-BN (mean, var) stats)."""
    if len(cfg) == 2:
        cfg = (*cfg, False)
    if key is None:
        if cfg[2]:
            raise ValueError("mx_chain: sr mode needs an rng key")
        key = jnp.zeros((2,), jnp.uint32)
    # static 4th element: bf16 pre -> bf16 region-exit cotangent
    # (stochastically rounded in sr mode, deterministically otherwise)
    cfg = (*cfg, pre.dtype == MXDT)
    return _mx_chain(cfg, pre, params, key)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mx_chain(cfg, pre, params, key):
    out, stats, _ = _mx_impl(cfg, pre, params)
    return out, stats


def _mx_fwd(cfg, pre, params, key):
    out, stats, res = _mx_impl(cfg, pre, params)
    return (out, stats), (res, params, key)


def _mxsr_kernel_mode():
    """Fused Pallas layer-backward gate (``ops/pallas/mixed_bwd.py``).

    ``auto`` (default) resolves to OFF — a measured decision: on chip
    the fused kernels LOSE to the jnp hand backward (sup step 70.6 vs
    63.0 ms, 2026-08-19 A/B), the two-pass stats+apply structure paying
    more in small-dot MXU inefficiency than it saves in avoided dz/gh
    materialization.  ``PRIFIT_MXSR_KERNEL=on`` forces the kernels on
    TPU for layers whose shapes pass the per-layer VMEM gates (A/B);
    ``interpret`` forces them in Pallas interpreter mode on any backend
    (tests); ``off`` is explicit."""
    m = os.environ.get("PRIFIT_MXSR_KERNEL", "auto")
    if m == "interpret":
        return "interpret"
    if m == "on" and jax.default_backend() == "tpu":
        return "on"
    return "off"


def _mx_bwd(cfg, saved, cots):
    has_pre_bn, has_max, sr, exit_bf16 = cfg
    (residuals, max_res, shape), params, key = saved
    pre_bn, chain = params
    g_out, _ = cots          # stats feed stop_gradient'd updates only
    layers = residuals[1 if has_pre_bn else 0:]
    n_layers = len(layers)
    kmode = _mxsr_kernel_mode() if sr else "off"
    use_kernel = kmode != "off"
    interp = kmode == "interpret"
    d_chain = []
    start_j = 0
    if has_max and use_kernel and n_layers:
        from prifit_tpu.ops.pallas.mixed_bwd import (
            layer_bwd_max_pallas,
            supports_layer_bwd_max,
        )
        out_bf, _ = max_res
        rows, F = out_bf.shape
        last = layers[-1]
        n_flat, Fi = last[0].shape
        if supports_layer_bwd_max(rows, n_flat // rows, Fi, F):
            at_exit = (n_layers == 1) and not has_pre_bn
            g, grads = layer_bwd_max_pallas(
                last, g_out.reshape(rows, F), out_bf, key,
                jax.random.fold_in(key, 0),
                sr_out=(not at_exit) or exit_bf16, interpret=interp)
            d_chain.append(grads)
            start_j = 1
    if start_j == 0 and has_max:
        out_bf, h_saved = max_res
        if h_saved is not None:
            h_flat = h_saved
        else:
            # recompute the last layer's y (= h) from its stored
            # residuals: a _layer res is (xf, w, res_bn), a _prebn res
            # is the bn tuple
            last = residuals[-1][2] if chain else residuals[-1]
            zl, al, cl = last[0], last[1], last[2]
            h_flat = jax.nn.relu(bf16_affine(zl, al, cl))  # [n, F] bf16
        rows, F = out_bf.shape
        h = h_flat.reshape(rows, h_flat.shape[0] // rows, F)
        mask = (h == out_bf[:, None, :])
        cnt = jnp.sum(mask, axis=1)                        # [rows, F]
        # divide (and SR) at the SMALL [rows, F] shape, expand in the
        # cotangent dtype: the earlier expand-then-divide form
        # materialized a [rows, K, F] f32 broadcast (1.3 GB at sa1
        # scale-3 — visible as broadcast.389 in the optimized HLO)
        gsm = g_out.reshape(rows, F).astype(jnp.float32) / cnt
        if sr:
            gsm = sr_bf16(jax.random.fold_in(key, 255), gsm)
        gh = jnp.where(mask, gsm[:, None, :],
                       jnp.zeros((), gsm.dtype))
        g = gh.reshape(-1, F)
    elif start_j == 0:
        g = g_out.reshape(-1, g_out.shape[-1]).astype(jnp.float32)
        if sr:
            g = sr_bf16(jax.random.fold_in(key, 255), g)

    # exit_bf16 (bf16 pre, mxsr boundary mode): the region-exit
    # cotangent is SR'd to bf16 too — the [B, S, K, F] dpre is the
    # largest single tensor in the stage backward, and the exact-gather
    # backward upstream accumulates it at HIGHEST either way
    for j, res in enumerate(reversed(layers)):
        if j < start_j:
            continue
        at_exit = (j == n_layers - 1) and not has_pre_bn
        sr_out_j = (not at_exit) or exit_bf16
        if use_kernel and g.dtype == MXDT:
            from prifit_tpu.ops.pallas.mixed_bwd import (
                layer_bwd_pallas,
                supports_layer_bwd,
            )
            if supports_layer_bwd(res[0].shape[0], res[0].shape[1],
                                  res[2][0].shape[-1]):
                g, grads = layer_bwd_pallas(
                    res, g, jax.random.fold_in(key, j), sr_out=sr_out_j,
                    interpret=interp)
                d_chain.append(grads)
                continue
        g, grads = _layer_bwd(
            res, g,
            sr_key=jax.random.fold_in(key, j) if sr else None,
            sr_out=sr_out_j)
        d_chain.append(grads)
    d_chain.reverse()
    if has_pre_bn:
        g, d_pre_bn = _prebn_bwd(residuals[0], g)
        if sr and exit_bf16:
            g = sr_bf16(jax.random.fold_in(key, 254), g)
    else:
        d_pre_bn = None
    dpre = g.astype(MXDT if exit_bf16 else jnp.float32).reshape(shape)
    return (dpre, (d_pre_bn, tuple(d_chain)),
            np.zeros(np.shape(key), jax.dtypes.float0))


_mx_chain.defvjp(_mx_fwd, _mx_bwd)

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

Layers use the folded-BN formulation (``nn/pointnet2.py::
_dense_bn_relu_folded``): batch stats come from an augmented-ones input
covariance (one skinny MXU matmul; the dense bias cancels analytically)
and the normalize folds into the dense weights, so the pre-BN tensor is
never materialized.  The hand backward is the exact transpose of that
forward — BN's reductions ride the ``x^T g`` matmul the dense backward
needs anyway.

Rebuilds the training path of ``models/pointnet_util.py:204-261`` (SA)
and ``:264-314`` (FP) with identical parameters; numerics match the
``fq`` oracle (tests/test_mixed.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

MX = "mx"
"""Sentinel compute dtype: bf16-storage forward, f32-cotangent backward
via the scale-level custom-VJP region (this module)."""

MXDT = jnp.bfloat16
_EPS = 1e-5


# ---------------------------------------------------------------- layers

def _layer_fwd(xf, w, b, scale, bias):
    """One folded dense+BN+relu layer on bf16 storage.

    ``xf``: [n, Fi] bf16.  Returns (y [n, Fo] bf16, (mean, var) for the
    running stats, residuals for the hand backward)."""
    n = xf.shape[0]
    ones = jnp.ones((n, 1), MXDT)
    xa = jnp.concatenate([xf, ones], axis=1)
    Ca = jax.lax.dot_general(xa, xa, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    C, s1 = Ca[:-1, :-1], Ca[:-1, -1]
    m1 = s1 / n
    w32 = w.astype(jnp.float32)
    mw = m1 @ w32
    Cw = C @ w32
    q = jnp.sum(w32 * Cw, axis=0) / n
    raw = q - mw ** 2
    var = jnp.maximum(raw, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = scale * inv
    Wp = (w32 * a[None, :]).astype(MXDT)
    bp = (bias - mw * a).astype(MXDT)
    z = jax.lax.dot_general(xf, Wp, (((1,), (0,)), ((), ())),
                            preferred_element_type=MXDT)
    y = jax.nn.relu(z + bp)
    mean = mw + b.astype(jnp.float32)
    res = (xf, y, w32, scale, m1, mw, Cw, raw, inv, a,
           jnp.asarray(n, jnp.float32))
    return y, (mean, var), res


def _layer_bwd(res, g):
    """Exact transpose of ``_layer_fwd`` with f32 cotangents.

    ``g``: [n, Fo] f32.  Returns (dx [n, Fi] f32, (dw, db, dscale,
    dbias)).  ``db`` is exactly zero — BN's mean subtraction absorbs the
    dense bias analytically."""
    xf, y, w32, scale, m1, mw, Cw, raw, inv, a, n = res
    gm = jnp.where(y > 0, g, 0.0)                          # [n, Fo] f32
    x32 = xf.astype(jnp.float32)
    Wpt = w32 * a[None, :]
    dx = jax.lax.dot_general(gm, Wpt, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dWp = jax.lax.dot_general(x32, gm, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbp = jnp.sum(gm, axis=0)                              # [Fo]
    dbias = dbp
    da = jnp.sum(w32 * dWp, axis=0) - mw * dbp
    dw = dWp * a[None, :]
    dmw = -a * dbp
    dscale = da * inv
    dinv = da * scale
    dvar = -0.5 * inv ** 3 * dinv
    draw = jnp.where(raw > 0, dvar, 0.0)
    dmw = dmw - 2.0 * mw * draw
    dw = dw + 2.0 * Cw * draw[None, :] / n
    M = (w32 * draw[None, :]) @ w32.T / n                  # [Fi, Fi]
    dm1 = w32 @ dmw
    dw = dw + jnp.outer(m1, dmw)
    dx = dx + 2.0 * (x32 @ M) + (dm1 / n)[None, :]
    return dx, (dw, jnp.zeros_like(dbp), dscale, dbias)


def _prebn_fwd(xf, scale, bias):
    """BN+relu on an externally-computed pre-activation (the grouped
    first layer's affine output).  ``xf``: [n, F] bf16."""
    n = xf.shape[0]
    x32m = xf.astype(jnp.float32)
    mean = jnp.mean(x32m, axis=0)
    var = jnp.maximum(jnp.mean(x32m ** 2, axis=0) - mean ** 2, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = (scale * inv).astype(MXDT)
    c = (bias - mean * scale * inv).astype(MXDT)
    y = jax.nn.relu(xf * a + c)
    res = (xf, y, scale, mean, inv, jnp.asarray(n, jnp.float32))
    return y, (mean, var), res


def _prebn_bwd(res, g):
    """Standard BN backward, f32 cotangents, bf16 residuals."""
    xf, y, scale, mean, inv, n = res
    gb = jnp.where(y > 0, g, 0.0)
    xhat = (xf.astype(jnp.float32) - mean) * inv
    dbias = jnp.sum(gb, axis=0)
    dscale = jnp.sum(gb * xhat, axis=0)
    dxhat = gb * scale
    dx = inv * (dxhat - dbias * scale / n
                - xhat * (dscale * scale / n))
    return dx, (dscale, dbias)


# ---------------------------------------------------------------- region

def _mx_impl(cfg, pre, params):
    has_pre_bn, has_max = cfg
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
    if has_max:
        B, S, K = shape[0], shape[1], shape[2]
        h = xf.reshape(B * S, K, xf.shape[-1])
        out_bf = jnp.max(h, axis=1)
        out = out_bf.astype(jnp.float32).reshape(B, S, -1)
        max_res = (h, out_bf)
    else:
        out = xf.astype(jnp.float32).reshape(*shape[:-1], xf.shape[-1])
        max_res = None
    return out, tuple(stats), (residuals, max_res, shape)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def mx_chain(cfg, pre, params):
    """bf16-forward / f32-cotangent chain region.

    ``cfg = (has_pre_bn, has_max)`` static; ``pre`` the f32 stage input
    ([B, S, K, F] grouped pre-activation for SA scales, [B, N, F]
    features for FP); ``params = (pre_bn | None, ((w, b, scale, bias),
    ...))``.  Returns (out f32, per-BN (mean, var) stats)."""
    out, stats, _ = _mx_impl(cfg, pre, params)
    return out, stats


def _mx_fwd(cfg, pre, params):
    out, stats, res = _mx_impl(cfg, pre, params)
    return (out, stats), (res, params)


def _mx_bwd(cfg, saved, cots):
    has_pre_bn, has_max = cfg
    (residuals, max_res, shape), params = saved
    g_out, _ = cots          # stats feed stop_gradient'd updates only
    if has_max:
        h, out_bf = max_res
        g = g_out.reshape(out_bf.shape).astype(jnp.float32)
        mask = (h == out_bf[:, None, :])
        cnt = jnp.sum(mask, axis=1, keepdims=True)
        gh = jnp.where(mask, g[:, None, :] / cnt, 0.0)
        g = gh.reshape(-1, h.shape[-1])
    else:
        g = g_out.reshape(-1, g_out.shape[-1]).astype(jnp.float32)

    pre_bn, chain = params
    d_chain = []
    for res in reversed(residuals[1 if has_pre_bn else 0:]):
        g, grads = _layer_bwd(res, g)
        d_chain.append(grads)
    d_chain.reverse()
    if has_pre_bn:
        g, d_pre_bn = _prebn_bwd(residuals[0], g)
    else:
        d_pre_bn = None
    dpre = g.reshape(shape)
    return dpre, (d_pre_bn, tuple(d_chain))


mx_chain.defvjp(_mx_fwd, _mx_bwd)

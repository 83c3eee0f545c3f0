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


def _mat(x):
    """Force a REAL low-precision materialization.

    XLA's excess-precision pass (``--xla_allow_excess_precision``, on by
    default) elides ``f32 -> bf16 -> f32`` convert pairs.  Every bf16
    storage point in this region is followed by an f32 upcast somewhere
    (BN stats, ``bf16_affine``, cotangent accumulation), so without a
    barrier the "bf16" z tensors, the region-entry pre tensor, and the
    SR'd cotangents all materialize as f32 — doubling the region's HBM
    traffic (profiled on v5e: sa1 mxsr fwd 16.1 ms vs plain-bf16's 7.4,
    with 805 MB f32 z writes and f32 layout copies).  Applied at the
    FORWARD storage points only (region entry, each layer's z): that
    measured sa1 fwd 16.1 -> 12.7 ms / fwd+bwd 35.2 -> 34.9 (the
    backward's reads of the now-bf16 residuals roughly cancel new
    fusion breaks).  Barriering the SR cotangent casts too was A/B'd
    and LOST (+2.6 ms, see ``sr_bf16``)."""
    if x.dtype == jnp.float32:
        return x
    return jax.lax.optimization_barrier(x)


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
    # NO barrier here, unlike the forward storage points: barriering
    # the SR outputs (so the masked-bits value lands in HBM as bf16)
    # was A/B'd on sa1 and LOST, +2.6 ms fwd+bwd — it blocks the SR
    # computation from fusing into its consumers (e.g. the [rows, K, F]
    # broadcasts of gsm in ``_max_bwd_core`` materialized), which costs
    # more than the f32-vs-bf16 store it saves.
    return jax.lax.bitcast_convert_type(y, jnp.float32).astype(MXDT)


def bf16_affine(x, a, c, sdt=MXDT):
    """Single-rounded ``x * a + c`` in storage dtype — the canonical
    BN-affine value.

    XLA compiles bf16 ``x * a + c`` as an f32 FMA chain rounded ONCE on
    TPU (``--xla_allow_excess_precision``), but CPU XLA double-rounds
    plain bf16 arithmetic.  Writing the f32 form explicitly makes the
    forward and the hand backward agree bit for bit on EVERY backend
    (bf16 products are exact in f32, so the only roundings are the f32
    add and the final cast) — the relu masks recomputed in the backward
    then always match the forward's values.  ``sdt=jnp.float32`` (the
    f32-storage region) makes the casts no-ops.
    """
    return (x.astype(jnp.float32) * a.astype(jnp.float32)
            + c.astype(jnp.float32)).astype(sdt)


# ---------------------------------------------------------------- layers

def _layer_fwd(xf, w, b, scale, bias, sdt=MXDT):
    """One dense+BN+relu layer on bf16 storage (explicit-BN form).

    ``xf``: [n, Fi] bf16.  Returns (y [n, Fo] bf16, (mean, var) for the
    running stats, residuals for the hand backward).

    BN statistics reduce over the UNROUNDED f32 matmul accumulator,
    fused into the dot's epilogue; only the bf16-rounded ``z`` lands in
    HBM (``_mat`` pins it — see its docstring).  On TPU this matches
    what the pre-barrier code already computed (excess precision had
    elided the round under the stats), so the accuracy evidence
    carries over; statistics of rounded vs unrounded values differ by
    ~1e-3 relative either way, far inside BN's own batch noise.  The
    stored residual and the affine input are the SAME rounded tensor
    the backward sees, so relu masks recomputed there match the
    forward's exactly.

    The dense bias is NOT added to the pre-activation: BN's mean
    subtraction cancels it analytically, so only the reported running
    mean carries ``+ b``.  The earlier folded-into-dense formulation
    (input-covariance stats, ``_moment_stats``-style) was measured
    SLOWER in training — the [Fi+1]^2 covariance matmul and its
    transpose dwarf the dense itself at wide-input layers (FP stages,
    Fi ~ 1.3k) — so stats come from one reduction over the [n, Fo]
    pre-activation this layer materializes anyway."""
    z32 = jax.lax.dot_general(xf, w.astype(sdt),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    n = z32.shape[0]
    mean_z = jnp.mean(z32, axis=0)
    var = jnp.maximum(jnp.mean(z32 ** 2, axis=0) - mean_z ** 2, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    a = (scale * inv).astype(sdt)
    c = (bias - mean_z * scale * inv).astype(sdt)
    z = _mat(z32.astype(sdt))
    y = jax.nn.relu(bf16_affine(z, a, c, sdt))
    res_bn = (z, a, c, scale, mean_z, inv, jnp.asarray(n, jnp.float32))
    mean = mean_z + b.astype(jnp.float32)
    return y, (mean, var), (xf, w, res_bn), z32


def _layer_bwd(res, g, sr_key=None, sr_out=True, max_ctx=None,
               sdt=MXDT):
    """Exact transpose of ``_layer_fwd``.

    ``g``: [n, Fo] f32 (mx) or bf16 (mxsr).  Returns (dx [n, Fi],
    (dw, db, dscale, dbias)).  ``db`` is exactly zero — BN's mean
    subtraction absorbs the dense bias analytically (its only effect is
    the running mean, which feeds stop_gradient'd updates).

    With ``sr_key`` (mxsr) the inter-op cotangents ``dz`` and ``dx`` are
    stochastically rounded to bf16 — the backward matmuls read/write
    bf16 (half the HBM bytes) while every reduction still accumulates
    f32.  ``sr_out=False`` keeps ``dx`` f32 (the region-exit cotangent).
    ``max_ctx=(g_rows, out_bf, zsel)`` marks the K-max layer: the BN
    backward runs in closed form (``_max_bwd_core``) and ``g`` is
    ignored.
    """
    xf, w, res_bn = res
    if max_ctx is not None:
        # dz arrives FINAL from the closed form (SR'd bf16 under sr)
        dz, (dscale, dbias) = _max_bwd_core(res_bn, *max_ctx,
                                            sr_key=sr_key)
    else:
        dz, (dscale, dbias) = _prebn_bwd(res_bn, g, sdt)   # [n, Fo] f32
        if sr_key is not None:
            dz = sr_bf16(jax.random.fold_in(sr_key, 0), dz)
    if sr_key is not None:
        # bf16-VALUED operands in dz's container dtype: a no-op for the
        # real sr_bf16 (dz bf16), and with the test-side identity patch
        # (dz f32) this computes the exact rounding-free EXPECTATION of
        # the SR backward — the backward is linear in cotangents, so
        # E[grads] is the same graph with every sr cast removed
        x_in = xf.astype(dz.dtype)
        w_in = w.astype(sdt).astype(dz.dtype)
    else:
        x_in, w_in = xf.astype(jnp.float32), w.astype(jnp.float32)
    dx = jax.lax.dot_general(dz, w_in, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if sr_key is not None and sr_out:
        dx = sr_bf16(jax.random.fold_in(sr_key, 1), dx)
    dw = jax.lax.dot_general(x_in, dz, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx, (dw, jnp.zeros(w.shape[1], jnp.float32), dscale, dbias)


def _prebn_fwd(xf, scale, bias, sdt=MXDT):
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
    a = (scale * inv).astype(sdt)
    c = (bias - mean * scale * inv).astype(sdt)
    y = jax.nn.relu(bf16_affine(xf, a, c, sdt))
    res = (xf, a, c, scale, mean, inv, jnp.asarray(n, jnp.float32))
    return y, (mean, var), res


def _max_bwd_core(res_bn, g_rows, out_bf, zsel, sr_key):
    """Closed-form BN+relu+K-max backward at ``[rows, F]`` granularity.

    The K-max ties all share the stored residual value ``zsel`` EXACTLY
    (the mask is ``z == zsel``), so the tied-position reductions
    collapse: ``sum_k gb = gsm * cnt`` and ``sum_k gb * xhat =
    gsm * cnt * xhat(zsel)``.  ``dbias``/``dscale`` therefore reduce
    over ``[rows, F]`` (K-fold less traffic than the generic
    ``[n, F]`` path) and ``dz`` is ONE elementwise pass over ``z``.

    Returns (dz [n, F] — FINAL, i.e. already SR'd bf16 under ``sr_key``
    — and (dscale, dbias)).

    On TPU the cnt/gsm and dz passes run as Pallas kernels
    (``ops/pallas/max_bwd.py``): the dz closed form contains
    K-broadcasts of the [rows, F] gsm/zsel consumed through a flat
    [n, F] view (what the dw/dx dots want), a periodic pattern XLA's
    2-D fusions cannot express — the compiler materialized the
    broadcasts in HBM (~2.5 ms of [12288, K, 128] writes + a 2.8 ms
    re-reading dz fusion at the flagship sup step; a 3-D-dz variant
    with two-contracting-dim dots was canonicalized straight back).
    The jnp path below is the oracle + CPU/odd-shape fallback.
    """
    z, a, c, scale, mean, inv, n = res_bn
    rows, F = out_bf.shape
    K = z.shape[0] // rows
    sr = sr_key is not None
    from prifit_tpu.ops.pallas.max_bwd import (
        cnt_gsm_pallas, dz_pallas, supports_pallas)
    use_pallas = (jax.default_backend() == "tpu"
                  and supports_pallas(rows, K, F)
                  and os.environ.get("PRIFIT_MAX_BWD",
                                     "pallas") == "pallas")
    if use_pallas:
        cnt, gsm = cnt_gsm_pallas(
            z, zsel, g_rows, out_bf,
            jax.random.fold_in(sr_key, 255) if sr else None, sr)
        gsm32 = gsm.astype(jnp.float32)
        xhat_sel = (zsel.astype(jnp.float32) - mean) * inv
        dbias = jnp.sum(gsm32 * cnt, axis=0)
        dscale = jnp.sum(gsm32 * cnt * xhat_sel, axis=0)
        c1 = inv * scale * dbias / n                       # [F]
        c2 = inv * inv * scale * dscale / n                # [F]
        dz = dz_pallas(z, zsel, gsm, inv * scale, c1, mean, c2,
                       jax.random.fold_in(sr_key, 0) if sr else None,
                       sr)
        return dz, (dscale, dbias)
    zk = z.reshape(rows, K, F)
    mask = zk == zsel[:, None, :]
    cnt = jnp.sum(mask, axis=1).astype(jnp.float32)        # >= 1
    g32 = jnp.where(out_bf > 0, g_rows.astype(jnp.float32), 0.0)
    gsm = g32 / cnt
    if sr:
        gsm = sr_bf16(jax.random.fold_in(sr_key, 255), gsm)
    gsm32 = gsm.astype(jnp.float32)
    xhat_sel = (zsel.astype(jnp.float32) - mean) * inv
    dbias = jnp.sum(gsm32 * cnt, axis=0)
    dscale = jnp.sum(gsm32 * cnt * xhat_sel, axis=0)
    c1 = inv * scale * dbias / n                           # [F]
    c2 = inv * inv * scale * dscale / n                    # [F]
    dz = ((inv * scale) * jnp.where(mask, gsm32[:, None, :], 0.0)
          - c1 - (zk.astype(jnp.float32) - mean) * c2).reshape(-1, F)
    if sr:
        dz = sr_bf16(jax.random.fold_in(sr_key, 0), dz)
    return dz, (dscale, dbias)


def _prebn_bwd(res, g, sdt=MXDT):
    """Standard BN backward, f32 cotangent out, bf16 residuals.

    ``g`` may arrive bf16 (mxsr): every reduction and the returned ``dx``
    are f32 regardless (the casts live inside the fusion — registers,
    not HBM)."""
    xf, a, c, scale, mean, inv, n = res
    y = bf16_affine(xf, a, c, sdt)       # recompute relu sign
    gb = jnp.where(y > 0, g, 0).astype(jnp.float32)
    xhat = (xf.astype(jnp.float32) - mean) * inv
    dbias = jnp.sum(gb, axis=0)
    dscale = jnp.sum(gb * xhat, axis=0)
    dxhat = gb * scale
    dx = inv * (dxhat - dbias * scale / n
                - xhat * (dscale * scale / n))
    return dx, (dscale, dbias)


# ---------------------------------------------------------------- region

_SDTS = {"bf16": jnp.bfloat16, "f32": jnp.float32}


def _mx_impl(cfg, pre, params):
    has_pre_bn, has_max = cfg[0], cfg[1]
    sdt = _SDTS[cfg[4]]
    pre_bn, chain = params
    shape = pre.shape
    xf = _mat(pre.astype(sdt)).reshape(-1, shape[-1])
    stats, residuals = [], []
    z32_last = None
    if has_pre_bn:
        xf, st, res = _prebn_fwd(xf, *pre_bn, sdt)
        stats.append(st)
        residuals.append(res)
    for layer in chain:
        xf, st, res, z32_last = _layer_fwd(xf, *layer, sdt)
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
    out_dtype = sdt if (cfg[2] or cfg[3]) else jnp.float32
    if has_max:
        B, S, K = shape[0], shape[1], shape[2]
        # max_K(relu(a*z + c)) computed IN z SPACE: relu∘affine is
        # monotone per feature (direction = sign(a)), so the K-max of y
        # equals the affine of max_K z (a > 0) or min_K z (a < 0) — and
        # since round-to-bf16 is monotone too, this is BIT-EXACT equal
        # to maxing the rounded per-element y.  The win is HBM traffic:
        # the last layer's [n, F] y is never materialized (profiled
        # ~1.8 ms at sa1: a 400 MB y write + a second 400 MB read by
        # the reduce), and the backward selects on the stored z
        # residual directly.
        if not residuals:      # bare max region: nothing to select on
            raise ValueError("mx_chain: has_max needs a BN or layer")
        z_last, a_last, c_last = residuals[-1][2][:3] if chain \
            else residuals[-1][:3]
        # one variadic reduce: max AND min in a single pass (two
        # separate reduces each re-read the [n, F] residual — profiled
        # 2 x 0.53 ms at sa1), IN the storage dtype.  A reduce cannot
        # fuse with the dot that produces z (it takes materialized
        # inputs), so reducing in f32 forces a full [n, F] f32
        # re-materialization of the barriered z (profiled 1.9 ms at
        # sa1 scale 3, and 5.5 ms fwd when applied to the f32
        # accumulator directly); the bf16 reduce reads the residual
        # as-is.  Exact: max/min are selections, so reducing bf16
        # values in bf16 is bit-equal to reducing their f32 upcasts
        # and rounding, and the backward's tie mask ``z == zsel`` sees
        # identical values.
        zk = z_last.reshape(B * S, K, z_last.shape[-1])
        zmx, zmn = jax.lax.reduce(
            (zk, zk), (jnp.asarray(-jnp.inf, zk.dtype),
                       jnp.asarray(jnp.inf, zk.dtype)),
            lambda a, b: (jnp.maximum(a[0], b[0]),
                          jnp.minimum(a[1], b[1])), (1,))
        zsel = jnp.where(a_last.astype(jnp.float32) > 0,
                         zmx.astype(jnp.float32),
                         zmn.astype(jnp.float32)).astype(sdt)  # [rows, F]
        out_bf = jax.nn.relu(bf16_affine(zsel, a_last, c_last, sdt))
        out = out_bf.astype(out_dtype).reshape(B, S, -1)
        max_res = (out_bf, zsel)
    else:
        out = xf.astype(out_dtype).reshape(*shape[:-1], xf.shape[-1])
        max_res = None
    return out, tuple(stats), (residuals, max_res, shape)


def mx_chain(cfg, pre, params, key=None, storage=MXDT):
    """Storage-dtype chain region with a hand-derived backward.

    ``cfg = (has_pre_bn, has_max[, sr])`` static; ``pre`` the stage
    input ([B, S, K, F] grouped pre-activation for SA scales, [B, N, F]
    features for FP); ``params = (pre_bn | None, ((w, b, scale, bias),
    ...))``; ``key`` the SR rng (required when ``sr``).  ``storage``:
    ``jnp.bfloat16`` (the mx/mxsr modes) or ``jnp.float32`` (the
    closed-form K-max region on the default f32 path — same math as the
    autodiff chain, but the max backward never materializes a
    [rows, K, F] cotangent expansion).  Returns (out, per-BN
    (mean, var) stats)."""
    if len(cfg) == 2:
        cfg = (*cfg, False)
    if key is None:
        if cfg[2]:
            raise ValueError("mx_chain: sr mode needs an rng key")
        key = jnp.zeros((2,), jnp.uint32)
    if cfg[2] and storage != MXDT:
        raise ValueError("mx_chain: sr implies bf16 storage")
    # static 4th element: low-precision pre -> low-precision region-exit
    # cotangent (stochastically rounded in sr mode, deterministically
    # otherwise); 5th: storage dtype name
    exit_low = storage != jnp.float32 and pre.dtype == storage
    cfg = (*cfg, exit_low, "f32" if storage == jnp.float32 else "bf16")
    return _mx_chain(cfg, pre, params, key)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mx_chain(cfg, pre, params, key):
    out, stats, _ = _mx_impl(cfg, pre, params)
    return out, stats


def _mx_fwd(cfg, pre, params, key):
    out, stats, res = _mx_impl(cfg, pre, params)
    # A/B knob (default OFF — measured a ~1 ms LOSS on the sup step):
    # barrier the saved residuals so the backward's f32 recasts cannot
    # CSE with the forward's f32 stats cast.  The profiled 3 ms of
    # f32[n,F] residual copies (mixed.py:131 in dot layouts) turned out
    # to be XLA sharing work, not waste.
    if os.environ.get("PRIFIT_MX_BARRIER", "0") == "1":
        residuals, max_res, shape = res
        residuals, max_res = jax.lax.optimization_barrier(
            (residuals, max_res))
        res = (residuals, max_res, shape)
    return (out, stats), (res, params, key)


def _mx_bwd(cfg, saved, cots):
    has_pre_bn, has_max, sr, exit_low = cfg[:4]
    sdt = _SDTS[cfg[4]]
    (residuals, max_res, shape), params, key = saved
    pre_bn, chain = params
    g_out, _ = cots          # stats feed stop_gradient'd updates only
    layers = residuals[1 if has_pre_bn else 0:]
    n_layers = len(layers)
    d_chain = []
    max_ctx = None
    g = None
    if has_max:
        # select on the stored z residual: zsel/out_bf came from z via
        # the monotone affine (see _mx_impl); the K-max backward runs
        # in closed form inside the last layer (``_max_bwd_core``)
        out_bf, zsel = max_res
        max_ctx = (g_out.reshape(out_bf.shape), out_bf, zsel)
    else:
        g = g_out.reshape(-1, g_out.shape[-1]).astype(jnp.float32)
        if sr:
            g = sr_bf16(jax.random.fold_in(key, 255), g)

    # exit_low (bf16 pre, mxsr boundary mode): the region-exit
    # cotangent is SR'd to bf16 too — the [B, S, K, F] dpre is the
    # largest single tensor in the stage backward, and the exact-gather
    # backward upstream accumulates it at HIGHEST either way
    for j, res in enumerate(reversed(layers)):
        at_exit = (j == n_layers - 1) and not has_pre_bn
        sr_out_j = (not at_exit) or exit_low
        g, grads = _layer_bwd(
            res, g,
            sr_key=jax.random.fold_in(key, j) if sr else None,
            sr_out=sr_out_j, max_ctx=max_ctx if j == 0 else None,
            sdt=sdt)
        d_chain.append(grads)
    d_chain.reverse()
    if has_pre_bn:
        if has_max and not layers:
            # max directly over the pre-BN output: closed form, dz = dx
            # (arrives final — already SR'd bf16 under sr)
            g, d_pre_bn = _max_bwd_core(
                residuals[0], *max_ctx,
                sr_key=jax.random.fold_in(key, 254) if sr else None)
        else:
            g, d_pre_bn = _prebn_bwd(residuals[0], g, sdt)
        if sr and exit_low and g.dtype != MXDT:
            g = sr_bf16(jax.random.fold_in(key, 254), g)
    else:
        d_pre_bn = None
    dpre = g.astype(sdt if exit_low else jnp.float32).reshape(shape)
    return (dpre, (d_pre_bn, tuple(d_chain)),
            np.zeros(np.shape(key), jax.dtypes.float0))


_mx_chain.defvjp(_mx_fwd, _mx_bwd)

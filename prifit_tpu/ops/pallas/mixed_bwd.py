"""Fused backward for the mxsr layer chain (``nn/mixed.py``).

The mxsr region's remaining deficit vs plain-bf16 autodiff (57 vs 40 ms
sup step, STATUS.md round 3) is XLA materializing the hand backward's
intermediates: the ``[rows, K, F]`` max-mask expansion ``gh``, the
``[n, Fo]`` ``dz`` between the BN backward and the two dots, and layout
copies feeding ``dw``'s transposed dot.  ``PRIFIT_MXSR_SAVE_H`` proved
the recompute is not what blocks the fusion — the fix is structural:
do the whole per-layer backward in VMEM.

Each layer backward is two tiled passes over the rows (BN's dx needs
the global ``dbias``/``dscale`` sums before any dx element — the same
two-phase shape as BN training stats):

  pass 1 (stats):  stream ``[T, Fo]`` tiles of (z, g), recompute the
      relu mask from z, accumulate ``dbias = sum(gb)`` and
      ``dscale = sum(gb * xhat)`` on-core.
  pass 2 (apply):  recompute ``gb`` (cheap elementwise — cheaper than
      an HBM round trip), form ``dz`` from the pass-1 sums,
      stochastically round it, and run BOTH dots from the same VMEM
      tile: ``dx = dz @ w^T`` (rounded bf16 out) and
      ``dw += x^T @ dz`` (f32 accumulator revisited across the
      sequential grid).  Nothing ``[n, Fo]`` ever touches HBM.

The ``*_max`` variants additionally fuse the max-over-K prologue of the
last SA layer: tiles are ``[R, K, F]``, the max mask ``h == out`` and
its count are recomputed in VMEM and the ``gh`` expansion never
materializes (the single largest backward tensor at sa1 scale).

SR bits replicate ``nn/mixed.py::_hash_bits16`` exactly (same Weyl +
splitmix32 counter hash over the GLOBAL linear index, seeded with the
same folded key data), so the fused backward is bit-compatible with
the jnp path up to f32 reduction order — tests drive both on
integer-valued data where every sum is exact and assert bit equality.

Reference behavior: the training backward of
``models/pointnet_util.py:204-261`` under the mxsr numerics contract.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


def _hash16(seed0, seed1, lin_idx):
    """splitmix32 over a uint32 linear index -> high-16 bits.

    Must match ``nn/mixed.py::_hash_bits16`` bit for bit: that builds
    the linear index from per-dim broadcasted iotas (= row * F + col
    for a 2-D shape), multiplies by the Weyl constant and finalizes.
    """
    x = lin_idx * _U32(0x9E3779B9)
    x = x + seed0 * _U32(0x85EBCA6B) + seed1
    x = (x ^ (x >> 16)) * _U32(0x7FEB352D)
    x = (x ^ (x >> 15)) * _U32(0x846CA68B)
    x = x ^ (x >> 16)
    return x >> 16


def _sr(x, bits16):
    """Stochastic f32 -> bf16 rounding with supplied 16-bit noise."""
    xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), _U32)
    y = (xi + bits16) & _U32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(y, jnp.float32).astype(
        jnp.bfloat16)


def _lin2(row0, shape, ncols):
    """Global linear index tile: ``(row0 + r) * ncols + c`` as uint32."""
    r = jax.lax.broadcasted_iota(_U32, shape, 0)
    c = jax.lax.broadcasted_iota(_U32, shape, 1)
    return (row0 + r) * _U32(ncols) + c


def _gb_xhat(z, g, a, c, mean, inv):
    """Recompute relu mask + BN xhat from the bf16 residuals.

    Matches ``_prebn_bwd``, whose recompute is ``bf16_affine`` — the
    explicit f32-FMA-rounded-once form shared by the forward, the jnp
    backward, and this kernel, so all three agree bit for bit on every
    backend (Mosaic bf16 arithmetic double-rounds; XLA TPU single-
    rounds; CPU XLA double-rounds — the explicit f32 form sidesteps
    all of that).  Comparisons run in f32 (no bf16 cmpf on v5e; f32 is
    exact on bf16 values).
    """
    y = (z.astype(jnp.float32) * a.astype(jnp.float32)
         + c.astype(jnp.float32)).astype(jnp.bfloat16)
    gb = jnp.where(y.astype(jnp.float32) > 0, g,
                   jnp.zeros((), g.dtype)).astype(jnp.float32)
    xhat = (z.astype(jnp.float32) - mean) * inv
    return gb, xhat


# ------------------------------------------------------------- plain layer

def _stats_kernel(z_ref, g_ref, a_ref, c_ref, mean_ref, inv_ref,
                  dbias_ref, dscale_ref):
    i = pl.program_id(0)
    gb, xhat = _gb_xhat(z_ref[...], g_ref[...], a_ref[...], c_ref[...],
                        mean_ref[...], inv_ref[...])

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    dbias_ref[...] += jnp.sum(gb, axis=0, keepdims=True)
    dscale_ref[...] += jnp.sum(gb * xhat, axis=0, keepdims=True)


def _apply_kernel(key_ref, z_ref, g_ref, xf_ref, w_ref, a_ref, c_ref,
                  scale_ref, mean_ref, inv_ref, sums_ref,
                  dx_ref, dw_ref, *, n_rows, row_tile, sr_out):
    i = pl.program_id(0)
    gb, xhat = _gb_xhat(z_ref[...], g_ref[...], a_ref[...], c_ref[...],
                        mean_ref[...], inv_ref[...])
    scale = scale_ref[...]
    inv = inv_ref[...]
    n = jnp.float32(n_rows)
    dbias = sums_ref[0:1, :]
    dscale = sums_ref[1:2, :]
    # exact _prebn_bwd association: inv*(gb*scale - (dbias*scale)/n
    #                                     - xhat*((dscale*scale)/n))
    dz = inv * (gb * scale - dbias * scale / n
                - xhat * (dscale * scale / n))

    Fo = dz.shape[-1]
    Fi = xf_ref.shape[-1]
    row0 = _U32(i * row_tile)
    dzb = _sr(dz, _hash16(key_ref[0, 0], key_ref[0, 1],
                          _lin2(row0, dz.shape, Fo)))
    wb = w_ref[...].astype(jnp.bfloat16)
    dx = jax.lax.dot_general(dzb, wb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if sr_out:
        dx_ref[...] = _sr(dx, _hash16(key_ref[0, 2], key_ref[0, 3],
                                      _lin2(row0, dx.shape, Fi)))
    else:
        dx_ref[...] = dx

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] += jax.lax.dot_general(
        xf_ref[...], dzb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# -------------------------------------------------- last layer + max fused

def _max_prologue(z, gout, outbf, a, c, key_ref, row0, Fo):
    """In-VMEM ``gh``: mask, count, SR'd mean cotangent, expansion.

    ``z``: [R, K, Fo] bf16; ``gout``/``outbf``: [R, Fo].  Matches
    ``_mx_bwd``'s max branch: ``h = relu(z * a + c)``,
    ``gsm = sr(g / count)`` at the SMALL [rows, Fo] shape, expand in
    bf16 — except nothing here leaves VMEM.
    """
    # recompute h with XLA's single-rounded bf16 semantics (see
    # _gb_xhat): f32 FMA, one rounding.  relu commutes with the
    # rounding (both preserve sign and 0), so relu-then-round equals
    # the forward's round-then-relu bit for bit.  The mask stays 0/1
    # f32 arithmetic: bf16 cmpf is unsupported on v5e Mosaic and i1
    # broadcasts/reductions hit Mosaic relayout bugs; mask * gsm ==
    # where(mask, gsm, 0) exactly (1.0 * x = x, 0.0 * finite = 0)
    h32 = jax.nn.relu(
        z.astype(jnp.float32) * a.astype(jnp.float32)[:, None, :]
        + c.astype(jnp.float32)[:, None, :])
    h = h32.astype(jnp.bfloat16)
    maskf = (h.astype(jnp.float32)
             == outbf.astype(jnp.float32)[:, None, :]).astype(jnp.float32)
    cnt = jnp.sum(maskf, axis=1)                             # [R, Fo]
    # clamp: with shared recompute semantics cnt >= 1 always, but if a
    # future numerics drift ever made cnt == 0 for some [row, f],
    # g / 0 = inf and maskf * inf = NaN would poison the whole column
    # (where() would have yielded a finite 0).  maskf zeros the product
    # when the mask is empty, so the clamp is exact in every case.
    gsm = gout.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    gsm = _sr(gsm, _hash16(key_ref[0, 4], key_ref[0, 5],
                           _lin2(row0, gsm.shape, Fo)))
    # expand gsm in f32: Mosaic can't relayout a non-unit-sublane bf16
    # 2-D -> 3-D expand (probed: f32 is fine, [1,Fo] bf16 is fine).
    # maskf is 0/1 and gsm's f32 image is exact, so the f32 product cast
    # to bf16 is bit-identical to where(mask, gsm_bf16, 0)
    return (maskf
            * gsm.astype(jnp.float32)[:, None, :]).astype(jnp.bfloat16)


def _stats_max_kernel(key_ref, z_ref, gout_ref, outbf_ref, a_ref, c_ref,
                      mean_ref, inv_ref, dbias_ref, dscale_ref, *,
                      row_tile):
    i = pl.program_id(0)
    z = z_ref[...]                                           # [R, K, Fo]
    R, K, Fo = z.shape
    gh = _max_prologue(z, gout_ref[...], outbf_ref[...], a_ref[...],
                       c_ref[...], key_ref, _U32(i * row_tile), Fo)
    gb, xhat = _gb_xhat(z.reshape(R * K, Fo), gh.reshape(R * K, Fo),
                        a_ref[...], c_ref[...], mean_ref[...],
                        inv_ref[...])

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    dbias_ref[...] += jnp.sum(gb, axis=0, keepdims=True)
    dscale_ref[...] += jnp.sum(gb * xhat, axis=0, keepdims=True)


def _apply_max_kernel(key_ref, z_ref, gout_ref, outbf_ref, xf_ref, w_ref,
                      a_ref, c_ref, scale_ref, mean_ref, inv_ref,
                      sums_ref, dx_ref, dw_ref, *, n_rows, row_tile,
                      sr_out):
    i = pl.program_id(0)
    z = z_ref[...]
    R, K, Fo = z.shape
    Fi = xf_ref.shape[-1]
    gh = _max_prologue(z, gout_ref[...], outbf_ref[...], a_ref[...],
                       c_ref[...], key_ref, _U32(i * row_tile), Fo)
    gb, xhat = _gb_xhat(z.reshape(R * K, Fo), gh.reshape(R * K, Fo),
                        a_ref[...], c_ref[...], mean_ref[...],
                        inv_ref[...])
    scale = scale_ref[...]
    inv = inv_ref[...]
    n = jnp.float32(n_rows)
    dbias = sums_ref[0:1, :]
    dscale = sums_ref[1:2, :]
    dz = inv * (gb * scale - dbias * scale / n
                - xhat * (dscale * scale / n))

    row0 = _U32(i * row_tile * K)                # flat-row offset
    dzb = _sr(dz, _hash16(key_ref[0, 0], key_ref[0, 1],
                          _lin2(row0, dz.shape, Fo)))
    wb = w_ref[...].astype(jnp.bfloat16)
    dx = jax.lax.dot_general(dzb, wb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if sr_out:
        dx = _sr(dx, _hash16(key_ref[0, 2], key_ref[0, 3],
                             _lin2(row0, dx.shape, Fi)))
    dx_ref[...] = dx.reshape(R, K, Fi)

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] += jax.lax.dot_general(
        xf_ref[...].reshape(R * K, Fi), dzb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ------------------------------------------------------------------- host

def _vec(x, dtype=None):
    x = x.reshape(1, -1)
    return x if dtype is None else x.astype(dtype)


def _key_words(*keys):
    """Folded-key uint32 words as one [1, 2 * len(keys)] SMEM operand."""
    words = [jax.random.key_data(k).ravel().astype(_U32) for k in keys]
    return jnp.concatenate(words).reshape(1, -1)


_VMEM_BUDGET = 12 * 1024 * 1024

# Mosaic's scoped-vmem check accounts operand/output blocks AND the
# kernel's f32 intermediates (y/gb/xhat/dz recomputes, hash bits).
# The operand budget above picks the row tile; the scoped limit is then
# DERIVED from that tile's estimated total footprint (below) instead of
# a fixed constant, so every shape the supports_* gates admit also
# compiles (v5e has 128 MB VMEM/core; the estimate is clamped well
# under that).
_VMEM_CEIL = 100 * 1024 * 1024


def _pad128(f):
    """Lane-padded width: Mosaic pads a full minor dim to 128 lanes,
    so VMEM budgeting must use the padded size (e.g. the reference's
    196-wide sa2 layer occupies 256 lanes)."""
    return -(-f // 128) * 128


def _plain_footprint(t, fi, fo):
    """Estimated VMEM bytes for one plain-kernel grid step at row tile
    ``t`` (padded widths): operand/output blocks plus the f32
    intermediates the apply kernel materializes (y/gb/xhat/dz at
    [t, fo], hash bits at [t, fo] and [t, fi], f32 dx before SR)."""
    operands = (t * (2 * fo * 2 + fi * 2 + fi * 4)     # z, g, xf, dx
                + 2 * fi * fo * 4 + fi * fo * 2)       # w, dw, wb
    interm = t * fo * 4 * 5 + t * fi * 4 * 2
    return operands, operands + interm


def _row_tile(n, Fi, Fo):
    """Largest power-of-two row tile dividing n within the VMEM budget."""
    fi, fo = _pad128(Fi), _pad128(Fo)
    for t in (1024, 512, 256, 128):
        if n % t:
            continue
        operands, total = _plain_footprint(t, fi, fo)
        if operands <= _VMEM_BUDGET and total <= _VMEM_CEIL:
            return t
    return 0


def _limit_params(total_bytes):
    """Compiler params with the scoped-vmem limit derived from the
    tile's estimated footprint (headroom for Mosaic's own scratch)."""
    lim = min(_VMEM_CEIL, max(32 * 1024 * 1024,
                              total_bytes + 8 * 1024 * 1024))
    return pltpu.CompilerParams(vmem_limit_bytes=lim)


def supports_layer_bwd(n, Fi, Fo):
    return (Fi <= 2048 and Fo <= 2048 and _row_tile(n, Fi, Fo) > 0)


def layer_bwd_pallas(res, g, sr_key, sr_out, interpret=False):
    """Fused mxsr layer backward: ``(dx, (dw, db, dscale, dbias))``.

    Drop-in for ``nn/mixed.py::_layer_bwd`` with ``sr_key`` set; ``g``
    must already be bf16 at ``[n, Fo]`` (the mxsr contract).
    """
    xf, w, res_bn = res
    z, a, c, scale, mean, inv, _ = res_bn
    n, Fi = xf.shape
    Fo = z.shape[-1]
    T = _row_tile(n, Fi, Fo)
    cparams = _limit_params(_plain_footprint(T, _pad128(Fi),
                                             _pad128(Fo))[1])
    keys = _key_words(jax.random.fold_in(sr_key, 0),
                      jax.random.fold_in(sr_key, 1))
    vecs = [_vec(a), _vec(c), _vec(mean, jnp.float32),
            _vec(inv, jnp.float32)]
    vspecs = [pl.BlockSpec((1, Fo), lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)]
    kspec = pl.BlockSpec(keys.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((T, Fo), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    dbias, dscale = pl.pallas_call(
        _stats_kernel,
        grid=(n // T,),
        in_specs=[tile, tile] + vspecs[:2] + vspecs[2:],
        out_specs=(pl.BlockSpec((1, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, Fo), jnp.float32),
                   jax.ShapeDtypeStruct((1, Fo), jnp.float32)),
        interpret=interpret,
        compiler_params=cparams,
    )(z, g, *vecs)

    sums = jnp.concatenate([dbias, dscale], axis=0)
    dx, dw = pl.pallas_call(
        functools.partial(_apply_kernel, n_rows=n, row_tile=T,
                          sr_out=sr_out),
        grid=(n // T,),
        in_specs=[kspec, tile, tile,
                  pl.BlockSpec((T, Fi), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Fi, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  *vspecs[:2],
                  pl.BlockSpec((1, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  *vspecs[2:],
                  pl.BlockSpec((2, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((T, Fi), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Fi, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(
            (n, Fi), jnp.bfloat16 if sr_out else jnp.float32),
                   jax.ShapeDtypeStruct((Fi, Fo), jnp.float32)),
        interpret=interpret,
        compiler_params=cparams,
    )(keys, z, g, xf, w.astype(jnp.float32), vecs[0], vecs[1],
      _vec(scale, jnp.float32), vecs[2], vecs[3], sums)

    zeros_b = jnp.zeros(Fo, jnp.float32)
    return dx, (dw, zeros_b, dscale.reshape(-1), dbias.reshape(-1))


def _max_footprint(t, K, fi, fo):
    """Estimated VMEM bytes for one max-kernel grid step: operand
    blocks plus the [t*K, fo]-sized f32 intermediates of the fused max
    prologue + BN backward (h32, maskf, gb, xhat, dz) and the f32 dx /
    hash bits at [t*K, fi]."""
    operands = (t * K * (fo * 2 + fi * 2 + fi * 2)
                + 2 * fi * fo * 4 + fi * fo * 2)
    interm = t * K * (fo * 4 * 5 + fi * 4 * 2)
    return operands, operands + interm


def _row_tile_max(rows, K, Fi, Fo):
    fi, fo = _pad128(Fi), _pad128(Fo)
    for t in (64, 32, 16, 8, 4, 2, 1):
        if rows % t:
            continue
        operands, total = _max_footprint(t, K, fi, fo)
        if operands <= _VMEM_BUDGET and total <= _VMEM_CEIL:
            return t
    return 0


def supports_layer_bwd_max(rows, K, Fi, Fo):
    return (Fi <= 2048 and Fo <= 2048 and K <= 2048
            and _row_tile_max(rows, K, Fi, Fo) > 0)


def layer_bwd_max_pallas(res, g_out, out_bf, region_key, sr_key, sr_out,
                         interpret=False):
    """Last-layer backward with the max-over-K prologue fused in.

    ``g_out``/``out_bf``: [rows, Fo] (the stage cotangent and saved
    max); ``res`` the last layer's residuals with ``xf``/``z`` viewed
    as [rows, K, ·].  Replaces ``_mx_bwd``'s gh materialization + that
    layer's ``_layer_bwd``.
    """
    xf, w, res_bn = res
    z, a, c, scale, mean, inv, _ = res_bn
    rows, Fo = out_bf.shape
    n, Fi = xf.shape
    K = n // rows
    R = _row_tile_max(rows, K, Fi, Fo)
    cparams = _limit_params(_max_footprint(R, K, _pad128(Fi),
                                           _pad128(Fo))[1])
    z3 = z.reshape(rows, K, Fo)
    xf3 = xf.reshape(rows, K, Fi)
    keys = _key_words(jax.random.fold_in(sr_key, 0),
                      jax.random.fold_in(sr_key, 1),
                      jax.random.fold_in(region_key, 255))
    vecs = [_vec(a), _vec(c), _vec(mean, jnp.float32),
            _vec(inv, jnp.float32)]
    vspecs = [pl.BlockSpec((1, Fo), lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)]
    kspec = pl.BlockSpec(keys.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    ztile = pl.BlockSpec((R, K, Fo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gtile = pl.BlockSpec((R, Fo), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    dbias, dscale = pl.pallas_call(
        functools.partial(_stats_max_kernel, row_tile=R),
        grid=(rows // R,),
        in_specs=[kspec, ztile, gtile, gtile] + vspecs,
        out_specs=(pl.BlockSpec((1, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, Fo), jnp.float32),
                   jax.ShapeDtypeStruct((1, Fo), jnp.float32)),
        interpret=interpret,
        compiler_params=cparams,
    )(keys, z3, g_out, out_bf, *vecs)

    sums = jnp.concatenate([dbias, dscale], axis=0)
    dx, dw = pl.pallas_call(
        functools.partial(_apply_max_kernel, n_rows=n, row_tile=R,
                          sr_out=sr_out),
        grid=(rows // R,),
        in_specs=[kspec, ztile, gtile, gtile,
                  pl.BlockSpec((R, K, Fi), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Fi, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  *vspecs[:2],
                  pl.BlockSpec((1, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  *vspecs[2:],
                  pl.BlockSpec((2, Fo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((R, K, Fi), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Fi, Fo), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(
            (rows, K, Fi), jnp.bfloat16 if sr_out else jnp.float32),
                   jax.ShapeDtypeStruct((Fi, Fo), jnp.float32)),
        interpret=interpret,
        compiler_params=cparams,
    )(keys, z3, g_out, out_bf, xf3, w.astype(jnp.float32), vecs[0],
      vecs[1], _vec(scale, jnp.float32), vecs[2], vecs[3], sums)

    zeros_b = jnp.zeros(Fo, jnp.float32)
    return (dx.reshape(n, Fi),
            (dw, zeros_b, dscale.reshape(-1), dbias.reshape(-1)))

"""Closed-form BN+relu+K-max backward as Pallas kernels.

``nn/mixed.py::_max_bwd_core`` collapses the K-max backward of
``relu(a*z+c)`` to a [rows, F] closed form, but its dz pass contains
K-broadcasts of the [rows, F] ``gsm``/``zsel`` tensors consumed through
a FLAT [n, F] view (the downstream dw/dx dots want 2-D operands) — a
periodic access pattern XLA's 2-D loop fusions cannot express, so the
compiler materializes the broadcasts in HBM (profiled on v5e at the
flagship sup step: ~2.5 ms of [12288, K, 128] broadcast writes plus a
~2.8 ms dz fusion re-reading them, per round-4/5 VERDICT profiling; a
3-D dz + two-contracting-dim dots variant was canonicalized back to
reshape+2-D-dot and changed nothing).  Here the broadcast never exists:
each kernel walks the row tile in VMEM, comparing the [K, F] z-block
against its row's zsel directly.

Two kernels because of a global-reduction dependency: ``dz`` needs the
per-feature constants c1/c2, which reduce ``gsm``/``cnt`` over ALL
rows:

  1. ``cnt_gsm``: per row, count K-max ties (``z == zsel``) and build
     the tie-shared cotangent ``gsm = relu'(out) * g / cnt`` — the one
     pass over z that cannot be avoided.
  2. (caller, jnp) dbias/dscale/c1/c2 from the [rows, F] outputs.
  3. ``dz``: the elementwise closed form
     ``a * where(z == zsel, gsm, 0) - c1 - (z - mean) * c2``, with the
     mxsr stochastic rounding fused in.

Stochastic rounding reproduces ``nn/mixed.py::_hash_bits16`` bit for
bit (same Weyl + splitmix32 counter hash over the global linear index,
same seed words), so interpreter-mode tests compare exactly against
the jnp path.

Reference lineage: the backward of ``models/pointnet_util.py:204-261``
(torch autodiff through conv/BN/max); the closed form and kernels are
original to this rebuild (SURVEY.md §2.9).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W1 = 0x9E3779B9
_W2 = 0x85EBCA6B
_M1 = 0x7FEB352D
_M2 = 0x846CA68B


def _bits16(lin_u32, seed0, seed1):
    """splitmix32-style 16-bit noise from a linear index (uint32).

    Identical to ``nn/mixed.py::_hash_bits16`` evaluated at the same
    global linear indices and seed words."""
    x = lin_u32 * jnp.uint32(_W1)
    x = x + seed0 * jnp.uint32(_W2) + seed1
    x = (x ^ (x >> 16)) * jnp.uint32(_M1)
    x = (x ^ (x >> 15)) * jnp.uint32(_M2)
    x = x ^ (x >> 16)
    return x >> 16


def _sr(x32, lin_u32, seed0, seed1):
    """Exact stochastic round f32 -> bf16 via a low-16-bit carry."""
    bits = _bits16(lin_u32, seed0, seed1)
    xi = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    y = (xi + bits) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(y, jnp.float32) \
        .astype(jnp.bfloat16)


def _cnt_gsm_kernel(seed_ref, z_ref, zsel_ref, g_ref, out_ref,
                    cnt_ref, gsm_ref, *, K, R, F, sr):
    i = pl.program_id(0)

    def body(r, _):
        zb = z_ref[pl.ds(r * K, K), :]                      # [K, F] sdt
        zs = zsel_ref[pl.ds(r, 1), :]                       # [1, F]
        cnt = jnp.sum((zb == zs).astype(jnp.float32), axis=0,
                      keepdims=True)                        # [1, F] >= 1
        g32 = jnp.where(out_ref[pl.ds(r, 1), :] > 0,
                        g_ref[pl.ds(r, 1), :].astype(jnp.float32), 0.0)
        gsm = g32 / cnt
        if sr:
            row = (i * R + r).astype(jnp.uint32)
            lin = row * jnp.uint32(F) + jax.lax.broadcasted_iota(
                jnp.uint32, (1, F), 1)
            gsm_ref[pl.ds(r, 1), :] = _sr(gsm, lin, seed_ref[0],
                                          seed_ref[1])
        else:
            gsm_ref[pl.ds(r, 1), :] = gsm
        cnt_ref[pl.ds(r, 1), :] = cnt
        return 0

    jax.lax.fori_loop(0, R, body, 0, unroll=False)


def _dz_kernel(seed_ref, z_ref, zsel_ref, gsm_ref, vec_ref,
               dz_ref, *, K, R, F, sr):
    i = pl.program_id(0)
    a = vec_ref[pl.ds(0, 1), :]                             # inv*scale
    c1 = vec_ref[pl.ds(1, 1), :]
    mean = vec_ref[pl.ds(2, 1), :]
    c2 = vec_ref[pl.ds(3, 1), :]

    def body(r, _):
        zb = z_ref[pl.ds(r * K, K), :]                      # [K, F] sdt
        zs = zsel_ref[pl.ds(r, 1), :]
        gs = gsm_ref[pl.ds(r, 1), :].astype(jnp.float32)
        zk32 = zb.astype(jnp.float32)
        dz32 = (a * jnp.where(zb == zs, gs, 0.0)
                - c1 - (zk32 - mean) * c2)
        if sr:
            row0 = ((i * R + r) * K).astype(jnp.uint32)
            lin = ((row0 + jax.lax.broadcasted_iota(
                jnp.uint32, (K, F), 0)) * jnp.uint32(F)
                + jax.lax.broadcasted_iota(jnp.uint32, (K, F), 1))
            dz_ref[pl.ds(r * K, K), :] = _sr(dz32, lin, seed_ref[0],
                                             seed_ref[1])
        else:
            dz_ref[pl.ds(r * K, K), :] = dz32
        return 0

    jax.lax.fori_loop(0, R, body, 0, unroll=False)


def _row_tile(rows, K, F, budget=2 * 1024 * 1024):
    """Largest divisor of ``rows`` whose [R*K, F] z-block fits the VMEM
    budget (bf16 bytes)."""
    per_row = K * F * 2
    best = 1
    r = 1
    while r <= rows:
        if rows % r == 0 and r * per_row <= budget:
            best = r
        r *= 2
    return best


def _seed_words(key):
    data = jax.random.key_data(key) \
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    seed = data.ravel().astype(jnp.uint32)
    return jnp.stack([seed[0], seed[-1]])


def cnt_gsm_pallas(z, zsel, g_rows, out_bf, key, sr, interpret=False):
    """Tie counts and tie-shared cotangent for the K-max closed form.

    z: [rows*K, F] storage dtype; zsel/g_rows/out_bf: [rows, F].
    Returns (cnt f32 [rows, F], gsm [rows, F] bf16 when ``sr`` else
    f32).  ``key`` must already be the gsm fold (``fold_in(key, 255)``
    in the jnp path)."""
    rows, F = zsel.shape
    K = z.shape[0] // rows
    R = _row_tile(rows, K, F)
    seeds = _seed_words(key) if sr else jnp.zeros(2, jnp.uint32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R * K, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(_cnt_gsm_kernel, K=K, R=R, F=F, sr=sr),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rows, F), jnp.float32),
                   jax.ShapeDtypeStruct(
                       (rows, F),
                       jnp.bfloat16 if sr else jnp.float32)),
        interpret=interpret,
    )(seeds, z, zsel, g_rows, out_bf)


def dz_pallas(z, zsel, gsm, a, c1, mean, c2, key, sr, interpret=False):
    """The dz closed form, SR'd to bf16 when ``sr``.

    ``key`` must be the dz fold (``fold_in(key, 0)`` in the jnp
    path).  Returns [rows*K, F] bf16 (sr) or f32."""
    rows, F = zsel.shape
    K = z.shape[0] // rows
    R = _row_tile(rows, K, F)
    seeds = _seed_words(key) if sr else jnp.zeros(2, jnp.uint32)
    vecs = jnp.stack([a.astype(jnp.float32), c1.astype(jnp.float32),
                      mean.astype(jnp.float32), c2.astype(jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(rows // R,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R * K, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R * K, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_dz_kernel, K=K, R=R, F=F, sr=sr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (rows * K, F), jnp.bfloat16 if sr else jnp.float32),
        interpret=interpret,
    )(seeds, z, zsel, gsm, vecs)


def supports_pallas(rows: int, K: int, F: int) -> bool:
    """Shape gate: lane-aligned F, K*F block within VMEM, K | n."""
    return F % 64 == 0 and K * F * 2 <= 2 * 1024 * 1024

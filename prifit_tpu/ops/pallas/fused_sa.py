"""Fused grouped-MLP set-abstraction scale (gather + affine + folded BN +
ReLU chain + max-over-K in VMEM).

The SA-layer cost on TPU is not FLOPs but HBM traffic: the jnp path
materializes every [B, S, K, F] neighborhood activation (sa1 alone moves
~2.8 GB of f32 activations per forward, several passes each).  This
kernel keeps one (batch, center-tile) slab of the whole chain in VMEM:

  1. lane ``dynamic_gather`` of the pre-projected point table
     (``[F1, N]`` transposed in VMEM; 128-lane chunked shuffle + select
     merge, see ops/pallas/gather.py::gather_lanes) — bit-exact values;
  2. center subtraction in the transposed layout via an exact selection
     matmul (``E[s, r] = 1`` iff ``r`` belongs to center ``s``; the f32
     center operand is 3-way bf16-split so each selected value is exact);
  3. ReLU, then the MLP chain with BN folded into the weights
     (inference fold: ``W' = W * a``, ``b' = a * (b - mean) + beta``).
     The FIRST chain matmul contracts the F1 dim of the still-transposed
     activations, so the MXU performs the layout flip to rows-major for
     free; remaining layers are plain ``[rows, F] @ [F, F']``;
  4. max over the K neighbors via a layout-preserving leading-dim split.

Matmul operands are cast to bf16 with f32 accumulation — the same
numerics class as XLA's default-precision Dense layers in the (stable,
measured) f32 encoder mode: activations and BN stay f32, only matmul
operands round.

Only HBM traffic: the [B, N, F1] table, [B, S, F1] centers, indices and
the [B, S, F_L] result — no intermediate ever leaves VMEM.

Reference behavior: ``models/pointnet_util.py:204-261`` (MSG grouping +
per-scale shared MLP + max pool), re-designed TPU-first.  Eval-mode
(running BN statistics, folded); the training path keeps the jnp chain.

``fused_sa_scale_reference`` is the op-identical jnp implementation used
for interpreter-mode bit-compat tests and numerics documentation.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prifit_tpu.ops.pallas.gather import gather_lanes

# per-grid-step VMEM budget for the activation slabs (bytes); the hard
# limit is ~16 MB/core and the pipeline double-buffers inputs
_VMEM_BUDGET = 9 * 1024 * 1024


def _plan(N, K, S, widths):
    """Choose rows = cb*N (gather chunk granularity) and the center tile
    S_t = rows // K.  Constraints: K | cb*N, S_t >= 8 (sublane tile),
    S_t | S, and the activation slabs fit the VMEM budget.  Returns
    (cb, rows, S_t, n_tiles) or None if no plan fits."""
    best = None
    # gather_lanes decomposes the N-lane table into full 128-lane chunks
    # — a non-multiple-of-128 N would silently mis-gather the tail
    if N % 128:
        return None
    for cb in (1, 2, 4, 8):
        rows = cb * N
        if rows % K or rows % 128:
            continue
        S_t = rows // K
        if S_t < 8 or S % S_t:
            continue
        f1 = widths[0]
        # g + cen_sub (transposed, F1 wide) + two widest chain slabs + E
        slab = 4 * rows * (2 * f1 + sum(sorted(widths[1:])[-2:]) + S_t)
        if slab > _VMEM_BUDGET:
            continue
        best = (cb, rows, S_t, S // S_t)
    return best


def _split3(x):
    """3-way bf16 split of f32 ``x``: hi + lo + lo2 == x exactly (8+8+8
    mantissa bits cover f32's 24)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    lo = r1.astype(jnp.bfloat16)
    lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo, lo2


def _select_matmul_exact(cen, e):
    """``out[f, r] = cen[s(r), f]`` via selection matmul, bit-exact.

    ``e`` is a 0/1 selection matrix (one nonzero per column), exact in
    bf16; the f32 ``cen`` operand is 3-way split so each partial product
    is exact and the f32 reconstruction is exact.
    """
    dn = (((0,), (0,)), ((), ()))
    eb = e.astype(jnp.bfloat16)
    parts = _split3(cen)
    out = None
    for p in parts:
        t = jax.lax.dot_general(p, eb, dn,
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _make_kernel(cb, N, K, S_t, n_chain):
    rows = cb * N

    def kernel(tab_ref, cen_ref, idx_ref, e_ref, *rest):
        out_ref = rest[-1]
        wb = rest[:-1]
        tab = tab_ref[0]                                   # [F1, N]
        g = gather_lanes(
            tab, lambda tt: idx_ref[0, 0, :, pl.ds(tt * 128, 128)],
            rows)                                          # [F1, rows]

        cen_sub = _select_matmul_exact(cen_ref[0], e_ref[:])  # [F1, rows]
        h_t = jnp.maximum(g - cen_sub, 0.0)                # [F1, rows]

        # first chain matmul contracts F1 on both operands -> rows-major
        w0, b0 = wb[0][:], wb[1][:]
        z = jax.lax.dot_general(
            h_t.astype(jnp.bfloat16), w0,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [rows, F2]
        h = jnp.maximum(z + b0, 0.0)
        for i in range(1, n_chain):
            w, b = wb[2 * i][:], wb[2 * i + 1][:]
            z = jax.lax.dot_general(
                h.astype(jnp.bfloat16), w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(z + b, 0.0)

        h = h.reshape(S_t, K, h.shape[-1])
        out_ref[0] = jnp.max(h, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def fused_sa_scale(pre, cen, idx, ws, bs, *, interpret=False):
    """Fused eval-mode SA scale: out[b, s] = max_k chain(pre[b, idx[b,s,k]]
    - cen[b, s]).

    Args:
        pre: ``[B, N, F1]`` f32 — per-point first-layer affine output with
            the first BN folded in (``pre * a0``).
        cen: ``[B, S, F1]`` f32 — folded center projection
            (``cen_proj * a0 - c0``).
        idx: ``[B, S, K]`` int32 neighbor indices.
        ws: chain weights, f32 ``[F_l, F_{l+1}]`` each (BN-folded); cast
            to bf16 here (matching default-precision Dense numerics).
        bs: chain biases, f32 ``[F_{l+1}]`` each (BN-folded).
    Returns:
        ``[B, S, F_last]`` f32.
    """
    B, N, F1 = pre.shape
    S, K = idx.shape[1], idx.shape[2]
    widths = [F1] + [w.shape[1] for w in ws]
    plan = _plan(N, K, S, widths)
    if plan is None:
        raise ValueError(f"no fused plan for N={N} K={K} S={S}")
    cb, rows, S_t, n_tiles = plan

    tab_t = jnp.swapaxes(pre, 1, 2)                        # [B, F1, N]
    idx_t = idx.reshape(B, n_tiles, 1, rows).astype(jnp.int32)
    e = (jnp.arange(rows) // K
         == jnp.arange(S_t)[:, None]).astype(jnp.float32)  # [S_t, rows]

    args = [tab_t, cen, idx_t, e]
    in_specs = [
        pl.BlockSpec((1, F1, N), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S_t, F1), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, rows), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S_t, rows), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, bias in zip(ws, bs):
        args += [w.astype(jnp.bfloat16), bias.reshape(1, -1)]
        in_specs += [
            pl.BlockSpec(w.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    f_last = ws[-1].shape[1]
    out = pl.pallas_call(
        _make_kernel(cb, N, K, S_t, len(ws)),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S_t, f_last), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, f_last), jnp.float32),
        interpret=interpret,
    )(*args)
    return out


def fused_sa_scale_reference(pre, cen, idx, ws, bs):
    """Op-identical jnp implementation of :func:`fused_sa_scale` (same
    bf16 operand rounding, same exact gather/selection) for bit-compat
    testing and CPU execution."""
    B, N, F1 = pre.shape
    S, K = idx.shape[1], idx.shape[2]
    g = jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(
        pre, idx.reshape(B, -1))                           # [B, S*K, F1]
    g = g.reshape(B, S, K, F1)
    # exact center select == subtracting cen itself
    h = jnp.maximum(g - cen[:, :, None, :], 0.0)
    h = h.reshape(B, S * K, F1)
    for w, bias in zip(ws, bs):
        z = jnp.einsum("brf,fg->brg", h.astype(jnp.bfloat16),
                       w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        h = jnp.maximum(z + bias[None, None, :], 0.0)
    h = h.reshape(B, S, K, -1)
    return jnp.max(h, axis=2)


def fold_bn(mean, var, scale, bias, eps=1e-5):
    """Inference BN fold: returns (a, c) with BN(x) == x * a + c."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a


def has_fused_plan(N, K, S, widths):
    return _plan(N, K, S, list(widths)) is not None

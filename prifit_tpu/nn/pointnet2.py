"""PointNet++ building blocks as flax modules (channel-last, TPU-first).

Rebuilds ``models/pointnet_util.py:160-314`` with the geometry coming from
``prifit_tpu.ops``.  Torch's 1x1 Conv2d/Conv1d shared MLPs are plain
dense layers over the channel-last axis (identical math, and XLA fuses
the gather -> dense -> max chain).  BN momentum is a traced argument so the
reference's per-epoch momentum schedule doesn't recompile.

``PointMLP`` and ``GroupedFirstLayer`` own their parameters directly
(setup-style, flat names) instead of nesting ``nn.Dense``/``BatchNorm``
submodules: the mx/mxsr custom-VJP regions need the raw parameters as
one pytree, and flax submodule variables are only reachable by
*calling* the submodule.  The math is unchanged — ``_dense`` replicates ``nn.Dense``
(lecun-normal kernel, zero bias, default precision) and ``_bn_forward``
replicates ``nn/norm.py::BatchNorm`` (torch-convention traced momentum,
f32 statistics, unbiased running var, optional cross-replica mean).

All modules take ``train: bool`` (static) and optional ``bn_momentum``.
FPS uses the flax RNG collection ``"sampling"`` when training (the
reference uses a random start point, ``pointnet_util.py:71``) and a
deterministic start in eval.

Compute dtype: every module takes ``dtype`` (None = f32).  bf16 halves
activation bandwidth and VMEM on the MLP chains; BatchNorm keeps f32
statistics either way and the segmentation/embedding heads stay f32
(models/*).  The default TPU matmul already rounds operands to bf16, so
bf16 activations change MLP numerics only at the elementwise ops.
"""

from typing import Sequence

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.nn.mixed import MX, MXSR, mx_chain
from prifit_tpu.ops.sampling import (
    ball_query_nearest_shared,
    farthest_point_sample,
    gather_neighbors,
    index_points,
    query_ball_point,
    sample_and_group_all,
    three_nn_interpolate,
)


FQ = "fq"
"""Sentinel compute dtype: bf16-equivalent FORWARD with exact f32
gradients.  Matmul inputs (x, w, b) and outputs, and BN outputs, are
bf16-rounded via a straight-through estimator — on TPU a bf16 matmul is
round(inputs) -> f32 MXU accumulation -> round(output), so this
reproduces the bf16 forward numerics while autodiff sees the identity
(cotangents never rounded).  Comparing ``<stage>:fq`` vs ``<stage>:bf16``
on the few-shot benchmark isolates forward-value rounding from
backward/gradient rounding (the VERDICT r2 item-3 bisection).  Gathers
stay exact (HIGHEST) in this mode — their value rounding was separately
shown benign by the ``q`` variant."""


def _stq(x):
    """bf16-round values, straight-through (identity) gradients."""
    x32 = x.astype(jnp.float32)
    r = x32.astype(jnp.bfloat16).astype(jnp.float32)
    return x32 + jax.lax.stop_gradient(r - x32)


def _cast(x, dtype):
    """Apply a compute-dtype spec to a value: real dtype = cast, ``FQ`` =
    straight-through bf16 round, None = passthrough."""
    if dtype is None:
        return x
    if dtype == FQ:
        return _stq(x)
    return x.astype(dtype)


def _eff(dtype):
    """Effective array dtype for non-region code paths: ``MX``/``MXSR``
    behave as bf16 outside their custom-VJP training region (eval mode,
    fallbacks)."""
    return jnp.bfloat16 if dtype in (MX, MXSR) else dtype


def _mx_mode(mod, train):
    """True when this module should run the mx custom-VJP region."""
    return (mod.dtype in (MX, MXSR) and train and mod.axis_name is None)


def _run_dtype(mod, train):
    """Array dtype for the explicit (non-region) path.

    MX/MXSR behave as bf16 in EVAL (forward-value rounding is benign —
    measured eval parity, STATUS.md round 3), but fall back to f32 when
    TRAINING without the region (``axis_name`` set — the region has no
    cross-replica BN yet): the explicit bf16 chain would silently
    reintroduce the biased cotangent rounding these modes exist to
    avoid."""
    if mod.dtype in (MX, MXSR) and train and mod.axis_name is not None:
        return None
    return _eff(mod.dtype)


def _mx_key(mod):
    """SR rng for the mxsr backward (None in plain mx mode): a fresh
    fold of the step's ``sampling`` stream, unique per module path."""
    return mod.make_rng("sampling") if mod.dtype == MXSR else None


def _update_running(mod, entry, mean, var, momentum, n):
    """Write running BN stats from region-computed batch stats — same
    torch convention as ``_bn_forward`` (unbiased var tracked)."""
    _, _, ra_mean, ra_var = entry
    if mod.is_initializing():
        return
    m = jnp.asarray(momentum, jnp.float32)
    unbiased = var * (n / max(n - 1.0, 1.0))
    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
    ra_var.value = (1.0 - m) * ra_var.value + m * unbiased


def _mlp_chain_pure(x, params, axis_name, dtype, eps=1e-5):
    """Pure train-mode [dense -> BN -> relu] chain for :func:`jax.checkpoint`.

    ``params = ((w, b, scale, bias), ...)``.  Returns
    ``(y, ((mean, var), ...))`` — running-stat writes happen in the
    caller (module state can't live inside a remat region).  Same math
    as ``_dense`` + ``_bn_forward`` (f32 statistics, E[x^2]-E[x]^2).

    Measured on the sup step this is SLOWER than the default (74.5 vs
    59.3 ms — XLA already streams the saved residuals well), so it is
    an opt-in (``PRIFIT_REMAT_MLP=1``) for memory-bound regimes (e.g.
    large-N point-SP), not a speed knob."""
    stats = []
    for w, b, scale, bias in params:
        x = _dense(x, w, b, dtype)
        reduce_axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=reduce_axes)
        mean2 = jnp.mean(x32 ** 2, axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = jnp.maximum(mean2 - mean ** 2, 0.0)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = (y * scale + bias).astype(x.dtype)
        x = nn.relu(y)
        stats.append((mean, var))
    return x, tuple(stats)


def _dense(x, w, b=None, dtype=None):
    """``nn.Dense`` equivalent on explicit parameters: contract the last
    axis, default precision, optional compute dtype (casts inputs AND
    params like flax's ``promote_dtype``; ``FQ`` straight-through-rounds
    inputs and output instead)."""
    if dtype == FQ:
        x, w = _stq(x), _stq(w)
        if b is not None:
            b = _stq(b)
    elif dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
        if b is not None:
            b = b.astype(dtype)
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())))
    if b is not None:
        y = y + b
    return _stq(y) if dtype == FQ else y


def _bn_forward(mod, entry, x, train, momentum, eps=1e-5):
    """``nn/norm.py::BatchNorm`` semantics on explicit parameters.

    ``entry = (scale, bias, ra_mean_var, ra_var_var)`` where the last two
    are flax ``batch_stats`` variables.  Torch convention:
    ``running = (1 - m) * running + m * batch_stat`` with the *unbiased*
    variance tracked; statistics are f32 regardless of ``x.dtype``.
    """
    scale, bias, ra_mean, ra_var = entry
    if not train:
        mean, var = ra_mean.value, ra_var.value
    else:
        reduce_axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=reduce_axes)
        mean2 = jnp.mean(x32 ** 2, axis=reduce_axes)
        if mod.axis_name is not None:
            mean = jax.lax.pmean(mean, mod.axis_name)
            mean2 = jax.lax.pmean(mean2, mod.axis_name)
        var = jnp.maximum(mean2 - mean ** 2, 0.0)
        if not mod.is_initializing():
            m = jnp.asarray(momentum, jnp.float32)
            n = 1.0
            for a in reduce_axes:
                n = n * x.shape[a]
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y.astype(x.dtype)


def _moment_stats(mod, x, w, b, dtype):
    """Batch mean/var of ``a = x @ w + b`` computed WITHOUT materializing
    ``a``: ``E[a] = m1 @ w + b`` and (bias cancels exactly)

        var(a)_j = (w^T C w)_jj / n - (m1 @ w)_j^2,   C = sum_r x_r x_r^T

    i.e. the reductions over the big ``[rows, F_out]`` pre-BN tensor
    become a skinny ``[F_in, F_in]`` covariance matmul over the INPUT —
    MXU FLOPs instead of HBM passes (the bench_sa1_ablate.py result: BN
    passes were ~12 of sa1's 37 ms fwd+bwd).  Same E[a^2]-E[a]^2
    formulation as ``_bn_forward``, so numerics differ only by matmul
    reassociation.  Cross-replica: moments are pmean'd like
    ``_bn_forward`` does."""
    xf = x.reshape(-1, x.shape[-1])
    n = xf.shape[0]
    # HIGH (bf16_3x) keeps the second moment exact to ~1e-6 at half
    # HIGHEST's passes — statistics, not cancellation-sensitive values
    prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGH
    xs = xf if dtype is None or dtype == FQ else xf.astype(dtype)
    # augmented-ones column: one matmul yields C = x^T x AND s1 = sum(x)
    xa = jnp.concatenate(
        [xs, jnp.ones((n, 1), xs.dtype)], axis=-1)
    Ca = jax.lax.dot_general(xa, xa, (((0,), (0,)), ((), ())),
                             precision=prec,
                             preferred_element_type=jnp.float32)
    C, s1 = Ca[:-1, :-1], Ca[:-1, -1]
    m1 = s1 / n                                              # [Fi]
    w32 = w.astype(jnp.float32)
    mw = m1 @ w32                                            # [Fo]
    q = jnp.sum(w32 * (C @ w32), axis=0) / n                 # [Fo]
    if mod.axis_name is not None:
        mw = jax.lax.pmean(mw, mod.axis_name)
        q = jax.lax.pmean(q, mod.axis_name)
        n = n * jax.lax.psum(1, mod.axis_name)
    mean = mw + b.astype(jnp.float32)
    var = jnp.maximum(q - mw ** 2, 0.0)
    return mean, var, n


def _dense_bn_relu_folded(mod, x, w, b, entry, train, momentum,
                          dtype, eps=1e-5):
    """One PointMLP layer as a single fused pass: batch stats via
    ``_moment_stats`` (train) or running stats (eval), BN folded into the
    dense weights, ``relu(x @ W' + b')``.  Exactly ``_bn_forward(dense)``
    up to f32 reassociation; gradients flow through the folded weights
    and the moment matmuls (no big elementwise BN backward passes)."""
    scale, bias, ra_mean, ra_var = entry
    if not train:
        mean, var = ra_mean.value, ra_var.value
    else:
        mean, var, n = _moment_stats(mod, x, w, b, dtype)
        if not mod.is_initializing():
            m = jnp.asarray(momentum, jnp.float32)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            ra_mean.value = (1.0 - m) * ra_mean.value \
                + m * jax.lax.stop_gradient(mean)
            ra_var.value = (1.0 - m) * ra_var.value \
                + m * jax.lax.stop_gradient(unbiased)
    g = scale * jax.lax.rsqrt(var + eps)                     # [Fo]
    w_f = w * g[None, :]
    b_f = (b - mean) * g + bias
    return nn.relu(_dense(x, w_f, b_f, dtype))


class PointMLP(nn.Module):
    """Shared per-point MLP: [dense -> BN -> ReLU] x len(features).

    Default is the explicit dense -> BN -> relu chain; the
    folded-into-dense variant with input-moment stats
    (``_dense_bn_relu_folded``) is the ``PRIFIT_FOLDED_BN=1`` opt-in —
    measured slower in training (the covariance matmul + transpose
    dwarf the dense at wide-input layers) but kept for A/B and for the
    stats-free eval fold (``folded_eval``).

    ``d_in`` is the static input width (setup-style parameter creation
    so the fused eval path can read folded weights without calling)."""
    features: Sequence[int]
    d_in: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        ins = [self.d_in] + list(self.features[:-1])
        ws, bs, bn = [], [], []
        for i, (d, f) in enumerate(zip(ins, self.features)):
            ws.append(self.param(f"w{i}", nn.initializers.lecun_normal(),
                                 (d, f)))
            bs.append(self.param(f"b{i}", nn.initializers.zeros, (f,)))
            bn.append((
                self.param(f"bn{i}_scale", nn.initializers.ones, (f,)),
                self.param(f"bn{i}_bias", nn.initializers.zeros, (f,)),
                self.variable("batch_stats", f"bn{i}_mean",
                              lambda f=f: jnp.zeros(f, jnp.float32)),
                self.variable("batch_stats", f"bn{i}_var",
                              lambda f=f: jnp.ones(f, jnp.float32)),
            ))
        self.ws, self.bs, self.bn = ws, bs, bn

    def __call__(self, x, train: bool, bn_momentum=0.1):
        if _mx_mode(self, train):
            # bf16-storage region (nn/mixed.py): f32 cotangents (mx) or
            # stochastically-rounded bf16 cotangents (mxsr).  mxsr also
            # moves the region BOUNDARY to bf16 — forward values are
            # identical (the region casts to bf16 first regardless) and
            # the stage input + its SR'd cotangent halve their HBM bytes
            out, stats = mx_chain(
                (False, False, self.dtype == MXSR),
                x.astype(jnp.bfloat16 if self.dtype == MXSR
                         else jnp.float32),
                (None, self.mx_params()), key=_mx_key(self))
            self.mx_update_stats(stats, bn_momentum,
                                 x.size // x.shape[-1])
            return out
        # Explicit dense/_bn_forward chain by default; PRIFIT_FOLDED_BN=1
        # opts into the folded-into-dense variant (A/B switch, like
        # PRIFIT_GATHER).  Folded was measured SLOWER in training (f32
        # sup step 59 -> 121 ms): the input-covariance stats matmul and
        # its transpose dwarf the dense at wide-input layers.
        folded = os.environ.get("PRIFIT_FOLDED_BN", "0") == "1"
        dt = _run_dtype(self, train)
        # PRIFIT_REMAT_MLP=1: remat the chain so the backward recomputes
        # the [rows, F] intermediates.  Measured SLOWER on the sup step
        # (74.5 vs 59.3 ms — XLA already streams the residuals well), so
        # it is an opt-in for memory-bound regimes (large-N point-SP),
        # not a speed knob.
        remat = os.environ.get("PRIFIT_REMAT_MLP", "0") == "1"
        if train and remat and not folded and self.dtype != FQ:
            params = tuple((self.ws[i], self.bs[i], self.bn[i][0],
                            self.bn[i][1])
                           for i in range(len(self.features)))
            chain = jax.checkpoint(
                _mlp_chain_pure, static_argnums=(2, 3))
            y, stats = chain(x, params, self.axis_name, dt)
            # local row count, matching _bn_forward's unbiased correction
            n = x.size // x.shape[-1]
            for i, (mean, var) in enumerate(stats):
                _update_running(self, self.bn[i], mean, var,
                                bn_momentum, n)
            return y
        for i in range(len(self.features)):
            if self.dtype == FQ or not folded:
                # explicit chain (fq: the straight-through rounding must
                # see the same op sequence real bf16 runs)
                x = _dense(x, self.ws[i], self.bs[i], dt
                           if self.dtype != FQ else self.dtype)
                x = _bn_forward(self, self.bn[i], x, train, bn_momentum)
                if self.dtype == FQ:
                    x = _stq(x)   # bf16 mode rounds BN output to bf16
                x = nn.relu(x)
            else:
                x = _dense_bn_relu_folded(self, x, self.ws[i],
                                          self.bs[i], self.bn[i], train,
                                          bn_momentum, dt)
        return x

    def call_max(self, x, train: bool, bn_momentum=0.1):
        """``[..., K, Fi] -> [..., Fo]``: the chain with its LAST layer
        and the K-max (axis -2) fused into the closed-form custom-VJP
        region (``nn/mixed.py::_max_bwd_core``).

        OPT-IN A/B (``PRIFIT_MAX_REGION=on``), measured a LOSS and
        default-off: the closed-form region that wins inside the mxsr
        whole-chain region LOSES as a standalone f32 last-layer region —
        XLA materializes the [rows, K, F] gsm/zsel broadcasts when the
        dz fusion is consumed flat (f32 sup step 59.9 -> 76.0 ms; an
        optimization-barrier'd 3-D variant recovered only to 63.5, and
        the same 3-D restructure regressed mxsr 58.9 -> 65.5, so the
        shipped ``_max_bwd_core`` keeps the flat form the mxsr region
        fuses well).  Default path: ``max(self(x), axis=-2)`` autodiff,
        which XLA fuses competitively at every storage dtype."""
        region_ok = (
            train and self.axis_name is None and self.dtype != FQ
            and os.environ.get("PRIFIT_FOLDED_BN", "0") != "1"
            and os.environ.get("PRIFIT_REMAT_MLP", "0") != "1"
            and os.environ.get("PRIFIT_MAX_REGION", "off") == "on")
        if not region_ok:
            return jnp.max(self(x, train, bn_momentum), axis=-2)
        dt = _run_dtype(self, train)
        n_l = len(self.features)
        for i in range(n_l - 1):
            x = _dense(x, self.ws[i], self.bs[i], dt)
            x = _bn_forward(self, self.bn[i], x, train, bn_momentum)
            x = nn.relu(x)
        i = n_l - 1
        storage = jnp.bfloat16 if _eff(self.dtype) == jnp.bfloat16 \
            else jnp.float32
        out, stats = mx_chain(
            (False, True, False), x,
            (None, ((self.ws[i], self.bs[i], self.bn[i][0],
                     self.bn[i][1]),)),
            storage=storage)
        _update_running(self, self.bn[i], *stats[0], bn_momentum,
                        x.size // x.shape[-1])
        return out

    def mx_params(self):
        """((w, b, bn_scale, bn_bias), ...) for the mx region."""
        return tuple((self.ws[i], self.bs[i], self.bn[i][0],
                      self.bn[i][1]) for i in range(len(self.features)))

    def mx_update_stats(self, stats, momentum, n):
        for i, (mean, var) in enumerate(stats):
            _update_running(self, self.bn[i], mean, var, momentum, n)


class GroupedFirstLayer(nn.Module):
    """First grouped-MLP layer with a width-aware gather.

    The first layer is affine, so it decomposes around the neighborhood
    gather:

        W [feat_j ; xyz_j - c_s] + b
          = (W_f feat_j + W_x xyz_j + b)  [per point or per neighbor]
            - W_x c_s                     [per query center, S rows]

    and the gather (a one-hot MXU matmul on TPU, ``gather_neighbors``)
    costs FLOPs proportional to the gathered WIDTH.  So gather whichever
    side is narrower:

      - raw inputs narrow (sa1: xyz only, width 3): gather the raw
        neighborhood, project after — the projection runs on S*K rows but
        the gather is ~free;
      - raw inputs wide (sa2: 320-d features): project all N points to
        ``features`` first, gather the projections (S*K/N ~ 32x fewer
        projection FLOPs, reference-layout path).

    Both orders are the same math with the same parameters; BN stats and
    outputs match up to matmul rounding.  ``d_in`` is the static width of
    ``points`` (0 when None).
    """
    features: int
    d_in: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        f = self.features
        self.w_xyz = self.param("w_xyz", nn.initializers.lecun_normal(),
                                (3, f))
        if self.d_in:
            self.w_feat = self.param(
                "w_feat", nn.initializers.lecun_normal(), (self.d_in, f))
            self.b_feat = self.param("b_feat", nn.initializers.zeros, (f,))
        else:
            self.b = self.param("bias", nn.initializers.zeros, (f,))
        self.bn = (
            self.param("bn_scale", nn.initializers.ones, (f,)),
            self.param("bn_bias", nn.initializers.zeros, (f,)),
            self.variable("batch_stats", "bn_mean",
                          lambda: jnp.zeros(f, jnp.float32)),
            self.variable("batch_stats", "bn_var",
                          lambda: jnp.ones(f, jnp.float32)),
        )

    def pre_affine(self, xyz, points):
        """Per-point affine part (``W_f feat + W_x xyz + b``), [B, N, F]."""
        pre = _dense(xyz, self.w_xyz)
        if self.d_in:
            pre = pre + _dense(points, self.w_feat, self.b_feat)
        else:
            pre = pre + self.b
        return pre

    def pre_tensor(self, xyz, points, new_xyz, idx):
        """The pre-BN grouped activation [B, S, K, features]: ONE exact
        (HIGHEST) gather per scale of whichever side is narrower (raw
        inputs vs the combined ``pre_affine`` projection), then subtract
        the projected center.

        Round-5 refuted restructures (measured on-chip, mxsr sup /
        selfsup step; this combined-gather form is 59.4 / 80.9 ms):

        - difference-first xyz (gather raw coords, subtract the center
          at width 3, project the difference — the reference's own op
          order, ``pointnet_util.py:130-137``) with the feature
          projection gathered separately as bf16: 69.1 / 91.4 ms.
        - same two-gather structure but the xyz part projected at F
          width before the subtraction (no minor-dim-3 elementwise
          ops): 69.5 / 91.5 ms.

        The two variants bracket the cause: it is not the narrow-lane
        layout and not gather precision — a SECOND gather per scale
        costs ~10 ms across the encoder (each gather pays the full
        [B, S, K, N] one-hot/index side regardless of gathered width),
        which swamps the bf16-vs-HIGHEST saving on the wide tables.
        The exact combined gather stays (also the accuracy-mandated
        choice: the projected-neighbor minus projected-center
        difference is cancellation-sensitive, STATUS.md round 2)."""
        prec = jax.lax.Precision.HIGHEST
        if 3 + self.d_in <= self.features:
            grouped = _dense(
                gather_neighbors(xyz, idx, precision=prec),
                self.w_xyz)
            if self.d_in:
                grouped = grouped + _dense(
                    gather_neighbors(points, idx, precision=prec),
                    self.w_feat, self.b_feat)
            else:
                grouped = grouped + self.b
        else:
            grouped = gather_neighbors(
                self.pre_affine(xyz, points), idx, precision=prec)
        return grouped - _dense(new_xyz, self.w_xyz)[:, :, None, :]

    def mx_bn_params(self):
        return self.bn[0], self.bn[1]

    def mx_update_stats(self, mean, var, momentum, n):
        _update_running(self, self.bn, mean, var, momentum, n)

    def __call__(self, xyz, points, new_xyz, idx, train: bool,
                 bn_momentum=0.1):
        """xyz [B, N, 3]; points [B, N, D] or None; new_xyz [B, S, 3];
        idx [B, S, K] -> [B, S, K, features] (post-BN, post-ReLU).

        The OUTPUT (a small relative quantity, safe in bf16 — see
        ``pre_tensor``) is cast to ``dtype`` for the downstream chain."""
        grouped = self.pre_tensor(xyz, points, new_xyz, idx)
        grouped = _cast(grouped, _run_dtype(self, train))
        grouped = _bn_forward(self, self.bn, grouped, train, bn_momentum)
        if self.dtype == FQ:
            grouped = _stq(grouped)
        return nn.relu(grouped)


def _run_scale(module, gfl, pmlp, mlp, xyz, points, new_xyz, idx, train,
               bn_momentum):
    """One SA scale: grouped first layer + chain + max over K, via the
    mx custom-VJP region (train) or the jnp path."""
    B, N, _ = xyz.shape
    S, K = idx.shape[1], idx.shape[2]
    if _mx_mode(module, train):
        pre = gfl.pre_tensor(xyz, points, new_xyz, idx)
        if module.dtype == MXSR:
            # bf16 boundary: same forward values (the region casts to
            # bf16 anyway); the [B, S, K, F] pre and its SR'd exit
            # cotangent are the two largest stage tensors
            pre = pre.astype(jnp.bfloat16)
        params = (gfl.mx_bn_params(), pmlp.mx_params())
        out, stats = mx_chain((True, True, module.dtype == MXSR), pre,
                              params, key=_mx_key(module))
        n = B * S * K
        gfl.mx_update_stats(*stats[0], bn_momentum, n)
        pmlp.mx_update_stats(stats[1:], bn_momentum, n)
        return out
    h = gfl(xyz, points, new_xyz, idx, train, bn_momentum)
    return pmlp.call_max(h, train, bn_momentum)


def _fps_idx(module, xyz, npoint, train):
    """Random-start FPS in training (the reference's ``torch.randint``,
    ``pointnet_util.py:77``), start-0 deterministic in eval.
    ``PRIFIT_DET_FPS=1`` pins the start in training too — used by the
    full-model trajectory-parity test (tests/test_model_parity.py),
    which patches the reference's ``torch.randint`` to zero the same
    way."""
    if not train or os.environ.get("PRIFIT_DET_FPS", "0") == "1":
        return farthest_point_sample(xyz, npoint, deterministic=True)
    return farthest_point_sample(xyz, npoint,
                                 key=module.make_rng("sampling"))


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer (``pointnet_util.py:160-201``).

    Grouped features are ``concat([xyz - center, point_feats])`` (xyz
    first — note MSG uses the opposite order, matching the reference).
    """
    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    group_all: bool = False
    axis_name: str | None = None
    fused: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, points, train: bool, bn_momentum=0.1):
        """xyz [B, N, 3], points [B, N, D] or None ->
        (new_xyz [B, S, 3], new_points [B, S, mlp[-1]])."""
        d_in = 0 if points is None else points.shape[-1]
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
            pmlp = PointMLP(self.mlp, 3 + d_in, self.axis_name,
                            self.dtype)
            if _mx_mode(self, train):
                out, stats = mx_chain(
                    (False, True, self.dtype == MXSR),
                    grouped.astype(jnp.bfloat16 if self.dtype == MXSR
                                   else jnp.float32),
                    (None, pmlp.mx_params()), key=_mx_key(self))
                pmlp.mx_update_stats(
                    stats, bn_momentum,
                    grouped.size // grouped.shape[-1])
                return new_xyz, out
            out = pmlp(grouped, train, bn_momentum)
            return new_xyz, jnp.max(out, axis=2)

        # f32 mode keeps gather BACKWARDS exact too (no bf16 cotangent
        # rounding; ops/sampling.py::index_points precision note)
        prec = None if _run_dtype(self, train) == jnp.bfloat16 \
            else jax.lax.Precision.HIGHEST
        fps_idx = _fps_idx(self, xyz, self.npoint, train)
        new_xyz = index_points(xyz, fps_idx, precision=prec)

        # ``fused`` selects ball-query SEMANTICS only (nearest-k vs the
        # reference's first-k-by-index); the parameter layout is shared,
        # so checkpoints are portable across the A/B knob and the torch
        # importer (train/torch_port.py) targets one layout.
        if self.fused:
            (idx,) = ball_query_nearest_shared(
                [self.radius], [self.nsample], xyz, new_xyz)
        else:
            idx = query_ball_point(self.radius, self.nsample, xyz,
                                   new_xyz)
        gfl = GroupedFirstLayer(self.mlp[0], d_in, self.axis_name,
                                self.dtype)
        pmlp = PointMLP(self.mlp[1:], self.mlp[0], self.axis_name,
                        self.dtype)
        out = _run_scale(self, gfl, pmlp, self.mlp, xyz, points,
                         new_xyz, idx, train, bn_momentum)
        return new_xyz, out


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA layer (``pointnet_util.py:204-261``).

    One FPS, then per-radius ball-query/group/MLP/max, channel concat.
    Grouped features are ``concat([point_feats, xyz - center])`` (features
    first — the reference's MSG ordering, opposite of SSG).
    """
    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    axis_name: str | None = None
    fused: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, points, train: bool, bn_momentum=0.1):
        prec = None if _run_dtype(self, train) == jnp.bfloat16 \
            else jax.lax.Precision.HIGHEST
        d_in = 0 if points is None else points.shape[-1]
        fps_idx = _fps_idx(self, xyz, self.npoint, train)
        new_xyz = index_points(xyz, fps_idx, precision=prec)

        outs = []
        # ``fused`` selects ball-query SEMANTICS only (nearest-k vs the
        # reference's first-k-by-index); the parameter layout is shared
        # across the knob (see SetAbstraction).
        if self.fused:
            # one distance matrix + one packed min_k serves every radius;
            # per-radius neighbor lists are prefixes of the same sorted set
            idx_list = ball_query_nearest_shared(
                self.radius_list, self.nsample_list, xyz, new_xyz)
        else:
            idx_list = [query_ball_point(radius, k, xyz, new_xyz)
                        for radius, k in zip(self.radius_list,
                                             self.nsample_list)]
        for i, (idx, mlp) in enumerate(zip(idx_list, self.mlp_list)):
            gfl = GroupedFirstLayer(mlp[0], d_in, self.axis_name,
                                    self.dtype,
                                    name=f"GroupedFirstLayer_{i}")
            pmlp = PointMLP(mlp[1:], mlp[0], self.axis_name,
                            self.dtype, name=f"PointMLP_{i}")
            outs.append(_run_scale(self, gfl, pmlp, mlp, xyz, points,
                                   new_xyz, idx, train, bn_momentum))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + skip concat + MLP
    (``pointnet_util.py:264-314``).  ``mlp`` may be empty (the reference's
    extra_layers fp1 variant)."""
    mlp: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool,
                 bn_momentum=0.1):
        """xyz1 [B, N, 3] dense, xyz2 [B, S, 3] coarse,
        points1 [B, N, D1] skip or None, points2 [B, S, D2]."""
        # exact feature gather in f32 mode; bf16 rounding is fine (and
        # cheaper) when the whole chain is bf16 anyway
        prec = None if _run_dtype(self, train) == jnp.bfloat16 \
            else jax.lax.Precision.HIGHEST
        interpolated = three_nn_interpolate(xyz1, xyz2, points2,
                                            precision=prec)
        if self.dtype == FQ:   # bf16 mode hands the chain bf16 values
            interpolated = _stq(interpolated)
        if points1 is not None:
            x = jnp.concatenate(
                [points1, interpolated.astype(points1.dtype)], axis=-1)
        else:
            x = interpolated
        if self.mlp:
            x = PointMLP(self.mlp, x.shape[-1], self.axis_name,
                         self.dtype)(x, train, bn_momentum)
        return x

#!/usr/bin/env python
"""Headline benchmark: clouds/sec/chip for the PRIFIT hot path.

Measures the flagship pipeline at the canonical recipe's shapes
(batch 24, 2048 points: PointNet++ MSG forward + mean-shift clustering
(10 iterations, <=25 clusters) + weighted ellipsoid fitting + primitive
sampling + SDF/NN chamfer) on the default JAX device, all inside one jit.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

``vs_baseline`` is the ratio against the measured torch-CPU double of the
reference pipeline (``tools/reference_baseline_torch.py``; the reference
publishes no numbers and its code is hard-wired to CUDA + open3d, so CPU
torch is the only hardware it can be measured on here — see BASELINE.md).
The cached measurement lives in BASELINE_MEASURED.json.
"""

import json
import os
import time

import numpy as np

# persistent compilation cache: the pipeline compile is 30-150s cold
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BATCH = int(os.environ.get("BENCH_BATCH", 24))
NPOINT = int(os.environ.get("BENCH_NPOINT", 2048))
REPS = int(os.environ.get("BENCH_REPS", 10))
TRIALS = int(os.environ.get("BENCH_TRIALS", 3))
SYNC_OVERHEAD_S = 0.027  # axon tunnel round-trip (see .claude verify notes)

# The axon tunnel is shared: a second TPU client slows both ~2x
# (CLAUDE.md).  Every timing below therefore takes TRIALS independent
# passes and reports the MIN; if passes within one measurement disagree
# by more than this ratio, the JSON carries contention_suspected=true so
# the artifact is self-evidently (un)trustworthy.
CONTENTION_SPREAD = 1.3
_trial_spreads: list[float] = []


def _time_min(run_once, reps: int) -> float:
    """Min per-rep seconds over TRIALS timing passes of ``run_once``
    (which must execute ``reps`` device iterations and block on the
    result).  Records the max/min spread for the contention flag."""
    dts = []
    for _ in range(TRIALS):
        t0 = time.time()
        run_once()
        dts.append(max((time.time() - t0 - SYNC_OVERHEAD_S) / reps, 1e-9))
    _trial_spreads.append(max(dts) / min(dts))
    return min(dts)


def measure_tpu() -> tuple[float, float, float, float]:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    # shared flagship construction (tiny init batch: parameter shapes are
    # batch-independent, and a full-size init would double cold-compile)
    mod, model, state, _, _, _ = _flagship(
        npoint=64, quantile=0.05, msc_iterations=10, max_num_clusters=25,
        n_per_prim=256, batch=2)
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(BATCH, NPOINT, 3)), jnp.float32)
    cls = jnp.zeros((BATCH, 16), jnp.float32)

    kwargs = dict(include_convex_loss=True, quantile=0.05,
                  msc_iterations=10, max_num_clusters=25, n_per_prim=256)
    variables = state.variables()

    @jax.jit
    def many(points, cls):
        # each rep perturbs the input with the previous rep's loss so the
        # loop body is NOT loop-invariant (XLA would hoist it otherwise)
        def body(carry, _):
            pts, acc = carry
            out, _ = model.apply(
                variables, pts, cls, chamfer_points=pts,
                train=False, mutable=["selfsup_state"], **kwargs)
            loss = out.total_loss
            return (points + 1e-6 * loss, acc + loss), None

        (_, acc), _ = jax.lax.scan(body, (points, 0.0), None, length=REPS)
        return acc

    t0 = time.time()
    v = float(np.asarray(many(points, cls)))
    compile_s = time.time() - t0
    assert np.isfinite(v), "non-finite benchmark loss"

    dt = _time_min(lambda: float(np.asarray(many(points, cls))), REPS)

    ss_dt, sup_dt, ss_mfu, sup_mfu = _measure_train_steps(
        mod, model, state, points, cls)
    return (BATCH / dt, BATCH / ss_dt, BATCH / sup_dt, compile_s,
            ss_mfu, sup_mfu)


# v5e peak is 197 bf16 TFLOPS/chip; DEFAULT-precision f32 matmuls run as
# single-pass bf16 on the MXU, so this is the honest denominator for both
# dtype modes (HIGHEST-precision ops undercount their passes — noted).
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def _step_flops(step, *args) -> float | None:
    """XLA's model-FLOPs estimate for one compiled step (None if the
    backend doesn't expose cost analysis)."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _mfu(flops: float | None, dt: float) -> float | None:
    if flops is None or dt <= 0:
        return None
    return flops / dt / (PEAK_TFLOPS * 1e12)


def _measure_train_steps(mod, model, state, points, cls):
    """Self-sup + supervised step (fwd+bwd+opt) times for one model.

    These regression-track the fused mean-shift backward, the
    one-hot/lane gather gradients, and the encoder backward, which the
    eval-mode headline cannot see.  Returns (ss_dt, sup_dt, ss_mfu,
    sup_mfu); MFU = XLA cost-analysis FLOPs / time / v5e bf16 peak.
    """
    import jax
    import jax.numpy as jnp

    from prifit_tpu.train.steps import make_selfsup_step, make_supervised_step

    ss_step = make_selfsup_step(
        model, include_convex_loss=True, quantile=0.05, msc_iterations=10,
        max_num_clusters=25, n_per_prim=256)
    key = jax.random.PRNGKey(0)
    st, m = ss_step(state, points, points, cls, 0.001, 0.1, 1.0, key)
    assert np.isfinite(float(np.asarray(m["ss_loss"])))

    def run_ss():
        st, m = state, None
        for _ in range(REPS):
            st, m = ss_step(st, points, points, cls, 0.001, 0.1, 1.0, key)
        _ = float(np.asarray(m["ss_loss"]))

    ss_dt = _time_min(run_ss, REPS)
    ss_mfu = _mfu(_step_flops(ss_step, state, points, points, cls,
                              0.001, 0.1, 1.0, key), ss_dt)

    sup_step = make_supervised_step(model, mod.get_loss)
    target = jnp.zeros((BATCH, NPOINT), jnp.int32)
    st, m = sup_step(state, points, cls, target, 0.001, 0.1, key)
    assert np.isfinite(float(np.asarray(m["loss"])))

    def run_sup():
        st, m = state, None
        for _ in range(REPS):
            st, m = sup_step(st, points, cls, target, 0.001, 0.1, key)
        _ = float(np.asarray(m["loss"]))

    sup_dt = _time_min(run_sup, REPS)
    sup_mfu = _mfu(_step_flops(sup_step, state, points, cls, target,
                               0.001, 0.1, key), sup_dt)
    return ss_dt, sup_dt, ss_mfu, sup_mfu


def measure_alt_steps(compute_dtype: str) -> tuple[float, float]:
    """Train-step rates under an explicit ``--encoder_dtype``.

    The main fields track the DEFAULT mode (auto == mxsr since round 5);
    this secondary measurement keeps the f32 comparison on the record.
    Disable with BENCH_SECONDARY=none.
    """
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    mod, model, state, _, _, _ = _flagship(
        npoint=64, quantile=0.05, msc_iterations=10, max_num_clusters=25,
        n_per_prim=256, batch=2, compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(BATCH, NPOINT, 3)), jnp.float32)
    cls = jnp.zeros((BATCH, 16), jnp.float32)
    ss_dt, sup_dt, ss_mfu, sup_mfu = _measure_train_steps(
        mod, model, state, points, cls)
    return BATCH / ss_dt, BATCH / sup_dt, ss_mfu, sup_mfu


def load_baseline() -> float | None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["clouds_per_sec"]
    return None


def main():
    (clouds_per_sec, train_clouds_per_sec, sup_clouds_per_sec,
     compile_s, ss_mfu, sup_mfu) = measure_tpu()
    baseline = load_baseline()
    vs = clouds_per_sec / baseline if baseline else 0.0
    extra = {"encoder_dtype_default": "mxsr"}
    if ss_mfu is not None:
        extra["selfsup_train_step_mfu"] = round(ss_mfu, 4)
    if sup_mfu is not None:
        extra["supervised_train_step_mfu"] = round(sup_mfu, 4)
    # cross-round continuity: the _mxsr fields ARE the default-mode
    # numbers now (auto == mxsr since round 5)
    extra["selfsup_train_step_ms_mxsr"] = \
        round(1000.0 * BATCH / train_clouds_per_sec, 2)
    extra["supervised_train_step_ms_mxsr"] = \
        round(1000.0 * BATCH / sup_clouds_per_sec, 2)
    secondary = os.environ.get("BENCH_SECONDARY", "f32")
    if secondary != "none":
        alt_ss, alt_sup, alt_ss_mfu, alt_sup_mfu = \
            measure_alt_steps(secondary)
        extra.update({
            f"selfsup_train_step_ms_{secondary}":
                round(1000.0 * BATCH / alt_ss, 2),
            f"supervised_train_step_ms_{secondary}":
                round(1000.0 * BATCH / alt_sup, 2),
        })
        if alt_ss_mfu is not None:
            extra[f"selfsup_train_step_mfu_{secondary}"] = \
                round(alt_ss_mfu, 4)
        if alt_sup_mfu is not None:
            extra[f"supervised_train_step_mfu_{secondary}"] = \
                round(alt_sup_mfu, 4)
    print(json.dumps({
        "metric": "prifit fwd+fit clouds/sec/chip "
                  f"(B={BATCH}, N={NPOINT}, msc=10, K=25) "
                  "[baseline: reference pipeline double on cpu-torch]",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(vs, 2),
        "selfsup_train_step_clouds_per_sec":
            round(train_clouds_per_sec, 3),
        "selfsup_train_step_ms":
            round(1000.0 * BATCH / train_clouds_per_sec, 2),
        "supervised_train_step_clouds_per_sec":
            round(sup_clouds_per_sec, 3),
        "supervised_train_step_ms":
            round(1000.0 * BATCH / sup_clouds_per_sec, 2),
        **extra,
        "timing_trials": TRIALS,
        "trial_spread_max": round(max(_trial_spreads), 3),
        "contention_suspected": max(_trial_spreads) > CONTENTION_SPREAD,
    }))


if __name__ == "__main__":
    main()

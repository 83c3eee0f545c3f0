"""Measure the five BASELINE.json configs on the current device.

The reference publishes no numbers and cannot run here (CUDA + trimesh
hard requirements), so these are this framework's numbers for each
prescribed config, with the torch-CPU double of the full pipeline
(BASELINE_MEASURED.json) as the only available reference point.

Usage: python tools/bench_baseline_configs.py   (prints one JSON line per
config; ~3 min warm on a v5e with the compile cache)
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

RT_S = 0.027
REPS = 10


def _sync_time(fn, *args):
    _ = float(np.asarray(fn(*args)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0 - RT_S) / REPS


def emit(name, clouds_per_sec, note=""):
    print(json.dumps({"config": name,
                      "clouds_per_sec_per_chip": round(clouds_per_sec, 2),
                      "note": note}))


def config1_pointnet_fwd_fit():
    """BASELINE config 1: PointNet part-seg fwd on 8 x 2048 clouds +
    ellipsoid fit (the reference does the fit in numpy on CPU; here the
    whole thing is one jitted TPU program)."""
    from prifit_tpu.clustering.mean_shift import cluster_batch
    from prifit_tpu.geometry.fitting import fit_ellipsoids_batch
    from prifit_tpu.models import get_module, to_categorical

    B, N = 8, 2048
    mod = get_module("pointnet_part_seg")
    model = mod.get_model(part_num=50)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = to_categorical(jnp.zeros((B, 1), jnp.int32))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0)), pts, cls, train=False)

    def body(p):
        def step(c, _):
            out = model.apply(variables, p + c * 1e-9, cls, train=False)
            emb = out.feat / jnp.maximum(jnp.linalg.norm(
                out.feat, axis=-1, keepdims=True), 1e-12)
            res = cluster_batch(emb, quantile=0.05, iterations=5,
                                max_num_clusters=25, num_candidates=1)
            fit = fit_ellipsoids_batch(p, res.weights, res.valid)
            return jnp.sum(fit.r ** 2) * 1e-6, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s

    fn = jax.jit(body)
    dt = _sync_time(fn, pts) / REPS
    emit("1: pointnet part-seg fwd + ellipsoid fit (B=8, N=2048)",
         B / dt, "reference does this fit in numpy on CPU")


def config2_ssg_eval():
    """BASELINE config 2: PointNet++ SSG part-seg eval forward (the
    k-shot mIoU itself needs real ShapeNet; see STATUS.md for the
    synthetic-data few-shot result)."""
    from prifit_tpu.models import get_module, to_categorical

    B, N = 24, 2048
    mod = get_module("pointnet2_part_seg_ssg")
    model = mod.get_model(num_classes=50)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = to_categorical(jnp.zeros((B, 1), jnp.int32))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), sampling=jax.random.PRNGKey(1),
             dropout=jax.random.PRNGKey(2)), pts, cls, train=False)

    def body(p):
        def step(c, _):
            out = model.apply(variables, p + c * 1e-9, cls, train=False)
            return jnp.sum(out.seg_logits ** 2) * 1e-9, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s

    dt = _sync_time(jax.jit(body), pts) / REPS
    emit("2: pointnet2 SSG part-seg eval fwd (B=24, N=2048)", B / dt,
         "synthetic few-shot mIoU in STATUS.md")


def config3_msg_contrastive():
    """BASELINE config 3: MSG + ACD pairwise contrastive self-sup step
    (batch 24)."""
    from prifit_tpu.models import get_module
    from prifit_tpu.train.state import create_train_state
    from prifit_tpu.train.steps import make_contrastive_step

    B, N = 24, 2048
    mod = get_module("pointnet2_part_seg_msg")
    model = mod.get_model(num_parts=50)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = jnp.zeros((B, 16), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 8, (B, N)), jnp.int32)
    state = create_train_state(model, (pts[:2, :64], cls[:2]),
                               dict(train=True))
    step = make_contrastive_step(model, mod.get_selfsup_loss)
    key = jax.random.PRNGKey(0)
    st, m = step(state, pts, cls, seg, 0.001, 0.1, 1.0, key)
    _ = float(np.asarray(m["ss_loss"]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, m = step(st, pts, cls, seg, 0.001, 0.1, 1.0, key)
    _ = float(np.asarray(m["ss_loss"]))
    dt = (time.perf_counter() - t0 - RT_S) / REPS
    emit("3: MSG + ACD contrastive self-sup step (B=24, N=2048)", B / dt,
         "fwd+bwd+opt")


def config4_dgcnn_cluster():
    """BASELINE config 4: DGCNN encoder + mean-shift clustering
    (max_num_clusters=25, msc_iterations=10)."""
    from prifit_tpu.clustering.mean_shift import cluster_batch
    from prifit_tpu.models import get_module

    B, N = 8, 2048
    mod = get_module("dgcnn")
    model = mod.get_model(num_parts=50, nn_nb=20)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = jnp.zeros((B, 16), jnp.float32)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1)),
        pts, cls, train=False)

    def body(p):
        def step(c, _):
            out = model.apply(variables, p + c * 1e-9, cls, train=False)
            emb = out.feat / jnp.maximum(jnp.linalg.norm(
                out.feat, axis=-1, keepdims=True), 1e-12)
            res = cluster_batch(emb, quantile=0.05, iterations=10,
                                max_num_clusters=25, num_candidates=1)
            return jnp.sum(res.weights) * 1e-6, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s

    dt = _sync_time(jax.jit(body), pts) / REPS
    emit("4: DGCNN encoder + mean-shift (B=8, N=2048, msc=10, K=25)",
         B / dt)


def config5_joint():
    """BASELINE config 5: full PRIFIT joint semi-sup step pair
    (supervised CE + convex self-sup), per chip; the 8-chip path is
    validated by dryrun_multichip (MULTICHIP_r*.json)."""
    from prifit_tpu.models import get_module
    from prifit_tpu.train.state import create_train_state, \
        selfsup_init_kwargs
    from prifit_tpu.train.steps import make_selfsup_step, \
        make_supervised_step

    B, N = 24, 2048
    mod = get_module("pointnet2_part_seg_msg")
    model = mod.get_model(num_parts=50)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = jnp.zeros((B, 16), jnp.float32)
    target = jnp.zeros((B, N), jnp.int32)
    state = create_train_state(model, (pts[:2, :64], cls[:2]),
                               selfsup_init_kwargs(pts[:2, :64]))
    sup = make_supervised_step(model, mod.get_loss)
    ss = make_selfsup_step(model, include_convex_loss=True, quantile=0.05,
                           msc_iterations=10, max_num_clusters=25,
                           n_per_prim=256)
    key = jax.random.PRNGKey(0)
    st, m = sup(state, pts, cls, target, 0.001, 0.1, key)
    st, m2 = ss(st, pts, pts, cls, 0.001, 0.1, 1.0, key)
    _ = float(np.asarray(m2["ss_loss"]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, m = sup(st, pts, cls, target, 0.001, 0.1, key)
        st, m2 = ss(st, pts, pts, cls, 0.001, 0.1, 1.0, key)
    _ = float(np.asarray(m2["ss_loss"]))
    dt = (time.perf_counter() - t0 - RT_S) / REPS
    emit("5: joint semi-sup iteration (sup CE + convex self-sup, B=24)",
         B / dt, "per chip; 8-chip sharding validated by dryrun_multichip")


def main():
    print(json.dumps({"device": jax.devices()[0].platform,
                      "note": "reference unrunnable here; torch-CPU "
                              "double = 0.36 clouds/s on config 5's "
                              "pipeline (BASELINE_MEASURED.json)"}))
    config1_pointnet_fwd_fit()
    config2_ssg_eval()
    config3_msg_contrastive()
    config4_dgcnn_cluster()
    config5_joint()


if __name__ == "__main__":
    main()

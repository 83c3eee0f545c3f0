"""Fine-grained timing of the convex-loss pipeline pieces.

The perf ledger (CLAUDE.md) names "selfsup backward (mean-shift bwd +
fit/chamfer grads)" and "clustering fwd ~12 ms" as the remaining hot
spots; this tool splits the ~37 ms selfsup-minus-supervised delta into
per-piece fwd and fwd+bwd times at the canonical recipe shapes
(B=24, N=2048, D=128, K=25, msc=10, n_per_prim=256).

Methodology per CLAUDE.md: chain reps through a data dependence inside
one jit, reduce through a nonlinearity, sync by pulling a scalar,
subtract the ~27 ms tunnel round trip.

Usage: python tools/bench_selfsup_parts.py [piece ...]
Pieces: cluster fit sample chamfer loss  (default: all; each piece
prints fwd and fwd+grad rows)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, K, MSC, NPP = 24, 2048, 128, 25, 10, 256
REPS = 10
RT_S = 0.027


def timed(name, jitted, *args):
    v = float(np.asarray(jitted(*args)).ravel()[0])
    assert np.isfinite(v), f"{name}: non-finite ({v})"
    t0 = time.perf_counter()
    v = float(np.asarray(jitted(*args)).ravel()[0])
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{name:26s} {dt:8.2f} ms")
    return dt


def chained(body, grad=False):
    """body(x, *rest) -> scalar; chain REPS times through a data dep."""
    if grad:
        g = jax.grad(body)

        def step_fn(x, *rest):
            def step(carry, _):
                gx = g(x + carry * 1e-12, *rest)
                return jnp.sum(gx.astype(jnp.float32) ** 2) * 1e-6, None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s
    else:
        def step_fn(x, *rest):
            def step(carry, _):
                return body(x + carry * 1e-12, *rest) * 1e-6, None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s
    return jax.jit(step_fn)


def main():
    global B, N, NPP, REPS, RT_S
    argv = list(sys.argv[1:])
    if "--cpu" in argv:
        # Smoke mode: tiny shapes on the host (the axon plugin overrides
        # JAX_PLATFORMS, so force it after import like tests/conftest.py).
        argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        B, N, NPP, REPS, RT_S = 2, 256, 64, 2, 0.0
    pieces = set(argv) or {"cluster", "fit", "sample", "chamfer", "loss"}
    print(f"backend: {jax.default_backend()}  B={B} N={N} D={D} K={K} "
          f"msc={MSC} npp={NPP}")
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    # structured embeddings: a few blobs so clustering finds >1 cluster
    centers = rng.normal(size=(B, 6, D))
    asn = rng.integers(0, 6, (B, N))
    X = jnp.asarray(centers[np.arange(B)[:, None], asn]
                    + 0.05 * rng.normal(size=(B, N, D)), jnp.float32)
    X = X / jnp.linalg.norm(X, axis=2, keepdims=True)

    from prifit_tpu.clustering.mean_shift import cluster_batch
    from prifit_tpu.geometry.convex_loss import convex_loss
    from prifit_tpu.geometry.fitting import fit_ellipsoids_batch
    from prifit_tpu.geometry.losses import analytic_chamfer
    from prifit_tpu.geometry.sampling import sample_primitives_batch

    kw = dict(quantile=0.05, iterations=MSC, max_num_clusters=K,
              num_candidates=2)

    cl = jax.jit(lambda x: cluster_batch(x, **kw))(X)
    cl = jax.tree.map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, cl)
    params = jax.jit(fit_ellipsoids_batch)(pts, cl.weights, cl.valid)
    samples, sample_w = jax.jit(
        lambda p: sample_primitives_batch(p, n_per_prim=NPP))(params)
    print("max clusters found:",
          int(np.asarray(jnp.max(jnp.sum(cl.valid, axis=1)))))

    if "cluster" in pieces:
        def c_fwd(x):
            c = cluster_batch(x, **kw)
            return jnp.sum(c.weights ** 2)
        timed("cluster fwd", chained(c_fwd), X)
        timed("cluster fwd+grad(X)", chained(c_fwd, grad=True), X)

    if "clusterparts" in pieces:
        from prifit_tpu.clustering.mean_shift import (
            _bandwidth_candidates,
            mean_shift_iterations,
            membership,
            nms_fixed_slots,
        )

        def bw_fwd(x):
            return jnp.sum(jax.vmap(
                lambda s: _bandwidth_candidates(s, 0.05, 2))(x) ** 2)
        timed("  bandwidth (2 cand)", chained(bw_fwd), X)

        bws = jax.vmap(
            lambda s: _bandwidth_candidates(s, 0.05, 2))(X)[:, 0]

        def ms_fwd(x):
            m = jax.vmap(lambda s, b: mean_shift_iterations(
                s, b, MSC, "gaussian"))(x, bws)
            return jnp.sum(m ** 2)
        timed("  mean-shift x10 fwd", chained(ms_fwd), X)
        timed("  mean-shift x10 f+g", chained(ms_fwd, grad=True), X)

        modes = jax.jit(lambda x: jax.vmap(
            lambda s, b: mean_shift_iterations(s, b, MSC, "gaussian"))(
                x, bws))(X)

        def nms_fwd(m):
            ids, valid, nd = jax.vmap(
                lambda mm, b: nms_fixed_slots(mm, b, K))(m, bws)
            return jnp.sum(valid.astype(jnp.float32) ** 2) \
                + jnp.sum(nd.astype(jnp.float32)) * 1e-6
        timed("  nms", chained(nms_fwd), modes)

        def mem_fwd(m):
            ids, valid, _ = jax.vmap(
                lambda mm, b: nms_fixed_slots(mm, b, K))(m, bws)
            centers = jnp.take_along_axis(
                m, ids[..., None], axis=1) * valid[..., None]
            w = jax.vmap(lambda c, v, s, b: membership(c, v, s, b))(
                centers, valid, X, bws)
            return jnp.sum(w ** 2)
        timed("  nms+membership", chained(mem_fwd), modes)

    if "fit" in pieces:
        def f_fwd(p):
            pr = fit_ellipsoids_batch(p, cl.weights, cl.valid)
            return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                       for leaf in jax.tree.leaves(pr)) * 1e-6

        def f_fwd_w(w):
            pr = fit_ellipsoids_batch(pts, w, cl.valid)
            return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                       for leaf in jax.tree.leaves(pr)) * 1e-6
        timed("fit fwd", chained(f_fwd), pts)
        timed("fit fwd+grad(points)", chained(f_fwd, grad=True), pts)
        timed("fit fwd+grad(weights)", chained(f_fwd_w, grad=True),
              cl.weights)

    if "sample" in pieces:
        def s_fwd(r):
            pr = params._replace(r=r)
            s, w = sample_primitives_batch(pr, n_per_prim=NPP)
            return jnp.sum(s ** 2) * 1e-6 + jnp.sum(w ** 2)
        timed("sample fwd", chained(s_fwd), params.r)
        timed("sample fwd+grad(r)", chained(s_fwd, grad=True),
              params.r)

    if "chamfer" in pieces:
        def ch_fwd(s):
            return analytic_chamfer(params, s, sample_w, pts)
        timed("chamfer fwd", chained(ch_fwd), samples)
        timed("chamfer fwd+grad(samples)", chained(ch_fwd, grad=True),
              samples)

    if "loss" in pieces:
        def l_fwd(x):
            return convex_loss(pts, pts, x, quantile=0.05, iterations=MSC,
                               max_num_clusters=K, n_per_prim=NPP).total
        timed("convex_loss fwd", chained(l_fwd), X)
        timed("convex_loss fwd+grad(X)", chained(l_fwd, grad=True), X)

        def l_fwd_p(p):
            return convex_loss(p, p, X, quantile=0.05, iterations=MSC,
                               max_num_clusters=K, n_per_prim=NPP).total
        timed("convex_loss fwd+grad(pts)", chained(l_fwd_p, grad=True), pts)


if __name__ == "__main__":
    main()

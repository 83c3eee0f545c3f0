"""Component timing for the performance ledger (CLAUDE.md).

Times each pipeline piece on the default device at the canonical recipe
shapes (B=24, N=2048, msc=10, K=25).  Methodology per CLAUDE.md: chain
reps through a data dependence inside one jit (XLA hoists loop-invariant
scan bodies), reduce through a nonlinearity, sync by pulling a scalar,
subtract the ~27 ms tunnel round trip.

Usage: python tools/bench_components.py [piece ...]
Pieces: fwd_fit fwd_nofit fps ballq gather sup_step selfsup_step
(default: all)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B, N, S1, K1 = 24, 2048, 512, 128
REPS = 10
RT_S = 0.027


def timed(name, jitted, *args):
    v = float(np.asarray(jitted(*args)).ravel()[0])
    assert np.isfinite(v), f"{name}: non-finite"
    t0 = time.perf_counter()
    v = float(np.asarray(jitted(*args)).ravel()[0])
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{name:22s} {dt:8.2f} ms   ({B / (dt / 1000):,.0f} clouds/s)")
    return dt


def chained(body):
    def fn(x, *rest):
        def step(carry, _):
            out = body(x + carry * 1e-12, *rest)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder_dtype", default="auto")
    ap.add_argument("pieces", nargs="*", default=[])
    args = ap.parse_args()
    pieces = set(args.pieces) or {
        "fwd_fit", "fwd_nofit", "fps", "ballq", "gather",
        "sup_step", "selfsup_step"}
    print("backend:", jax.default_backend(),
          "encoder_dtype:", args.encoder_dtype,
          "gather:", os.environ.get("PRIFIT_GATHER", "auto"))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = jnp.zeros((B, 16), jnp.float32)

    from __graft_entry__ import _flagship
    mod, model, state, _, _, _ = _flagship(
        npoint=64, quantile=0.05, msc_iterations=10, max_num_clusters=25,
        n_per_prim=256, batch=2,
        compute_dtype=args.encoder_dtype,
)
    variables = state.variables()
    kwargs = dict(include_convex_loss=True, quantile=0.05,
                  msc_iterations=10, max_num_clusters=25, n_per_prim=256)

    if "fwd_fit" in pieces or "fwd_nofit" in pieces:
        def fwd(p, convex):
            def step(carry, _):
                out, _ = model.apply(
                    variables, p + carry * 1e-9, cls, chamfer_points=p,
                    train=False, mutable=["selfsup_state"],
                    **dict(kwargs, include_convex_loss=convex))
                loss = out.total_loss if convex \
                    else jnp.sum(out.seg_logits ** 2) * 1e-9
                return loss, None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s

        if "fwd_fit" in pieces:
            timed("fwd + fit (eval)",
                  jax.jit(lambda p: fwd(p, True)), pts)
        if "fwd_nofit" in pieces:
            timed("fwd only (eval)",
                  jax.jit(lambda p: fwd(p, False)), pts)

    if "fps" in pieces:
        from prifit_tpu.ops.sampling import farthest_point_sample
        timed("fps 2048->512", chained(
            lambda p: farthest_point_sample(p, S1, deterministic=True)),
            pts)

    if "ballq" in pieces:
        from prifit_tpu.ops.sampling import ball_query_nearest_shared
        q = pts[:, :S1]
        timed("sa1 ball query x3r", chained(
            lambda p: ball_query_nearest_shared(
                [0.1, 0.2, 0.4], [32, 64, 128], p, q)[2]), pts)

    if "gather" in pieces:
        from prifit_tpu.ops.sampling import index_points
        feats = jnp.asarray(rng.normal(size=(B, N, 64)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, (B, S1, K1)), jnp.int32)
        timed("sa1 gather [S,K,64]", chained(
            lambda f: index_points(f, idx)), feats)

    if "sup_step" in pieces or "selfsup_step" in pieces:
        from prifit_tpu.train.steps import (
            make_selfsup_step,
            make_supervised_step,
        )
        target = jnp.zeros((B, N), jnp.int32)
        key = jax.random.PRNGKey(0)

        if "sup_step" in pieces:
            sup = make_supervised_step(model, mod.get_loss)
            st, m = sup(state, pts, cls, target, 0.001, 0.1, key)
            _ = float(np.asarray(m["loss"]))
            t0 = time.perf_counter()
            for _ in range(REPS):
                st, m = sup(st, pts, cls, target, 0.001, 0.1, key)
            _ = float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
            print(f"{'sup step (f+b+opt)':22s} {dt:8.2f} ms   "
                  f"({B / (dt / 1000):,.0f} clouds/s)")

        if "selfsup_step" in pieces:
            ss = make_selfsup_step(
                model, include_convex_loss=True, quantile=0.05,
                msc_iterations=10, max_num_clusters=25, n_per_prim=256)
            st, m = ss(state, pts, pts, cls, 0.001, 0.1, 1.0, key)
            _ = float(np.asarray(m["ss_loss"]))
            t0 = time.perf_counter()
            for _ in range(REPS):
                st, m = ss(st, pts, pts, cls, 0.001, 0.1, 1.0, key)
            _ = float(np.asarray(m["ss_loss"]))
            dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
            print(f"{'selfsup step (f+b+o)':22s} {dt:8.2f} ms   "
                  f"({B / (dt / 1000):,.0f} clouds/s)")


if __name__ == "__main__":
    main()

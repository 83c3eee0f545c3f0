"""Microbenchmark: top-k candidates for the ball-query hot spot.

sa1 shape: d [24, 512, 2048], k=128.  Timing per CLAUDE.md: sync by
pulling a scalar, chain reps through a data dependence, reduce through a
nonlinearity so XLA cannot collapse the loop.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B, S, N, K = 24, 512, 2048, 128
REPS = 20
RT_MS = 27.0  # tunnel round trip


def timed(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)  # compile
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(REPS):
        out = jitted(*args)
        acc += float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) * 1000.0
    per = (dt - RT_MS * REPS) / REPS
    print(f"{name:34s} {per:8.2f} ms   (acc={acc:.3e})")
    return per


def chained(body):
    """Chain REPS_INNER iterations through a data dependence inside jit."""
    def fn(d):
        def step(carry, _):
            out = body(d + carry * 1e-12)
            if isinstance(out, (tuple, list)):
                out = out[0]
            s = jnp.sum(out.astype(jnp.float32) ** 2)
            return s, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=5)
        return s
    return fn


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((B, S, N), np.float32))

    def t_topk(dd):
        return jax.lax.top_k(-dd, K)

    def t_approx(dd):
        return jax.lax.approx_min_k(dd, K, recall_target=0.99)

    def t_approx95(dd):
        return jax.lax.approx_min_k(dd, K, recall_target=0.95)

    def t_approx_exact(dd):
        return jax.lax.approx_min_k(dd, K, recall_target=1.0)

    def t_sort(dd):
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), dd.shape)
        sd, si = jax.lax.sort((dd, idx), num_keys=1)
        return sd[..., :K], si[..., :K]

    def t_merge_tree(dd):
        # sort 16 chunks of 128 lanes, then tournament-merge keeping k=128
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), dd.shape)
        vd = dd.reshape(B, S, N // K, K)
        vi = idx.reshape(B, S, N // K, K)
        sd, si = jax.lax.sort((vd, vi), num_keys=1)
        while sd.shape[2] > 1:
            h = sd.shape[2] // 2
            a, b_ = sd[:, :, :h], sd[:, :, h:]
            ai, bi = si[:, :, :h], si[:, :, h:]
            md = jnp.concatenate([a, b_], axis=-1)
            mi = jnp.concatenate([ai, bi], axis=-1)
            md, mi = jax.lax.sort((md, mi), num_keys=1)
            sd, si = md[..., :K], mi[..., :K]
        return sd[:, :, 0], si[:, :, 0]

    def t_bisect_only(dd):
        lo = jnp.zeros(dd.shape[:-1], jnp.float32)
        hi = jnp.full(dd.shape[:-1], 1.0, jnp.float32)
        def body(carry, _):
            lo, hi = carry
            mid = (lo + hi) / 2
            cnt = jnp.sum((dd <= mid[..., None]), axis=-1)
            ge = cnt >= K
            return (jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)), None
        (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=24)
        return hi

    timed("lax.top_k (current)", chained(t_topk), d)
    timed("approx_min_k r=0.99", chained(t_approx), d)
    timed("approx_min_k r=0.95", chained(t_approx95), d)
    timed("approx_min_k r=1.0", chained(t_approx_exact), d)
    timed("full sort pairs", chained(t_sort), d)
    timed("merge tree (sort 128-chunks)", chained(t_merge_tree), d)
    timed("bisect threshold only", chained(t_bisect_only), d)


if __name__ == "__main__":
    main()

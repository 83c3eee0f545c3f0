"""Isolate the mxsr-region vs explicit-bf16-chain cost at sa1 shapes.

chain8c: sa1 fwd+bwd = 34.4 ms (mxsr) vs 19.9 (bf16) vs 33.6 (f32),
and the gap is already 4 ms in the forward — as if the region pays f32
traffic despite bf16 storage.  This strips the stage to the pure chain
(pre -> prebn -> 2 layers -> max) with a precomputed pre tensor: no
gathers, no FPS, no ball query, same params, so region-vs-explicit is
the ONLY variable.  Scale-1 of sa1: n = 24*512, K = 32, F0 = 32,
chain [32, 64]; scale-3: K = 128, chain [96, 128] — the big one.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.nn.mixed import MXDT, mx_chain

B, S = 24, 512
REPS = 10
RT_S = 0.027


def explicit_chain(pre, params, eps=1e-5):
    """The bf16-mode op sequence on the same parameters."""
    pre_bn, chain = params
    x = pre.astype(MXDT).reshape(-1, pre.shape[-1])
    scale, bias = pre_bn
    for i, (w, b, sc, bi) in enumerate(((None, None, scale, bias),)
                                       + chain):
        if w is not None:
            x = jax.lax.dot_general(x, w.astype(MXDT),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=MXDT)
            x = x + b.astype(MXDT)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=0)
        var = jnp.maximum(jnp.mean(x32 ** 2, axis=0) - mean ** 2, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        y = (x32 - mean) * inv * sc + bi
        x = jax.nn.relu(y.astype(MXDT))
    K = pre.shape[2]
    h = x.reshape(B * S, K, x.shape[-1])
    return jnp.max(h, axis=1).astype(jnp.float32)


def timed(name, jitted, *args):
    v = float(np.asarray(jitted(*args)))
    assert np.isfinite(v), name
    t0 = time.perf_counter()
    v = float(np.asarray(jitted(*args)))
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{name:34s} {dt:7.3f} ms")
    return dt


def chained(body):
    def fn(x, *rest):
        def step(carry, _):
            out = body(x + carry.astype(x.dtype) * 0, *rest)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def gchained(body):
    def fn(x, params, *rest):
        def loss(p, xx):
            out = body(xx, p, *rest)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9

        def step(carry, _):
            g = jax.grad(loss)(params, x + carry.astype(x.dtype) * 0)
            leaves = [jnp.sum(le.astype(jnp.float32) ** 2)
                      for le in jax.tree_util.tree_leaves(g)]
            return sum(leaves) * 1e-9, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def run(tag, K, F0, feats):
    rng = np.random.default_rng(0)
    pre32 = jnp.asarray(rng.normal(size=(B, S, K, F0)), jnp.float32)
    pre16 = pre32.astype(MXDT)
    dims = [F0] + feats
    chain = tuple(
        (jnp.asarray(rng.normal(size=(fi, fo)) / np.sqrt(fi),
                     jnp.float32),
         jnp.zeros((fo,)), jnp.ones((fo,)), jnp.zeros((fo,)))
        for fi, fo in zip(dims[:-1], dims[1:]))
    pre_bn = (jnp.ones((F0,)), jnp.zeros((F0,)))
    params = (pre_bn, chain)
    key = jax.random.PRNGKey(3)

    print(f"--- {tag}: K={K} F0={F0} chain={feats} ---")
    timed("explicit bf16 fwd", chained(
        lambda p, pr: explicit_chain(p, pr)), pre16, params)
    timed("region mxsr fwd", chained(
        lambda p, pr: mx_chain((True, True, True), p, pr, key=key)[0]),
        pre16, params)
    timed("region mx fwd (f32 pre)", chained(
        lambda p, pr: mx_chain((True, True), p, pr)[0]), pre32, params)
    timed("explicit bf16 fwd+bwd", gchained(
        lambda p, pr: explicit_chain(p, pr)), pre16, params)
    timed("region mxsr fwd+bwd", gchained(
        lambda p, pr: mx_chain((True, True, True), p, pr, key=key)[0]),
        pre16, params)
    timed("region mx fwd+bwd (f32 pre)", gchained(
        lambda p, pr: mx_chain((True, True), p, pr)[0]), pre32, params)


def main():
    print("backend:", jax.default_backend())
    run("sa1 scale1", 32, 32, [32, 64])
    run("sa1 scale3", 128, 64, [96, 128])


if __name__ == "__main__":
    main()

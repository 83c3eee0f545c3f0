"""Micro A/B: does the SR cast fuse into the backward dot epilogue?

Times three variants of the sa1-scale backward dot ``dx = dz @ w.T``
(n = 24*512*64 rows, Fo=64 -> Fi=64) and the BN-bwd-elementwise + SR
producer pattern, to localize the mxsr-vs-bf16 +14.5 ms at sa1
(chain8c, CLAUDE.md ledger):

  A  dot(preferred f32) -> sr_bf16          (the mxsr structure)
  B  dot(preferred bf16)                    (the plain-bf16 structure)
  C  dot(preferred f32) -> astype(bf16)     (deterministic epilogue)
  D  dot(preferred f32), f32 out            (the mx structure)

If A ~ C ~ B, the epilogue fuses and the gap is elsewhere; if
C ~ B << A the HASH doesn't fuse; if B << C the f32 intermediate
materializes (epilogue not fused at all).

Also dumps grep-able lines of the optimized HLO for variant A so the
fusion decision is visible, not inferred.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.nn.mixed import sr_bf16

N = 24 * 512 * 64
FO, FI = 64, 64
REPS = 20
RT_S = 0.027


def chained(body):
    def fn(x, *rest):
        def step(carry, _):
            out = body(x + carry.astype(x.dtype) * 0, *rest)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9, None
        s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def timed(name, jitted, *args):
    v = float(np.asarray(jitted(*args)))
    assert np.isfinite(v), name
    t0 = time.perf_counter()
    v = float(np.asarray(jitted(*args)))
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{name:34s} {dt:7.3f} ms")
    return dt


def main():
    print("backend:", jax.default_backend(), "n:", N)
    rng = np.random.default_rng(0)
    dz = jnp.asarray(rng.normal(size=(N, FO)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(FI, FO)), jnp.bfloat16)
    key = jax.random.PRNGKey(7)

    def dot(dzv, prefer):
        return jax.lax.dot_general(dzv, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=prefer)

    timed("A dot(f32) -> sr_bf16", chained(
        lambda d: sr_bf16(key, dot(d, jnp.float32))), dz)
    timed("B dot(bf16)", chained(
        lambda d: dot(d, jnp.bfloat16)), dz)
    timed("C dot(f32) -> astype(bf16)", chained(
        lambda d: dot(d, jnp.float32).astype(jnp.bfloat16)), dz)
    timed("D dot(f32), f32 out", chained(
        lambda d: dot(d, jnp.float32)), dz)

    # the elementwise producer pattern: relu-masked cotangent -> SR ->
    # consumed by TWO dots (dx and dw), the real layer-bwd shape
    x = jnp.asarray(rng.normal(size=(N, FI)), jnp.bfloat16)

    def twodots(g, use_sr):
        gz = jnp.where(x[:, :FO] > 0, g, 0).astype(jnp.float32)
        gz = sr_bf16(key, gz) if use_sr else gz.astype(jnp.bfloat16)
        dxv = jax.lax.dot_general(gz, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dw = jax.lax.dot_general(x, gz, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return jnp.sum(dxv ** 2) * 1e-9 + jnp.sum(dw ** 2) * 1e-9

    timed("E elemwise -> SR -> 2 dots", chained(
        lambda d: twodots(d, True)), dz)
    timed("F elemwise -> det bf16 -> 2 dots", chained(
        lambda d: twodots(d, False)), dz)

    # visible fusion evidence for variant A
    lowered = jax.jit(lambda d: sr_bf16(key, dot(d, jnp.float32)))
    txt = lowered.lower(dz).compile().as_text()
    n_fusion = txt.count(" fusion(")
    big_converts = [ln.strip()[:120] for ln in txt.splitlines()
                    if ("convert" in ln or "bitcast-convert" in ln)
                    and "1572864" in ln]
    print(f"\nA optimized HLO: {n_fusion} fusions; "
          f"{len(big_converts)} full-size convert lines")
    for ln in big_converts[:8]:
        print("  ", ln)
    roots = [ln.strip()[:140] for ln in txt.splitlines()
             if "ROOT" in ln or "= fusion" in ln or " dot(" in ln
             or "custom-call" in ln]
    print("A kernel roots:")
    for ln in roots[:12]:
        print("  ", ln)


if __name__ == "__main__":
    main()

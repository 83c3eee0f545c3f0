"""sa1 fwd+bwd cost attribution by ablation (round-3 kernel planning).

The supervised step's dominant single item is sa1's backward
(bench_stages: fwd ~13 ms, fwd+bwd ~34 ms at B=24 N=2048 f32).  This
driver times sa1 with individual components monkeypatched out to
attribute that cost before writing any fused kernel:

  full        the real layer (baseline)
  no_bn       _bn_forward -> identity (BN fwd stats + bwd reductions)
  bf16_ct     gather backward with bf16 cotangents (exact_grad off)
  sg_gather   stop_gradient around neighborhood gathers (no gather bwd)

Methodology per CLAUDE.md (chained scan, nonlinear reduce, scalar sync,
-27 ms round trip).  Ablated variants change semantics — they exist only
to attribute time, never to ship.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sa1_ablate.py
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

B, N = 24, 2048
REPS = 10
RT_S = 0.027


def timed(label, jitted, *args):
    v = float(np.asarray(jitted(*args)).ravel()[0])
    assert np.isfinite(v), f"{label}: non-finite"
    t0 = time.perf_counter()
    float(np.asarray(jitted(*args)).ravel()[0])
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{label:12s} {dt:8.2f} ms", flush=True)
    return dt


def build(variant):
    import prifit_tpu.nn.pointnet2 as pn2
    import prifit_tpu.ops.sampling as smp

    if variant == "no_bn":
        orig = pn2._bn_forward
        pn2._bn_forward = lambda mod, entry, x, train, m, eps=1e-5: x
    elif variant == "bf16_ct":
        orig = smp.scatter_accumulate
        smp.scatter_accumulate = \
            lambda n, idx, g, exact_grad: orig(n, idx, g, False)
    elif variant == "sg_gather":
        orig = smp.gather_neighbors
        smp.gather_neighbors = \
            lambda p, i, **kw: jax.lax.stop_gradient(orig(p, i, **kw))

    mod = pn2.SetAbstractionMsg(
        512, [0.1, 0.2, 0.4], [32, 64, 128],
        [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
    return mod, pn2, smp, locals().get("orig")


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    xyz = xyz / jnp.max(jnp.linalg.norm(xyz, axis=-1, keepdims=True),
                        axis=1, keepdims=True)
    print("backend:", jax.default_backend(), flush=True)

    for variant in ("full", "no_bn", "bf16_ct", "sg_gather"):
        import prifit_tpu.nn.pointnet2 as pn2
        import prifit_tpu.ops.sampling as smp
        saved_bn = pn2._bn_forward
        saved_sc = smp.scatter_accumulate
        saved_gn = smp.gather_neighbors
        try:
            mod, _, _, _ = build(variant)
            rngs = {"sampling": key}
            variables = mod.init(dict(rngs, params=key), xyz, None,
                                 train=True)

            def fwdbwd(x0):
                def loss(params, x):
                    (_, out), _ = mod.apply(
                        dict(variables, params=params), x, None,
                        train=True, rngs=rngs, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

                def step(carry, _):
                    g = jax.grad(loss)(variables["params"],
                                       x0 + carry * 1e-12)
                    leaves = [jnp.sum(l.astype(jnp.float32) ** 2)
                              for l in jax.tree_util.tree_leaves(g)]
                    return sum(leaves) * 1e-6, None
                s, _ = jax.lax.scan(step, jnp.float32(0), None,
                                    length=REPS)
                return s

            timed(variant, jax.jit(fwdbwd), xyz)
        finally:
            pn2._bn_forward = saved_bn
            smp.scatter_accumulate = saved_sc
            smp.gather_neighbors = saved_gn


if __name__ == "__main__":
    main()

"""Per-stage encoder timing (train-mode fwd and fwd+bwd) on the device.

Attributes the supervised-step time (ledger: ~69 ms f32 at B=24 N=2048)
to individual SA/FP stages so kernel work targets the real hot spot.
Each stage is instantiated standalone at its canonical pipeline shape
(models/pointnet2_part_seg_msg.py:136-185) with synthetic inputs.

Methodology per CLAUDE.md: chain reps through a data dependence inside
one jit, reduce through a nonlinearity, sync by pulling a scalar,
subtract the ~27 ms tunnel round trip.

Usage: python tools/bench_stages.py [--dtype f32|bf16] [stage ...]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 24
REPS = 10
RT_S = 0.027


def stages(dtype):
    from prifit_tpu.nn.pointnet2 import (
        FeaturePropagation,
        SetAbstraction,
        SetAbstractionMsg,
    )
    if dtype == "bf16":
        dt = jnp.bfloat16
    elif dtype in ("mx", "mxsr"):
        from prifit_tpu.nn.mixed import MX, MXSR
        dt = MX if dtype == "mx" else MXSR
    else:
        dt = None
    return {
        "sa1": (SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [32, 64, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], dtype=dt),
            [(B, 2048, 3), None]),
        "sa2": (SetAbstractionMsg(
            128, [0.4, 0.8], [64, 128],
            [[128, 128, 256], [128, 196, 256]], dtype=dt),
            [(B, 512, 3), (B, 512, 320)]),
        "sa3": (SetAbstraction(None, None, None, [256, 512, 1024],
                               group_all=True, dtype=dt),
                [(B, 128, 3), (B, 128, 512)]),
        "fp3": (FeaturePropagation([256, 256], dtype=dt),
                [(B, 128, 3), (B, 1, 3), (B, 128, 512), (B, 1, 1024)]),
        "fp2": (FeaturePropagation([256, 128], dtype=dt),
                [(B, 512, 3), (B, 128, 3), (B, 512, 320), (B, 128, 256)]),
        "fp1": (FeaturePropagation([128, 128], dtype=dt),
                [(B, 2048, 3), (B, 512, 3), (B, 2048, 22), (B, 512, 128)]),
    }


def timed(label, jitted, *args):
    v = float(np.asarray(jitted(*args)).ravel()[0])
    assert np.isfinite(v), f"{label}: non-finite"
    t0 = time.perf_counter()
    v = float(np.asarray(jitted(*args)).ravel()[0])
    del v
    dt = (time.perf_counter() - t0 - RT_S) / REPS * 1000
    print(f"{label:18s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32",
                    choices=["f32", "bf16", "mx", "mxsr"])
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the axon plugin overrides "
                         "JAX_PLATFORMS=cpu; smoke tests)")
    ap.add_argument("stages", nargs="*", default=[])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    print("backend:", jax.default_backend(), "dtype:", args.dtype)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    todo = stages(args.dtype)
    names = args.stages or list(todo)

    for name in names:
        mod, shapes = todo[name]
        xs = [None if s is None else
              jnp.asarray(rng.normal(size=s), jnp.float32) for s in shapes]
        # unit-ball xyz so ball-query radii are meaningful
        xs[0] = xs[0] / jnp.max(jnp.linalg.norm(xs[0], axis=-1,
                                                keepdims=True),
                                axis=1, keepdims=True)
        if len(xs) == 4:
            xs[1] = xs[1] / jnp.max(jnp.linalg.norm(
                xs[1], axis=-1, keepdims=True), axis=1, keepdims=True)
        rngs = {"sampling": key}
        variables = mod.init(dict(rngs, params=key), *xs, train=True)

        def fwd(*inp):
            def step(carry, _):
                out, _ = mod.apply(
                    variables, inp[0] + carry * 1e-12, *inp[1:],
                    train=True, rngs=rngs, mutable=["batch_stats"])
                if isinstance(out, tuple):
                    out = out[1]
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6, None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s

        def fwdbwd(*inp):
            # grads wrt params only (like the train step: xyz is data, and
            # the Pallas FPS kernel has no JVP rule for input tangents)
            def loss(params, x0):
                out, _ = mod.apply(
                    dict(variables, params=params), x0, *inp[1:],
                    train=True, rngs=rngs, mutable=["batch_stats"])
                if isinstance(out, tuple):
                    out = out[1]
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            def step(carry, _):
                g = jax.grad(loss)(variables["params"],
                                   inp[0] + carry * 1e-12)
                leaves = [jnp.sum(l.astype(jnp.float32) ** 2)
                          for l in jax.tree_util.tree_leaves(g)]
                return sum(leaves) * 1e-6, None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s

        if xs[1] is None and name == "sa1":
            timed(f"{name} fwd", jax.jit(lambda x: fwd(x, None)), xs[0])
            timed(f"{name} fwd+bwd",
                  jax.jit(lambda x: fwdbwd(x, None)), xs[0])
            continue
        timed(f"{name} fwd", jax.jit(fwd), *xs)
        timed(f"{name} fwd+bwd", jax.jit(fwdbwd), *xs)


if __name__ == "__main__":
    main()

"""Microbench: neighborhood gather strategies on TPU.

Compares, at the SA/FP-layer shapes, the three row-gather strategies:
  native   XLA row gather (row-count-bound, ~157 M rows/s measured r2)
  onehot   one-hot MXU einsum with asymmetric precision (the r2 default;
           exact, bound by generating the [rows, N] one-hot)
  dg       Pallas lane dynamic_gather (ops/pallas/gather.py; bit-exact)

Methodology per CLAUDE.md: chain reps through a data dependence inside
one jit (XLA hoists loop-invariant scan bodies), reduce through a
nonlinearity, sync by pulling a scalar, subtract the ~27 ms tunnel round
trip.  The index argument is chained too (a constant idx would let XLA
hoist the one-hot construction out of the scan).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gather.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.ops.pallas.gather import gather_rows_pallas
from prifit_tpu.ops.sampling import index_points, index_points_onehot

CASES = [
    # (label, B, N, C, R)
    ("sa1 xyz      ", 24, 2048, 3, 512 * (32 + 64 + 128)),
    ("sa2 proj     ", 24, 512, 128, 128 * (64 + 128)),
    ("fp2 feats    ", 24, 512, 128, 2048 * 3),
    ("fp1 feats    ", 24, 2048, 128, 2048 * 3),
]
REPS = 10
RT_S = 0.027


def chained(body, n):
    """Chain via the idx argument: perturb idx by a data-dependent 0."""
    def fn(p, idx):
        def step(carry, _):
            out = body(p, jnp.minimum(idx + carry, n - 1))
            s = jnp.sum(out.astype(jnp.float32) ** 2)
            return (s * 1e-20).astype(jnp.int32), None
        s, _ = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def timed(f, *args):
    v = np.asarray(f(*args)).ravel()[0]          # compile + warm
    t0 = time.perf_counter()
    v = np.asarray(f(*args)).ravel()[0]
    del v
    return (time.perf_counter() - t0 - RT_S) / REPS * 1000


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for label, B, N, C, R in CASES:
        pts = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)

        native = chained(lambda p, i: index_points(p, i), N)
        onehot = chained(
            lambda p, i: index_points_onehot(
                p, i, precision=(jax.lax.Precision.DEFAULT,
                                 jax.lax.Precision.HIGHEST)), N)
        dg = chained(lambda p, i: gather_rows_pallas(p, i), N)

        t_n = timed(native, pts, idx)
        t_o = timed(onehot, pts, idx)
        try:
            out_dg = gather_rows_pallas(pts, idx)
            exact = bool(jnp.array_equal(out_dg, index_points(pts, idx)))
            t_d = timed(dg, pts, idx)
        except Exception as e:  # Mosaic may reject a shape
            t_d, exact = float("nan"), False
            print(f"  dg failed: {type(e).__name__}: {str(e)[:150]}")
        print(f"{label} B{B} N{N} C{C} R{R}: native {t_n:6.2f} ms | "
              f"onehot {t_o:6.2f} ms | dg {t_d:6.2f} ms (exact={exact})")


if __name__ == "__main__":
    main()

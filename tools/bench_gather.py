"""Microbench: neighborhood gather strategies on TPU.

Compares, at the SA/FP-layer shapes, the three row-gather strategies:
  native   XLA row gather (row-count-bound, ~157 M rows/s measured r2)
  onehot   one-hot MXU einsum (the r2 default; exact via asymmetric
           precision, bound by generating the [rows, N] one-hot)
  dg       Pallas lane dynamic_gather (ops/pallas/gather.py; bit-exact)

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


def timeit(f, *args, reps=20):
    out = f(*args)                      # compile
    _ = np.asarray(out).ravel()[0]
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(out).ravel()[0]
    return (time.time() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for label, B, N, C, R in CASES:
        pts = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)

        native = jax.jit(lambda p, i: index_points(p, i))
        onehot = jax.jit(lambda p, i: index_points_onehot(
            p, i, precision=jax.lax.Precision.HIGHEST))
        dg = jax.jit(lambda p, i: gather_rows_pallas(p, i))

        t_n = timeit(native, pts, idx)
        t_o = timeit(onehot, pts, idx)
        try:
            out_dg = dg(pts, idx)
            exact = bool(jnp.array_equal(out_dg, native(pts, idx)))
            t_d = timeit(dg, pts, idx)
        except Exception as e:  # Mosaic may reject a shape
            t_d, exact = float("nan"), False
            print(f"  dg failed: {type(e).__name__}: {str(e)[:150]}")
        print(f"{label} B{B} N{N} C{C} R{R}: native {t_n:6.2f} ms | "
              f"onehot {t_o:6.2f} ms | dg {t_d:6.2f} ms (exact={exact})")


if __name__ == "__main__":
    main()

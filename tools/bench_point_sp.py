"""N-scaling of the point-SP self-sup step (VERDICT r2 item 5 ledger row).

Times ``make_selfsup_step_point_sp`` (ring mean-shift + psum fit +
sharded chamfer, ``parallel/point_sp.py``) at growing point counts on
the real chip with a trivial (data=1, points=1) mesh — single-chip
N-scaling of the O(N^2) fit pipeline; the multi-chip sharding itself is
exercised by ``__graft_entry__.dryrun_multichip`` (2x4 CPU mesh) and
``tests/test_point_sp.py``.

Methodology per CLAUDE.md: steps chained through the optimizer state
inside the step function itself (each call is a real update), sync by
pulling the loss scalar, subtract the ~27 ms tunnel round trip.

Usage: python tools/bench_point_sp.py [--ns 2048,4096,8192] [--batch 4]
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

RT_S = 0.027


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="2048,4096,8192")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from jax.sharding import Mesh

    from __graft_entry__ import _flagship
    from prifit_tpu.train.steps import make_selfsup_step_point_sp

    print("backend:", jax.default_backend())
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "points"))
    rng = np.random.default_rng(0)
    B = args.batch

    for N in (int(n) for n in args.ns.split(",")):
        mod, model, state, _, _, _ = _flagship(
            npoint=N, quantile=0.05, msc_iterations=10,
            max_num_clusters=25, n_per_prim=256, batch=B)
        step = make_selfsup_step_point_sp(
            model, mesh=mesh, quantile=0.05, msc_iterations=10,
            max_num_clusters=25, n_per_prim=256)
        pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
        pts = pts / jnp.max(jnp.linalg.norm(pts, axis=-1, keepdims=True),
                            axis=1, keepdims=True)
        cls = jnp.zeros((B, 16), jnp.float32)
        key = jax.random.PRNGKey(0)
        try:
            st, m = step(state, pts, pts, cls, 0.001, 0.1, 1.0, key)
            loss = float(np.asarray(m["ss_loss"]))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                st, m = step(st, pts, pts, cls, 0.001, 0.1, 1.0, key)
            loss = float(np.asarray(m["ss_loss"]))
            dt = (time.perf_counter() - t0 - RT_S) / args.reps * 1000
            print(f"N={N:>6} B={B}: selfsup point-SP step {dt:8.1f} ms "
                  f"({B / (dt / 1000):6.1f} clouds/s) loss={loss:.4f}")
        except Exception as e:
            print(f"N={N:>6} B={B}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()

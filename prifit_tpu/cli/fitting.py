"""Synthetic fit-pipeline demo (rebuilds ``fitting.py:26-74``).

End-to-end cluster -> fit -> sample -> chamfer -> backward on synthetic
ellipsoid scenes with known parameters, printing the recovered vs. true
axis lengths.

  python -m prifit_tpu.cli.fitting --batch_size 2
"""

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.cli.args_parser import parse_args
from prifit_tpu.geometry import (
    convex_loss,
    create_synthetic_dataset,
    fit_ellipsoids_batch,
)


def main(args):
    scene = create_synthetic_dataset(args.batch_size, seed=args.seed)
    points = jnp.asarray(scene.points)
    weights = jnp.asarray(scene.weights)

    # 1) fitting with ground-truth one-hot weights: parameter recovery
    params = fit_ellipsoids_batch(points, weights)
    for b in range(args.batch_size):
        for i in range(3):
            got = np.sort(np.asarray(params.r[b, i]))
            want = np.sort(scene.params[b, i])
            print(f"shape {b} ellipsoid {i}: fitted {got.round(2)} "
                  f"true {want.round(2)}")

    # 2) full pipeline from embeddings: loss value + gradient norm
    emb = weights[:, :, :8] + 0.05

    def loss_fn(e):
        out = convex_loss(points, points, e, quantile=args.quantile,
                          iterations=args.msc_iterations,
                          max_num_clusters=min(args.max_num_clusters, 8),
                          n_per_prim=args.n_per_prim)
        return out.total, out.chamfer

    (total, chamfer), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(emb)
    gnorm = jnp.linalg.norm(grads.reshape(-1))
    print(f"convex loss {float(total):.5f} chamfer {float(chamfer):.5f} "
          f"|grad| {float(gnorm):.5f}")
    assert np.isfinite(float(total)) and float(gnorm) > 0
    print("fit pipeline OK")


if __name__ == "__main__":
    main(parse_args())

"""prifit_tpu — a TPU-native JAX rebuild of PRIFIT (Hippogriff/prifit).

PRIFIT ("Learning to Fit Primitives Improves Few Shot Point Cloud
Segmentation", SGP 2022) trains point-cloud part-segmentation networks
semi-supervised: a supervised cross-entropy branch on few-shot labeled
ShapeNet-Part plus a self-supervised branch that clusters per-point
embeddings with differentiable mean-shift, fits ellipsoids (or cuboids) to
each cluster by weighted PCA, samples points on the fitted primitives and
minimizes a chamfer/SDF reconstruction loss.

This package is a from-scratch TPU-first re-design (not a port):

- static shapes everywhere: ragged cluster lists become fixed
  ``K = max_num_clusters`` slots with validity masks,
- every per-shape / per-cluster Python loop in the reference becomes
  ``vmap``; iterative algorithms (FPS, mean-shift) are ``lax``-loops,
- host round-trips (trimesh sampling, sklearn KDTree, ``np.unique``) are
  replaced with on-device equivalents,
- data-parallel scaling happens through ``jax.sharding`` over a device
  mesh instead of ``torch.nn.DataParallel``.

Layout:
    ops/         geometric NN primitives (pairwise dist, FPS, ball query,
                 grouping, kNN, interpolation, chamfer) + Pallas kernels
    clustering/  differentiable mean-shift + on-device NMS + membership
    geometry/    ellipsoid/cuboid SDFs, weighted fitting (guarded eigh),
                 primitive surface sampling, convex loss
    nn/          flax building blocks (set abstraction, feature
                 propagation, DGCNN edge convs, AtlasNet decoder)
    models/      model zoo matching the reference's registry
                 (get_model / get_loss / get_selfsup_loss by name)
    data/        ShapeNet-Part loaders + numpy augmentations
    train/       train state, schedules, jitted steps, checkpointing
    parallel/    mesh / sharding helpers
    eval/        part-segmentation mIoU harness
    cli/         entry points mirroring the reference scripts
"""

__version__ = "0.1.0"

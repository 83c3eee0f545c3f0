"""The PRIFIT convex-approximation loss, as one jittable function.

Rebuild of the reference orchestrator ``convex_loss`` (convex_loss.py:27-103):
normalize embeddings -> (optional) entropy on a 1/4 subsample -> mean-shift
clustering -> weighted ellipsoid/cuboid fitting -> primitive surface
sampling -> SDF/NN analytic chamfer against the full-resolution cloud ->
(optional) intersection loss on jittered points ->
``total = chamfer + alpha * intersection + beta * entropy``.

TPU re-design: the whole pipeline is pure, statically shaped and jit/vmap
friendly — per-shape Python loops, ``torch.cuda.empty_cache`` calls, host
KDTree/trimesh round-trips and ragged cluster lists are all gone.  It runs
under one ``jax.jit`` together with the encoder forward and is
differentiable end-to-end.

Deviations from the shipped reference (intended-behavior fixes, SURVEY §2.9):
  - the intersection loss implements the documented ``volume_3`` semantics
    (the reference NameErrors on a commented-out ``scatter_mean`` import);
  - ``include_pruning`` actually masks the chamfer samples (the reference
    computes ``pruned_points`` and then feeds the *unpruned* samples into
    the analytic chamfer).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from prifit_tpu.clustering.mean_shift import ClusterResult, cluster_batch
from prifit_tpu.geometry.fitting import PrimitiveParams, fit_ellipsoids_batch
from prifit_tpu.geometry.losses import (
    analytic_chamfer,
    entropy_loss,
    intersection_loss,
    prune_mask,
)
from prifit_tpu.geometry.sampling import sample_primitives_batch


class ConvexLossOutput(NamedTuple):
    total: jax.Array            # [] total loss
    chamfer: jax.Array          # [] analytic chamfer component
    entropy: jax.Array          # [] entropy component (pre-beta)
    intersection: jax.Array     # [] intersection component (pre-alpha)
    params: PrimitiveParams     # [B, K, ...] fitted primitives
    clusters: ClusterResult     # [B, ...] clustering byproducts (labels etc.)
    samples: jax.Array          # [B, S, 3] primitive surface samples
    sample_w: jax.Array         # [B, S] sample weights


def convex_loss(points: jax.Array, chamfer_points: jax.Array, X: jax.Array,
                *, quantile: float = 0.01, iterations: int = 5,
                max_num_clusters: int = 25, n_per_prim: int = 400,
                num_bandwidth_candidates: int = 2,
                include_intersect_loss: bool = False,
                include_entropy_loss: bool = False,
                include_pruning: bool = False,
                alpha: float = 1.0, beta: float = 1.0,
                if_cuboid: bool = False, evaluation: bool = False,
                key: jax.Array | None = None) -> ConvexLossOutput:
    """Compute the convex approximation loss for a batch of shapes.

    Args:
        points: ``[B, N, 3]`` points fed to the encoder (fit targets).
        chamfer_points: ``[B, M, 3]`` full-resolution chamfer targets (the
            reference's 4th ACD dataset output; M ~ 5000).
        X: ``[B, N, D]`` per-point embeddings (normalized here).
        quantile / iterations / max_num_clusters: mean-shift knobs
            (reference flags ``--quantile --msc_iterations
            --max_num_clusters``).
        n_per_prim: surface samples per primitive slot (replaces the
            reference's 10000-total area-proportional allocation; area
            enters through sample weights instead).
        key: PRNG key for the entropy subsample and intersection jitter;
            falls back to deterministic equivalents when None.
    """
    B, N, _ = X.shape
    # the entropy branch consumes normalized X; cluster_batch re-normalizes
    # internally (idempotent, O(B N D) — negligible next to the pipeline)
    X = X / jnp.maximum(jnp.linalg.norm(X, axis=2, keepdims=True), 1e-12)

    if key is not None:
        k_ent, k_jit = jax.random.split(key)
    else:
        k_ent = k_jit = None

    zero = jnp.zeros((), jnp.float32)

    if include_entropy_loss:
        # reference: np.random.choice of N/4 points w/o replacement (:61)
        if k_ent is not None:
            sub = jax.random.permutation(k_ent, N)[: N // 4]
        else:
            sub = jnp.arange(0, N, 4)[: N // 4]
        ent = entropy_loss(X[:, sub])
    else:
        ent = zero

    clusters = cluster_batch(
        X, quantile=quantile, iterations=iterations,
        max_num_clusters=max_num_clusters,
        num_candidates=num_bandwidth_candidates)

    params = fit_ellipsoids_batch(points, clusters.weights, clusters.valid)

    samples, sample_w = sample_primitives_batch(
        params, n_per_prim=n_per_prim, cuboid=if_cuboid)

    if include_pruning:
        sample_w = sample_w * prune_mask(samples, params, cuboid=if_cuboid)

    if evaluation:
        cham = zero
    else:
        cham = analytic_chamfer(params, samples, sample_w, chamfer_points,
                                cuboid=if_cuboid)

    if include_intersect_loss:
        # reference jitters the queries inward: points - U[0, 0.2) (:99)
        if k_jit is not None:
            jitter = jax.random.uniform(k_jit, chamfer_points.shape) * 0.2
        else:
            jitter = 0.1
        inter = intersection_loss(params, chamfer_points - jitter,
                                  cuboid=if_cuboid)
    else:
        inter = zero

    total = cham + alpha * inter + beta * ent
    return ConvexLossOutput(total=total, chamfer=cham, entropy=ent,
                            intersection=inter, params=params,
                            clusters=clusters, samples=samples,
                            sample_w=sample_w)

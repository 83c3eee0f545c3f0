"""Jitted train steps: supervised CE and self-supervised convex loss.

One jit each (reference: two backward passes per iteration,
``train_partseg_shapenet.py:387-399`` and ``:444-451``).  The whole
augment-free hot path — encoder forward, clustering, fitting, sampling,
chamfer, backward, optimizer — is a single XLA program; with batch-sharded
inputs on a mesh the partitioner runs it data-parallel and all-reduces
gradients over ICI.

Static configuration (model hyperparams, convex-loss flags) is closed over
at construction; per-epoch scalars (lr, bn momentum, lambda) are traced
arguments.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def _split_rngs(key, names):
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def make_supervised_step(model, loss_fn: Callable,
                         fused_augment: bool = False) -> Callable:
    """Build the jitted supervised step.

    Args:
        model: flax module with the SegOutput forward contract.
        loss_fn: ``(seg_logits, target, trans_feat) -> scalar`` (the model
            module's ``get_loss``).
        fused_augment: apply the standard scale+shift augmentation on
            device inside the jit (zero host work per step) instead of
            expecting pre-augmented batches.
    Returns:
        ``step(state, points, cls_onehot, target, lr, bn_momentum, key)
        -> (state, metrics)`` with metrics = {loss, acc}.
    """

    @jax.jit
    def step(state, points, cls_onehot, target, lr, bn_momentum, key):
        if fused_augment:
            from prifit_tpu.data.augment_jax import standard_train_augment

            key, k_aug = jax.random.split(key)
            points = standard_train_augment(k_aug, points)
        rngs = _split_rngs(key, ("sampling", "dropout"))

        def compute(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, cls_onehot, train=True, bn_momentum=bn_momentum,
                rngs=rngs, mutable=["batch_stats"])
            loss = loss_fn(out.seg_logits, target, out.trans_feat)
            pred = jnp.argmax(out.seg_logits, axis=-1)
            acc = jnp.mean((pred == target).astype(jnp.float32))
            return loss, (updates, acc)

        (loss, (updates, acc)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads, lr)
        state = state.replace(batch_stats=updates["batch_stats"])
        return state, {"loss": loss, "acc": acc}

    return step


def make_selfsup_step(model, *, fused_augment: bool = False,
                      **convex_kwargs) -> Callable:
    """Build the jitted self-supervised (convex loss) step.

    ``convex_kwargs`` are the static convex-loss flags
    (include_convex_loss=True, quantile, msc_iterations, max_num_clusters,
    include_*_loss, if_cuboid, alpha, n_per_prim).

    With ``fused_augment`` the whole reference per-step pipeline runs on
    device: scale+shift augment of the full-resolution cloud, random
    2048-point resample for the encoder (``train:441``), then
    encode -> cluster -> fit -> sample -> chamfer -> backward — one XLA
    program, zero host work.

    Returns:
        ``step(state, points, chamfer_points, cls_onehot, lr, bn_momentum,
        lmbda, key) -> (state, metrics)`` with metrics = {ss_loss,
        chamfer_loss}.
    """

    @jax.jit
    def step(state, points, chamfer_points, cls_onehot, lr, bn_momentum,
             lmbda, key):
        if fused_augment:
            from prifit_tpu.data.augment_jax import standard_train_augment

            key, k_aug, k_choice = jax.random.split(key, 3)
            chamfer_points = standard_train_augment(k_aug, chamfer_points)
            n = points.shape[1]
            choice = jax.random.choice(
                k_choice, chamfer_points.shape[1], (n,), replace=False)
            resampled = chamfer_points[:, choice, :3]
            if points.shape[-1] > 3:
                # normal-channel models get zero normals on self-sup data
                # (matching the host path, reference train:430)
                resampled = jnp.concatenate(
                    [resampled, jnp.zeros_like(resampled)], axis=-1)
            points = resampled
        rngs = _split_rngs(key, ("sampling", "dropout", "selfsup"))

        def compute(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats,
                 "selfsup_state": state.selfsup_state},
                points, cls_onehot, chamfer_points=chamfer_points,
                train=True, bn_momentum=bn_momentum, rngs=rngs,
                mutable=["batch_stats", "selfsup_state"], **convex_kwargs)
            ss_loss = jnp.mean(out.total_loss) * lmbda
            return ss_loss, (updates, out.chamfer_loss)

        (ss_loss, (updates, chamfer)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads, lr)
        state = state.replace(batch_stats=updates["batch_stats"],
                              selfsup_state=updates["selfsup_state"])
        return state, {"ss_loss": ss_loss, "chamfer_loss": chamfer}

    return step


def make_selfsup_step_point_sp(model, *, mesh, quantile: float = 0.05,
                               msc_iterations: int = 10,
                               max_num_clusters: int = 25,
                               n_per_prim: int = 256,
                               if_cuboid: bool = False) -> Callable:
    """Self-sup convex-loss step with the POINT axis sequence-parallel.

    The encoder runs data-parallel over the ``data`` axis of a 2-D
    ``(data, points)`` mesh; the O(N^2) fit pipeline (ring mean-shift,
    psum-reduced fitting, sharded chamfer — ``parallel/point_sp.py``)
    shards the point axis over the ``points`` axis.  This is the scaling
    path for clouds too large for one chip's kernel matrix (SURVEY §5's
    sequence-length analog); reachable from the trainer CLI via
    ``--sp_points``.

    Deviations from :func:`make_selfsup_step` (both documented in
    ``parallel/point_sp.py``): no quantile-doubling retry (pick a
    quantile that fits the slot budget) and no entropy/intersection
    terms, so the reference's beta decay state is untouched.

    Returns the same signature as :func:`make_selfsup_step`.
    """
    from prifit_tpu.parallel.point_sp import convex_fit_loss_point_sharded

    @jax.jit
    def step(state, points, chamfer_points, cls_onehot, lr, bn_momentum,
             lmbda, key):
        rngs = _split_rngs(key, ("sampling", "dropout"))

        def compute(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, cls_onehot, train=True, bn_momentum=bn_momentum,
                rngs=rngs, embed=True, mutable=["batch_stats"])
            loss, _ = convex_fit_loss_point_sharded(
                out.embedding, points[..., :3], chamfer_points,
                mesh=mesh, quantile=quantile, iterations=msc_iterations,
                max_num_clusters=max_num_clusters, n_per_prim=n_per_prim,
                cuboid=if_cuboid)
            return loss * lmbda, (updates, loss)

        (ss_loss, (updates, chamfer)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads, lr)
        state = state.replace(batch_stats=updates["batch_stats"])
        return state, {"ss_loss": ss_loss, "chamfer_loss": chamfer}

    return step


def make_contrastive_step(model, selfsup_loss_fn: Callable,
                          margin: float = 0.5) -> Callable:
    """Self-sup step for the original ACD pairwise contrastive loss
    (constructed at ``train_partseg_shapenet.py:235``; bypassed in favor of
    the convex loss by the reference recipe but kept for parity).

    Returns ``step(state, points, cls_onehot, target, lr, bn_momentum,
    lmbda, key) -> (state, metrics)``.
    """

    @jax.jit
    def step(state, points, cls_onehot, target, lr, bn_momentum, lmbda,
             key):
        rngs = _split_rngs(key, ("sampling", "dropout", "contrastive"))
        loss_key = rngs.pop("contrastive")

        def compute(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, cls_onehot, train=True, bn_momentum=bn_momentum,
                rngs=rngs, mutable=["batch_stats"])
            loss = selfsup_loss_fn(out.feat, target, loss_key,
                                   margin) * lmbda
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(grads, lr)
        state = state.replace(batch_stats=updates["batch_stats"])
        return state, {"ss_loss": loss}

    return step

"""Self-supervised pretrainer.

Rebuilds ``pretrain_partseg_shapenet.py:62-469``: convex-loss
training on unlabeled ACD data with extra augmentations (anisotropic
scale, y-rotation), a per-epoch self-sup validation loss on the held-out
20% split, checkpoints every 5 epochs, and best-model selection by
validation loss (``:428-454``).

``--ss_loss contrastive`` swaps the convex objective for the ACD
pairwise contrastive loss — the criterion the reference constructs at
``pretrain_partseg_shapenet.py:212`` (``MODEL.get_selfsup_loss``) and
then bypasses at ``:358`` in favor of the convex loss; here both paths
are runnable.

The reference's optional ModelNet40 SVM probe imports two modules that do
not exist in its repo (SURVEY.md §2.9.3) — the hook here
(``--modelnet_val``) logs a warning instead of crashing.
"""

import json
import os
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.cli.args_parser import parse_args
from prifit_tpu.cli.train_partseg import (
    build_model,
    experiment_name,
    setup_logger,
)
from prifit_tpu.data import ACDSelfSupDataset, DataLoader, provider
from prifit_tpu.models import get_module
from prifit_tpu.parallel import (
    make_data_mesh,
    maybe_initialize_distributed,
    shard_batch,
)
from prifit_tpu.train.checkpoint import save_checkpoint
from prifit_tpu.train.schedules import bn_momentum_schedule, lr_schedule
from prifit_tpu.train.state import create_train_state, selfsup_init_kwargs
from prifit_tpu.train.steps import make_contrastive_step, make_selfsup_step


def augment_pretrain(points, args, rng):
    """Pretrain augmentations (``pretrain:318-337``): scale + shift, plus
    optional anisotropic scale and y-rotation."""
    pts = points.copy()
    pts[:, :, 0:3] = provider.random_scale_point_cloud(pts[:, :, 0:3],
                                                       rng=rng)
    pts[:, :, 0:3] = provider.shift_point_cloud(pts[:, :, 0:3], rng=rng)
    if args.random_anisotropic_scale:
        pts[:, :, 0:3] = provider.random_anisotropic_scale_point_cloud(
            pts[:, :, 0:3], scale_low=0.8, scale_high=1.25, rng=rng)
    if args.rotation_z:
        pts = provider.rotate_point_cloud_y(pts, rng=rng)
    if args.rotation_z_45:
        pts = provider.rotate_point_cloud_y_pi4(pts, rng=rng)
    return pts


def main(args):
    maybe_initialize_distributed()
    exp_dir = osp.join(args.experiment_root,
                       "pretrain_" + experiment_name(args))
    ckpt_dir = osp.join(exp_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    log = setup_logger("pretrain", osp.join(exp_dir, "pretrain.log"))
    log(f"PARAMETERS: {vars(args)}")

    rng = np.random.default_rng(args.seed)
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()

    # 80/20 self-sup train/val split (pretrain:168-180)
    ss_train = ACDSelfSupDataset(
        args.ss_path, npoints=args.npoint, normal_channel=args.normal,
        k_shot=args.n_cls_selfsup, use_val=True,
        rng=np.random.default_rng(args.seed + 1))
    train_fns = [fn for _, fn in ss_train.datapath]
    ss_val = ACDSelfSupDataset(
        args.ss_path, npoints=args.npoint, normal_channel=args.normal,
        k_shot=args.n_cls_selfsup, use_val=False, exclude_fns=train_fns,
        rng=np.random.default_rng(args.seed + 2))
    log(f"self-sup train {len(ss_train)} / val {len(ss_val)}")

    train_loader = DataLoader(
        ss_train, args.batch_size, shuffle=True, seed=args.seed,
        chamfer_npoints=args.chamfer_npoints, process_index=proc_idx,
        process_count=proc_cnt, num_workers=args.num_workers)
    val_loader = DataLoader(
        ss_val, args.batch_size, shuffle=False,
        chamfer_npoints=args.chamfer_npoints)

    modelnet_loaders = None
    if args.modelnet_val:
        # the reference's probe imports modules it never shipped (SURVEY
        # §2.9.3); this is the working rebuild: linear SVM on frozen
        # encoder features over ModelNet40
        mn_root = osp.join(osp.dirname(args.ss_path),
                           "modelnet40_normal_resampled")
        if osp.isdir(mn_root):
            from prifit_tpu.data import ModelNetDataLoader

            mn_train = ModelNetDataLoader(
                mn_root, npoint=args.npoint, split="train",
                normal_channel=args.normal,
                rng=np.random.default_rng(args.seed))
            mn_test = ModelNetDataLoader(
                mn_root, npoint=args.npoint, split="test",
                normal_channel=args.normal,
                rng=np.random.default_rng(args.seed))
            modelnet_loaders = (
                DataLoader(mn_train, args.batch_size, drop_last=False),
                DataLoader(mn_test, args.batch_size, drop_last=False))
        else:
            log(f"--modelnet_val: no dataset at {mn_root}; skipping probe")

    mod = get_module(args.model)
    model = build_model(args, mod)
    sample_pts = jnp.zeros(
        (2, 64, 6 if args.normal else 3), jnp.float32)
    sample_cls = jnp.zeros((2, args.num_classes), jnp.float32)
    state = create_train_state(
        model, (sample_pts, sample_cls),
        selfsup_init_kwargs(sample_pts[..., :3]),
        optimizer=args.optimizer, decay_rate=args.decay_rate,
        seed=args.seed)

    mesh = make_data_mesh(args.batch_size)
    contrastive = args.ss_loss == "contrastive"
    if contrastive:
        ss_step = make_contrastive_step(model, mod.get_selfsup_loss,
                                        margin=args.margin)

        @jax.jit
        def val_forward(variables, points, target, cls_onehot, key):
            out = model.apply(variables, points, cls_onehot, train=False)
            loss = mod.get_selfsup_loss(out.feat, target, key,
                                        args.margin)
            return loss, jnp.zeros(())
    else:
        convex_flags = dict(
            include_convex_loss=True, if_cuboid=args.if_cuboid,
            include_intersect_loss=args.include_intersect_loss,
            include_entropy_loss=args.include_entropy_loss,
            include_pruning=args.include_pruning, quantile=args.quantile,
            msc_iterations=args.msc_iterations,
            max_num_clusters=args.max_num_clusters,
            num_bandwidth_candidates=args.num_bandwidth_candidates,
            n_per_prim=args.n_per_prim, alpha=args.alpha)
        ss_step = make_selfsup_step(model, **convex_flags)

        @jax.jit
        def val_forward(variables, points, chamfer_points, cls_onehot):
            out = model.apply(variables, points, cls_onehot,
                              chamfer_points=chamfer_points, train=False,
                              **convex_flags)
            return out.total_loss, out.chamfer_loss

    base_key = jax.random.PRNGKey(args.seed)
    best_val = np.inf
    metrics_path = osp.join(exp_dir, "metrics.jsonl")
    # tensorboard scalars (reference pretrain:126,363-368,402,425,456-457)
    from prifit_tpu.utils.tblog import ScalarWriter
    tb = ScalarWriter(exp_dir)

    for epoch in range(args.epoch):
        t0 = time.time()
        lr = lr_schedule(epoch, args.learning_rate, args.lr_decay,
                         args.step_size, args.lr_clip)
        momentum = bn_momentum_schedule(epoch, args.step_size)
        log(f"Epoch {epoch + 1}/{args.epoch}: lr {lr:.6f}")

        # host augmentation + H2D placement double-buffered behind the
        # step (same prefetch structure as train_partseg)
        from prifit_tpu.data.loader import prefetch_to_device

        def transform(item):
            pts, chamfer_pts, cls, seg = item
            cls_zero = np.zeros((pts.shape[0], args.num_classes),
                                np.float32)
            if contrastive:
                # contrastive pairs need seg-aligned points: use the
                # npoint cloud (whose component labels ride along), not
                # a chamfer re-sample
                pts = augment_pretrain(pts, args, rng)
                enc_pts = pts[:, :, :3]
                if args.normal:
                    enc_pts = np.concatenate(
                        [enc_pts, np.zeros_like(enc_pts)], -1)
                return (enc_pts.astype(np.float32), cls_zero,
                        seg.astype(np.int32))
            pts = augment_pretrain(pts, args, rng)
            chamfer_pts = augment_pretrain(chamfer_pts, args, rng)
            choice = rng.choice(chamfer_pts.shape[1], args.npoint,
                                replace=False)
            enc_pts = chamfer_pts[:, choice, :]
            return (enc_pts.astype(np.float32),
                    chamfer_pts[:, :, :3].astype(np.float32), cls_zero)

        stream = prefetch_to_device(
            train_loader, transform=transform,
            place=lambda b: shard_batch(mesh, b))

        losses = []
        for i, batch in enumerate(stream):
            key = jax.random.fold_in(base_key, epoch * 1000003 + i)
            if contrastive:
                state, m = ss_step(state, batch[0], batch[1], batch[2],
                                   lr, momentum, args.lmbda, key)
            else:
                state, m = ss_step(state, batch[0], batch[1], batch[2],
                                   lr, momentum, 1.0, key)
            losses.append(m["ss_loss"])
            tb.scalar("selfsup_loss_iter", np.asarray(m["ss_loss"]),
                      epoch * len(train_loader) + i + 1)
        train_loss = float(np.mean([np.asarray(l) for l in losses]))
        tb.scalar("selfsup_loss_epoch", train_loss, epoch)
        tb.scalar("train_lr", lr, epoch)
        tb.scalar("train_bn_momentum", momentum, epoch)

        # per-epoch ACD-val loss (pretrain:377-402)
        val_losses = []
        variables = state.variables()
        for vi, (pts, chamfer_pts, cls, seg) in enumerate(val_loader):
            cls_zero = jnp.zeros((pts.shape[0], args.num_classes))
            if contrastive:
                enc_pts = pts[:, :, :3]
                if args.normal:
                    enc_pts = np.concatenate(
                        [enc_pts, np.zeros_like(enc_pts)], -1)
                total, _ = val_forward(
                    variables, jnp.asarray(enc_pts, jnp.float32),
                    jnp.asarray(seg.astype(np.int32)), cls_zero,
                    jax.random.fold_in(base_key, 7000003 + vi))
            else:
                choice = rng.choice(chamfer_pts.shape[1], args.npoint,
                                    replace=False)
                enc_pts = chamfer_pts[:, choice, :]
                total, _ = val_forward(variables, jnp.asarray(enc_pts),
                                       jnp.asarray(chamfer_pts[:, :, :3]),
                                       cls_zero)
            val_losses.append(float(total))
        val_loss = float(np.mean(val_losses)) if val_losses else np.inf
        tb.scalar("selfsup_loss_val", val_loss, epoch)
        log(f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s: "
            f"train loss {train_loss:.5f} val loss {val_loss:.5f}")

        if (epoch + 1) % 5 == 0:  # every 5 epochs (pretrain:428)
            save_checkpoint(ckpt_dir, f"model_{epoch + 1:03d}",
                            epoch=epoch, state=state,
                            extra={"train_loss": train_loss,
                                   "val_loss": val_loss})
        if val_loss < best_val:  # best by val loss (pretrain:442-454)
            best_val = val_loss
            save_checkpoint(ckpt_dir, "best_model", epoch=epoch,
                            state=state,
                            extra={"train_loss": train_loss,
                                   "val_loss": val_loss})
            log(f"New best val loss {val_loss:.5f}; saved best_model")
        epoch_metrics = {"epoch": epoch, "train_loss": train_loss,
                         "val_loss": val_loss, "lr": lr}

        if modelnet_loaders is not None:
            from prifit_tpu.eval.svm_probe import (
                make_feature_forward,
                svm_probe,
            )

            t0 = time.time()
            probe = svm_probe(
                make_feature_forward(model, state.variables()),
                *modelnet_loaders, svm_c=args.svm_c,
                cross_val=args.cross_val_svm)
            log(f"ModelNet40 SVM probe: acc {probe['accuracy']:.4f} "
                f"(C={probe['C']}, {time.time() - t0:.1f}s)")
            epoch_metrics["modelnet_svm_acc"] = probe["accuracy"]
            tb.scalar("modelnet_val", probe["accuracy"], epoch)

        with open(metrics_path, "a") as f:
            f.write(json.dumps(epoch_metrics) + "\n")
        tb.flush()
    tb.close()
    return best_val


if __name__ == "__main__":
    main(parse_args())

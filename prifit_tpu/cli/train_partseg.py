"""Joint semi-supervised part-segmentation trainer.

Rebuilds ``train_partseg_shapenet.py:102-496``: alternating supervised
cross-entropy steps on few-shot labeled ShapeNet-Part and self-supervised
convex-loss steps on unlabeled ACD data, with the reference's LR /
BN-momentum / lambda schedules, per-epoch checkpointing, auto-resume and
final mIoU evaluation.

TPU execution model: both steps are single jitted XLA programs; batches
are host-augmented (numpy), then placed batch-sharded on a 1-D device
mesh — the partitioner handles data parallelism (SURVEY.md §2.7).

Usage (canonical recipe, README.md:60-63):
  python -m prifit_tpu.cli.train_partseg --seed 786 --alpha 0.01 \
      --split val --k_shot 10 --batch_size 24 --step_size 1 --selfsup \
      --epoch 20 --learning_rate 0.01 --lmbda 1 --quantile 0.05 \
      --msc_iterations 10 --max_num_clusters 25 \
      --data_root <shapenet> --ss_path <acd>
"""

import itertools
import json
import logging
import os
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from prifit_tpu.cli.args_parser import parse_args
from prifit_tpu.data import (
    ACDSelfSupDataset,
    DataLoader,
    PartNormalDataset,
    SelfSupPartNormalDataset,
    provider,
)
from prifit_tpu.data.loader import prefetch_to_device
from prifit_tpu.eval.miou import evaluation, make_eval_forward
from prifit_tpu.models import get_module, to_categorical
from prifit_tpu.parallel import (
    make_data_mesh,
    maybe_initialize_distributed,
    shard_batch,
)
from prifit_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_params_only,
    save_checkpoint,
)
from prifit_tpu.train.schedules import (
    bn_momentum_schedule,
    lambda_schedule,
    lr_schedule,
)
from prifit_tpu.train.state import create_train_state, selfsup_init_kwargs
from prifit_tpu.train.steps import (
    make_contrastive_step,
    make_selfsup_step,
    make_selfsup_step_point_sp,
    make_supervised_step,
)
from prifit_tpu.utils.tblog import ScalarWriter


def setup_logger(name: str, logfile: str):
    """File+stream logger immune to jax/absl's root-logger configuration
    (``logging.basicConfig`` is a no-op once the root logger has handlers).
    """
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s")
    for h in (logging.StreamHandler(), logging.FileHandler(logfile)):
        h.setFormatter(fmt)
        logger.addHandler(h)
    return logger.info


def experiment_name(args) -> str:
    """Hyperparameter-encoding run directory (reference ``train:119-157``
    builds the de-facto run registry the same way)."""
    parts = [args.model, f"k{args.k_shot}", f"seed{args.seed}",
             f"bs{args.batch_size}", f"lr{args.learning_rate}"]
    if args.selfsup:
        parts += [f"ss-{args.ss_dataset}", f"lmbda{args.lmbda}",
                  f"q{args.quantile}", f"msc{args.msc_iterations}",
                  f"K{args.max_num_clusters}", f"alpha{args.alpha}"]
        if args.include_intersect_loss:
            parts.append("intersect")
        if args.include_entropy_loss:
            parts.append(f"ent{args.beta}")
        if args.if_cuboid:
            parts.append("cuboid")
    return "_".join(str(p) for p in parts)


def build_model(args, mod):
    """Model construction matching the reference's per-name ctor calls
    (``train_partseg_shapenet.py:219-232``)."""
    if "dgcnn" in args.model:
        return mod.get_model(num_parts=args.num_parts,
                             normal_channel=args.normal,
                             nn_nb=args.dgcnn_k)
    kwargs = dict(normal_channel=args.normal)
    dtype_kw = dict(compute_dtype=getattr(args, "encoder_dtype", "auto"))
    if args.model == "pointnet_part_seg":
        return mod.get_model(part_num=args.num_parts, **kwargs)
    if args.model == "pointnet2_part_seg_ssg":
        return mod.get_model(num_classes=args.num_parts, **dtype_kw,
                             **kwargs)
    if args.model == "reconstruction":
        return mod.get_model(num_classes=args.num_parts, **kwargs)
    if getattr(args, "stage_dtypes", ""):
        dtype_kw["stage_dtypes"] = args.stage_dtypes
    if args.model == "pretrain_pointnet2_part_seg_msg":
        return mod.get_model(num_parts=args.num_parts,
                             l2_norm=args.l2_norm,
                             reconstruct=args.reconstruct, **dtype_kw,
                             **kwargs)
    return mod.get_model(num_parts=args.num_parts, l2_norm=args.l2_norm,
                         reconstruct=args.reconstruct,
                         extra_layers=args.extra_layers, **dtype_kw,
                         **kwargs)


def augment_sup(points, rng):
    pts = points.copy()
    pts[:, :, 0:3] = provider.random_scale_point_cloud(pts[:, :, 0:3],
                                                       rng=rng)
    pts[:, :, 0:3] = provider.shift_point_cloud(pts[:, :, 0:3], rng=rng)
    return pts


def train_init_class(state, model, mod, loader, args, log,
                     num_epochs: int = 500):
    """Logistic-regression re-init of the final classifier layer.

    Reference ``train_init_class`` (``train:56-99``): 500 epochs of
    SGD(lr=0.1, momentum=0.5) on ``conv2`` only, batch stats frozen.
    """
    import optax

    tx = optax.trace(decay=0.5)
    opt_state = tx.init(state.params["conv2"])

    @jax.jit
    def step(params, opt_state, batch_stats, points, cls_onehot, target,
             key):
        def loss_fn(conv2):
            p = {**params, "conv2": conv2}
            out = model.apply(
                {"params": p, "batch_stats": batch_stats},
                points, cls_onehot, train=False)  # eval: stats frozen
            return mod.get_loss(out.seg_logits, target, out.trans_feat)

        loss, g = jax.value_and_grad(loss_fn)(params["conv2"])
        updates, opt_state = tx.update(g, opt_state)
        conv2 = optax.apply_updates(
            params["conv2"],
            jax.tree_util.tree_map(lambda u: -0.1 * u, updates))
        return {**params, "conv2": conv2}, opt_state, loss

    params = state.params
    rng = np.random.default_rng(args.seed)
    for epoch in range(num_epochs):
        losses = []
        for points, cls, target in loader:
            pts = augment_sup(points, rng)
            params, opt_state, loss = step(
                params, opt_state, state.batch_stats, jnp.asarray(pts),
                to_categorical(jnp.asarray(cls)),
                jnp.asarray(target.astype(np.int32)),
                jax.random.PRNGKey(epoch))
            losses.append(float(loss))
        if epoch % 100 == 0 or epoch == num_epochs - 1:
            log(f"Init Classifier epoch {epoch + 1}/{num_epochs} "
                f"loss {np.mean(losses):.4f}")
    return state.replace(params=params)


def main(args):
    maybe_initialize_distributed()
    exp_dir = osp.join(args.experiment_root, experiment_name(args))
    ckpt_dir = osp.join(exp_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    log = setup_logger("train", osp.join(exp_dir, "train.log"))
    log(f"PARAMETERS: {vars(args)}")
    metrics_path = osp.join(exp_dir, "metrics.jsonl")
    # tensorboard scalars next to the jsonl (reference train:170,477-480)
    tb = ScalarWriter(exp_dir)

    proc_idx, proc_cnt = jax.process_index(), jax.process_count()

    # ---------------------------------------------------------- datasets
    train_ds = PartNormalDataset(
        args.data_root, npoints=args.npoint, split=args.train_split,
        normal_channel=args.normal, k_shot=args.k_shot,
        rng=np.random.default_rng(args.seed))
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              seed=args.seed, process_index=proc_idx,
                              process_count=proc_cnt,
                              num_workers=args.num_workers)
    log(f"The number of training data is: {len(train_ds)}")

    selfsup_loader = None
    if args.selfsup:
        if args.retain_overlaps:
            labeled_fns = []
        else:
            labeled_fns = list(itertools.chain(*train_ds.meta.values()))
        if args.ss_dataset == "dummy":
            log('Using "dummy" self-supervision dataset')
            ss_ds = SelfSupPartNormalDataset(
                args.data_root, npoints=args.npoint, split="trainval",
                normal_channel=args.normal, k_shot=args.n_cls_selfsup,
                labeled_fns=labeled_fns,
                rng=np.random.default_rng(args.seed + 1))
            chamfer_n = None
        else:
            log('Using "ACD" self-supervision dataset')
            ss_ds = ACDSelfSupDataset(
                args.ss_path, npoints=args.npoint,
                normal_channel=args.normal, k_shot=args.n_cls_selfsup,
                exclude_fns=labeled_fns,
                rng=np.random.default_rng(args.seed + 1))
            chamfer_n = args.chamfer_npoints
        log(f"\t{len(ss_ds)} self-sup samples")
        selfsup_loader = DataLoader(
            ss_ds, args.batch_size, shuffle=True, seed=args.seed + 1,
            chamfer_npoints=chamfer_n, process_index=proc_idx,
            process_count=proc_cnt, num_workers=args.num_workers)

    # ---------------------------------------------------------- model
    mod = get_module(args.model)
    model = build_model(args, mod)
    sample_pts = jnp.zeros(
        (2, 64, 6 if args.normal else 3), jnp.float32)
    sample_cls = jnp.zeros((2, args.num_classes), jnp.float32)
    # init on a tiny convex-enabled call so the lazy flax init creates the
    # self-sup layers too (param shapes don't depend on point counts)
    init_kwargs = selfsup_init_kwargs(sample_pts[..., :3]) \
        if args.selfsup else dict(train=True)
    state = create_train_state(
        model, (sample_pts, sample_cls), init_kwargs,
        optimizer=args.optimizer, decay_rate=args.decay_rate,
        seed=args.seed)
    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(state.params))
    log(f"Model {args.model}: {n_params / 1e6:.2f}M params")

    # resume and warm-start are mutually exclusive like the reference
    # (train:263-280): a warm-started run begins at epoch 0; auto-resume
    # picks up an interrupted run from its last checkpoint
    start_epoch = 0
    if args.pretrained_model is not None:
        d, n = osp.split(args.pretrained_model)
        state = restore_params_only(d, n, state)
        log(f"Warm-started from {args.pretrained_model}")
        if args.init_cls:
            state = train_init_class(state, model, mod, train_loader,
                                     args, log)
    else:
        try:
            state, start_epoch = restore_checkpoint(ckpt_dir, "last_model",
                                                    state)
            log(f"Resumed from epoch {start_epoch}")
            start_epoch += 1
        except FileNotFoundError:
            log("No existing model, starting training from scratch...")

    # ---------------------------------------------------------- steps
    # Under --sp_points the 2-D (data, points) mesh is THE mesh: the
    # supervised step and eval shard their batch over its data axis
    # (replicated over points), so the train state lives on one device
    # set for every step.
    sp_mesh = None
    use_sp = (args.selfsup and args.ss_loss != "contrastive"
              and args.sp_points > 1)
    if use_sp:
        from prifit_tpu.parallel.point_sp import make_dp_sp_mesh

        n_dev = len(jax.devices())
        if n_dev % args.sp_points != 0:
            raise SystemExit(f"--sp_points {args.sp_points} must divide "
                             f"the device count ({n_dev})")
        if args.npoint % args.sp_points != 0:
            raise SystemExit(f"--sp_points {args.sp_points} must divide "
                             f"--npoint ({args.npoint})")
        if args.chamfer_npoints % args.sp_points != 0:
            raise SystemExit(f"--sp_points {args.sp_points} must divide "
                             f"--chamfer_npoints "
                             f"({args.chamfer_npoints}) — the chamfer "
                             f"target is sharded over the points axis")
        n_dp = n_dev // args.sp_points
        if args.batch_size % n_dp != 0:
            raise SystemExit(f"--batch_size {args.batch_size} must be "
                             f"divisible by the data axis ({n_dp})")
        sp_mesh = make_dp_sp_mesh(n_dp, args.sp_points)
        mesh = sp_mesh
        log(f"Point-SP mesh: data={n_dp} x points={args.sp_points}")
    else:
        mesh = make_data_mesh(args.batch_size)
        log(f"Data-parallel mesh over {mesh.size} device(s)")
    sup_step = make_supervised_step(model, mod.get_loss,
                                    fused_augment=args.fused_augment)
    ss_step = None
    contrastive_step = None
    if args.selfsup and args.ss_loss == "contrastive":
        contrastive_step = make_contrastive_step(
            model, mod.get_selfsup_loss, margin=args.margin)
    elif use_sp:
        # point-axis sequence parallelism: encoder DP over the data axis,
        # O(N^2) fit pipeline sharded over the points axis of the 2-D
        # mesh (parallel/point_sp.py; ring mean-shift + psum fit)
        ss_step = make_selfsup_step_point_sp(
            model, mesh=sp_mesh, quantile=args.quantile,
            msc_iterations=args.msc_iterations,
            max_num_clusters=args.max_num_clusters,
            n_per_prim=args.n_per_prim, if_cuboid=args.if_cuboid)
    elif args.selfsup:
        # NOTE the reference gates the convex loss on
        # --include_convex_loss even under --selfsup (train:444) and its
        # README recipe omits the flag, which trains with a ZERO self-sup
        # loss as shipped; --selfsup here implies the convex loss (the
        # paper's intent)
        ss_step = make_selfsup_step(
            model,
            fused_augment=args.fused_augment,
            include_convex_loss=True,
            if_cuboid=args.if_cuboid,
            include_intersect_loss=args.include_intersect_loss,
            include_entropy_loss=args.include_entropy_loss,
            include_pruning=args.include_pruning,
            quantile=args.quantile, msc_iterations=args.msc_iterations,
            max_num_clusters=args.max_num_clusters,
            num_bandwidth_candidates=args.num_bandwidth_candidates,
            n_per_prim=args.n_per_prim, alpha=args.alpha)

    base_key = jax.random.PRNGKey(args.seed)
    best_metrics = {"best_class_avg_miou": 0.0, "best_acc": 0.0,
                    "best_epoch": 0, "best_instance_avg_miou": 0.0,
                    "best_chamfer_loss": float("inf")}
    eval_cache = {}

    # --------------------------------------------- prefetched streams
    # Host-side augmentation + H2D placement run in background threads,
    # double-buffered ahead of the TPU step (prefetch_to_device).  Each
    # stream owns its rng so augmentation order is deterministic within
    # the stream regardless of the other stream's pace.
    def cycle(loader):
        while True:
            yield from loader

    def place(batch):
        # under --sp_points this is the 2-D mesh: leading-axis sharding
        # over its data axis, replicated over points
        return shard_batch(mesh, batch)

    def np_onehot(cls):
        return np.eye(args.num_classes,
                      dtype=np.float32)[np.asarray(cls).ravel()]

    rng_sup = np.random.default_rng(args.seed + 17)

    def sup_transform(batch):
        points, cls, target = batch
        pts = points if args.fused_augment else augment_sup(points, rng_sup)
        cls_onehot = np_onehot(cls) if args.category else np.zeros(
            (cls.shape[0], args.num_classes), np.float32)
        return (np.ascontiguousarray(pts, np.float32), cls_onehot,
                target.astype(np.int32))

    sup_stream = prefetch_to_device(cycle(train_loader),
                                    transform=sup_transform, place=place)

    ss_stream = None
    if contrastive_step is not None:
        rng_ss = np.random.default_rng(args.seed + 31)

        def contrastive_transform(ss):
            ss_points = ss[0]
            ss_seg = ss[-1]
            ss_points = augment_sup(ss_points, rng_ss)
            enc_pts = ss_points[:, :, :3]
            if args.normal:
                # self-sup data has no normals: zero-pad (train:430)
                enc_pts = np.concatenate(
                    [enc_pts, np.zeros_like(enc_pts)], -1)
            cls_zero = np.zeros((ss_points.shape[0], args.num_classes),
                                np.float32)
            return (enc_pts.astype(np.float32), cls_zero,
                    ss_seg.astype(np.int32))

        ss_stream = prefetch_to_device(cycle(selfsup_loader),
                                       transform=contrastive_transform,
                                       place=place)
    elif args.selfsup:
        rng_ss = np.random.default_rng(args.seed + 31)

        def selfsup_transform(ss):
            if len(ss) == 4:
                ss_points, chamfer_pts, ss_cls, _ = ss
            else:
                # "dummy" self-sup dataset has no full-res cloud; its
                # resampled points double as the chamfer target (the
                # reference crashes on this 3-tuple — latent breakage)
                ss_points, ss_cls, _ = ss
                chamfer_pts = ss_points
            if args.fused_augment:
                # augmentation + resample happen inside the jit; feed
                # a correctly-shaped placeholder for the encoder input
                enc_pts = chamfer_pts[:, :args.npoint, :]
            else:
                chamfer_pts = augment_sup(chamfer_pts, rng_ss)
                # reference re-samples the encoder input from the
                # full-res cloud (train:441; the dataloader's own
                # ss_points are never fed to the model)
                choice = rng_ss.choice(chamfer_pts.shape[1], args.npoint,
                                       replace=False)
                enc_pts = chamfer_pts[:, choice, :]
            if args.normal:
                enc_pts = np.concatenate(
                    [enc_pts[:, :, :3],
                     np.zeros_like(enc_pts[:, :, :3])], -1)
            cls_zero = np.zeros((enc_pts.shape[0], args.num_classes),
                                np.float32)
            return (enc_pts.astype(np.float32),
                    chamfer_pts[:, :, :3].astype(np.float32), cls_zero)

        ss_stream = prefetch_to_device(cycle(selfsup_loader),
                                       transform=selfsup_transform,
                                       place=place)

    # ---------------------------------------------------------- epochs
    for epoch in range(start_epoch, args.epoch):
        t0 = time.time()
        lr = lr_schedule(epoch, args.learning_rate, args.lr_decay,
                         args.step_size, args.lr_clip)
        momentum = bn_momentum_schedule(epoch, args.step_size)
        lmbda = lambda_schedule(epoch, args.lmbda, args.anneal_lambda,
                                args.anneal_rate, args.anneal_step)
        log(f"Epoch {epoch + 1}/{args.epoch}: lr {lr:.6f} "
            f"bn-momentum {momentum:.4f} lambda {lmbda:.4f}")

        num_iters = args.epoch_iters or (
            len(selfsup_loader) if args.selfsup else len(train_loader))
        mean_correct, sup_losses, ss_losses = [], [], []

        for i in range(num_iters):
            # ---------------- supervised step (batch pre-augmented and
            # pre-placed by the sup_stream prefetcher)
            batch = next(sup_stream)
            key = jax.random.fold_in(base_key, epoch * 1000003 + i * 2)
            state, m = sup_step(state, *batch, lr, momentum, key)
            mean_correct.append(m["acc"])
            sup_losses.append(m["loss"])

            # ---------------- self-supervised step
            if contrastive_step is not None:
                enc_pts, cls_zero, ss_seg = next(ss_stream)
                key = jax.random.fold_in(base_key,
                                         epoch * 1000003 + i * 2 + 1)
                state, m = contrastive_step(
                    state, enc_pts, cls_zero, ss_seg, lr, momentum,
                    lmbda, key)
                ss_losses.append(m["ss_loss"])
            elif args.selfsup:
                enc_pts, chamfer_pts, cls_zero = next(ss_stream)
                key = jax.random.fold_in(base_key,
                                         epoch * 1000003 + i * 2 + 1)
                state, m = ss_step(state, enc_pts, chamfer_pts, cls_zero,
                                   lr, momentum, lmbda, key)
                ss_losses.append(m["ss_loss"])

        train_acc = float(np.mean([np.asarray(a) for a in mean_correct]))
        msg = (f"Epoch {epoch + 1} done in {time.time() - t0:.1f}s: "
               f"train acc {train_acc:.5f} "
               f"sup loss {np.mean([np.asarray(l) for l in sup_losses]):.5f}")
        if ss_losses:
            msg += (" ss loss "
                    f"{np.mean([np.asarray(l) for l in ss_losses]):.5f}")
        log(msg)

        save_checkpoint(ckpt_dir, f"model_{epoch + 1:03d}", epoch=epoch,
                        state=state, extra={"train_acc": train_acc})
        save_checkpoint(ckpt_dir, "last_model", epoch=epoch, state=state,
                        extra={"train_acc": train_acc})
        with open(metrics_path, "a") as f:
            f.write(json.dumps({
                "epoch": epoch, "train_acc": train_acc, "lr": lr,
                "bn_momentum": momentum, "lambda": lmbda}) + "\n")
        # scalar names mirror the reference (train:477-480)
        tb.scalar("train_acc", train_acc, epoch)
        tb.scalar("train_lr", lr, epoch)
        tb.scalar("train_bn_momentum", momentum, epoch)
        tb.scalar("selfsup_lambda", lmbda, epoch)
        tb.scalar("train_loss", np.mean(
            [np.asarray(l) for l in sup_losses]), epoch)
        if ss_losses:
            tb.scalar("selfsup_loss", np.mean(
                [np.asarray(l) for l in ss_losses]), epoch)
        tb.flush()

        if args.eval_every and (epoch + 1) % args.eval_every == 0:
            prev_best = best_metrics["best_class_avg_miou"]
            run_evaluation(args, epoch, model, state, log,
                           metrics=best_metrics, cache=eval_cache,
                           mesh=mesh)
            if best_metrics["best_class_avg_miou"] > prev_best:
                # checkpoint the actual best-mIoU model
                save_checkpoint(ckpt_dir, "best_model", epoch=epoch,
                                state=state, extra={
                                    "class_avg_miou":
                                        best_metrics["best_class_avg_miou"]})

    # retire the prefetch producer threads (the cycling streams never
    # exhaust on their own)
    sup_stream.close()
    if ss_stream is not None:
        ss_stream.close()

    # final evaluation (reference train:487)
    metrics = run_evaluation(args, args.epoch - 1, model, state, log,
                             metrics=best_metrics, cache=eval_cache,
                             mesh=mesh)
    if not osp.exists(osp.join(ckpt_dir, "best_model")):
        save_checkpoint(ckpt_dir, "best_model", epoch=args.epoch - 1,
                        state=state, extra={
                            "class_avg_miou": metrics["class_avg_iou"]})
    with open(metrics_path, "a") as f:
        f.write(json.dumps({"final_eval": metrics}) + "\n")
    tb.close()
    return metrics


def run_evaluation(args, epoch, model, state, log, metrics=None,
                   cache=None, mesh=None):
    """Evaluate; dataset/loader/jitted forward are built once and cached
    (``cache`` dict) — the forward takes variables as an ARGUMENT so
    parameter updates between evaluations don't retrace."""
    cache = cache if cache is not None else {}
    if "loader" not in cache:
        eval_ds = PartNormalDataset(
            args.data_root, npoints=args.npoint, split=args.eval_split,
            normal_channel=args.normal,
            rng=np.random.default_rng(args.seed))
        cache["loader"] = DataLoader(eval_ds, args.batch_size,
                                     shuffle=False, drop_last=False,
                                     num_workers=args.num_workers)
        log(f"The number of test data is: {len(eval_ds)}")

        # batch-sharded eval forward over the data mesh — the reference
        # evaluates under DataParallel too (testing.py:96-98); short tail
        # batches (drop_last=False) are padded up to batch_size by
        # evaluation() so there is exactly one compiled shape.  The
        # training mesh is reused when given so the state's device set
        # is consistent across steps (required under --sp_points).
        eval_mesh = mesh if mesh is not None \
            else make_data_mesh(args.batch_size)
        cache["place"] = lambda b: shard_batch(eval_mesh, b)

        @jax.jit
        def forward(variables, points, cls_onehot):
            out = model.apply(variables, points, cls_onehot, train=False)
            return out.seg_logits

        cache["forward"] = forward
    variables = state.variables()
    return evaluation(
        lambda p, c: cache["forward"](variables, p, c),
        cache["loader"], num_parts=args.num_parts, epoch=epoch, log=log,
        metrics=metrics, place=cache["place"], pad_to=args.batch_size)


if __name__ == "__main__":
    main(parse_args())

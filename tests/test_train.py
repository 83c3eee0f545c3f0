"""Training infrastructure tests: schedules, optimizer semantics, steps,
checkpointing, mesh sharding, eval harness, end-to-end CLI smoke."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.eval.miou import (
    category_masked_argmax,
    evaluation,
    mean_iou_one_sample,
)
from prifit_tpu.models import get_module, to_categorical
from prifit_tpu.parallel import make_mesh, shard_batch
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
from prifit_tpu.train.state import (
    create_train_state,
    make_optimizer,
    selfsup_init_kwargs,
)
from prifit_tpu.train.steps import make_selfsup_step, make_supervised_step
from tests.fixtures import make_acd_fixture, make_shapenet_fixture

B, N, PARTS = 2, 128, 50


class TestSchedules:
    def test_lr_schedule(self):
        assert lr_schedule(0, 0.001) == 0.001
        assert lr_schedule(20, 0.001) == 0.0005
        assert lr_schedule(1000, 0.001) == 1e-5  # clipped

    def test_bn_momentum(self):
        assert bn_momentum_schedule(0) == 0.1
        assert bn_momentum_schedule(20) == 0.05
        assert bn_momentum_schedule(200) == 0.01  # floor

    def test_lambda(self):
        assert lambda_schedule(7, 10.0) == 10.0
        assert lambda_schedule(7, 10.0, True, 0.5, 5) == 5.0


class TestOptimizers:
    def test_adam_l2_matches_torch_semantics(self):
        """torch Adam(weight_decay) adds wd*p to the grad BEFORE moments."""
        import torch

        p0 = np.array([1.0, -2.0, 3.0], np.float32)
        g0 = np.array([0.1, 0.2, -0.3], np.float32)
        wd, lr = 1e-2, 0.01

        tp = torch.nn.Parameter(torch.tensor(p0))
        opt = torch.optim.Adam([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                               weight_decay=wd)
        for _ in range(3):
            opt.zero_grad()
            tp.grad = torch.tensor(g0)
            opt.step()
        want = tp.detach().numpy()

        tx = make_optimizer("Adam", wd)
        params = jnp.asarray(p0)
        opt_state = tx.init(params)
        for _ in range(3):
            updates, opt_state = tx.update(jnp.asarray(g0), opt_state,
                                           params)
            params = params + jax.tree_util.tree_map(
                lambda u: -lr * u, updates)
        np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5)

    def test_sgd_momentum_matches_torch(self):
        import torch

        p0 = np.array([1.0, -2.0], np.float32)
        g0 = np.array([0.5, 0.1], np.float32)
        lr = 0.1
        tp = torch.nn.Parameter(torch.tensor(p0))
        opt = torch.optim.SGD([tp], lr=lr, momentum=0.9)
        for _ in range(3):
            opt.zero_grad()
            tp.grad = torch.tensor(g0)
            opt.step()
        want = tp.detach().numpy()

        tx = make_optimizer("SGD")
        params = jnp.asarray(p0)
        opt_state = tx.init(params)
        for _ in range(3):
            updates, opt_state = tx.update(jnp.asarray(g0), opt_state,
                                           params)
            params = params + jax.tree_util.tree_map(
                lambda u: -lr * u, updates)
        np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5)


@pytest.fixture(scope="module")
def ssg_setup():
    mod = get_module("pointnet2_part_seg_ssg")
    model = mod.get_model(num_classes=PARTS)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, 3)), jnp.float32)
    cls = to_categorical(jnp.zeros((B, 1), jnp.int32))
    state = create_train_state(model, (pts, cls), dict(train=True))
    return mod, model, pts, cls, state


class TestSteps:
    def test_supervised_step_reduces_loss(self, ssg_setup):
        mod, model, pts, cls, state = ssg_setup
        step = make_supervised_step(model, mod.get_loss)
        target = jnp.zeros((B, N), jnp.int32)
        losses = []
        for i in range(8):
            state, m = step(state, pts, cls, target, 0.005, 0.1,
                            jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.all(np.isfinite(losses))

    def test_selfsup_step_runs(self):
        mod = get_module("pointnet2_part_seg_msg")
        model = mod.get_model(num_parts=PARTS)
        pts = jnp.asarray(
            np.random.default_rng(1).normal(size=(B, N, 3)), jnp.float32)
        cls = jnp.zeros((B, 16))
        state = create_train_state(model, (pts, cls),
                                   selfsup_init_kwargs(pts))
        step = make_selfsup_step(
            model, include_convex_loss=True, quantile=0.05,
            msc_iterations=2, max_num_clusters=4, n_per_prim=16)
        state, m = step(state, pts, pts, cls, 0.001, 0.1, 1.0,
                        jax.random.PRNGKey(0))
        assert np.isfinite(float(m["ss_loss"]))
        # beta decayed through the step
        np.testing.assert_allclose(
            float(state.selfsup_state["beta"]), 0.99, atol=1e-6)

    def test_sharded_step_matches_single_device(self, ssg_setup):
        """The mesh-sharded supervised step computes the same loss."""
        mod, model, pts, cls, state = ssg_setup
        step = make_supervised_step(model, mod.get_loss)
        target = jnp.zeros((B, N), jnp.int32)
        key = jax.random.PRNGKey(9)

        _, m_single = step(state, pts, cls, target, 0.005, 0.1, key)

        mesh = make_mesh(jax.devices()[:2])
        batch = shard_batch(mesh, (pts, cls, target))
        _, m_shard = step(state, *batch, 0.005, 0.1, key)
        np.testing.assert_allclose(float(m_single["loss"]),
                                   float(m_shard["loss"]), rtol=1e-4)


class TestCheckpoint:
    def test_roundtrip(self, ssg_setup, tmp_path):
        _, _, _, _, state = ssg_setup
        save_checkpoint(str(tmp_path), "model_001", epoch=7, state=state,
                        extra={"train_acc": 0.5})
        zeroed = state.replace(params=jax.tree_util.tree_map(
            jnp.zeros_like, state.params))
        restored, epoch = restore_checkpoint(str(tmp_path), "model_001",
                                             zeroed)
        assert epoch == 7
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))

    def test_params_only_keeps_opt_state(self, ssg_setup, tmp_path):
        _, _, _, _, state = ssg_setup
        save_checkpoint(str(tmp_path), "pre", epoch=0, state=state)
        zeroed = state.replace(params=jax.tree_util.tree_map(
            jnp.zeros_like, state.params))
        warm = restore_params_only(str(tmp_path), "pre", zeroed)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(warm.params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))

    def test_missing_raises(self, ssg_setup, tmp_path):
        _, _, _, _, state = ssg_setup
        with pytest.raises(FileNotFoundError):
            restore_checkpoint(str(tmp_path), "nope", state)


class TestEval:
    def test_masked_argmax_stays_in_category(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(4, 32, 50)), jnp.float32)
        # shapes from Airplane (parts 0-3) and Chair (parts 12-15)
        first = jnp.asarray([0, 3, 12, 15], jnp.int32)
        pred = np.asarray(category_masked_argmax(logits, first))
        assert pred[:2].min() >= 0 and pred[:2].max() <= 3
        assert pred[2:].min() >= 12 and pred[2:].max() <= 15

    def test_absent_part_iou_one(self):
        # Laptop has parts [28, 29]; only 28 present and predicted
        pred = np.full(50, 28)
        target = np.full(50, 28)
        assert mean_iou_one_sample(pred, target, "Laptop") == 1.0

    def test_iou_half(self):
        pred = np.array([28] * 50 + [29] * 50)
        target = np.array([28] * 100)
        # part 28: inter 50 / union 100 = .5; part 29: inter 0/union 50 = 0
        assert mean_iou_one_sample(pred, target, "Laptop") == 0.25

    def test_perfect_prediction_metrics(self):
        # synthetic loader: logits peaked at the target labels
        def loader():
            rng = np.random.default_rng(0)
            for _ in range(2):
                target = rng.integers(0, 4, (2, 16)).astype(np.int64)
                yield (rng.normal(size=(2, 16, 3)).astype(np.float32),
                       np.zeros((2, 1), np.int64), target)

        def forward(points, cls):
            # can't see target; use a closure trick instead
            raise NotImplementedError

        # direct metric check instead: feed identity logits
        batches = list(loader())

        def forward2(points, cls, _state={"i": 0}):
            target = batches[_state["i"]][2]
            _state["i"] += 1
            eye = np.eye(50, dtype=np.float32) * 10
            return jnp.asarray(eye[target])

        m = evaluation(forward2, iter(batches), log=lambda *_: None)
        assert m["accuracy"] == 1.0
        assert m["instance_avg_iou"] == 1.0

    def test_batch_shape_ious_matches_scalar(self):
        """Vectorized per-shape IoU == the scalar reference-semantics fn."""
        from prifit_tpu.eval.miou import (
            CATEGORY_NAMES,
            _category_tables,
            batch_shape_ious,
        )

        rng = np.random.default_rng(3)
        cat_of_part, _ = _category_tables(50)
        # shapes from several categories, predictions inside the category
        firsts = [0, 12, 24, 30, 47, 41]
        preds, targets = [], []
        for f in firsts:
            cat = CATEGORY_NAMES[cat_of_part[f]]
            from prifit_tpu.data.shapenet import SEG_CLASSES
            parts = SEG_CLASSES[cat]
            t = rng.choice(parts, size=64)
            t[0] = f
            p = rng.choice(parts, size=64)
            preds.append(p)
            targets.append(t)
        pred = np.stack(preds)
        target = np.stack(targets)
        per_shape, cat_idx, inter, cnt_t = batch_shape_ious(pred, target)
        for i, f in enumerate(firsts):
            cat = CATEGORY_NAMES[cat_of_part[f]]
            assert cat_idx[i] == cat_of_part[f]
            expected = mean_iou_one_sample(pred[i], target[i], cat)
            assert abs(per_shape[i] - expected) < 1e-12
        np.testing.assert_array_equal(cnt_t.sum(1), 64)

    def test_sharded_eval_matches_unsharded(self):
        """Batch-sharded eval (pad-and-mask tail) == unsharded metrics."""
        from prifit_tpu.parallel import make_data_mesh, shard_batch

        rng = np.random.default_rng(5)
        W = jnp.asarray(rng.normal(size=(3, 50)), jnp.float32)

        def forward(points, cls):
            return points @ W

        batches = []
        for bs in (4, 4, 2):        # ragged tail (drop_last=False)
            pts = rng.normal(size=(bs, 32, 3)).astype(np.float32)
            target = rng.integers(0, 4, (bs, 32)).astype(np.int64)
            batches.append((pts, np.zeros((bs, 1), np.int64), target))

        plain = evaluation(jax.jit(forward), iter(batches),
                           log=lambda *_: None)
        mesh = make_data_mesh(4)
        assert mesh.size > 1
        sharded = evaluation(
            jax.jit(forward), iter(batches), log=lambda *_: None,
            place=lambda b: shard_batch(mesh, b), pad_to=4)
        for k in plain:
            assert np.isclose(plain[k], sharded[k], atol=1e-6), \
                (k, plain[k], sharded[k])


@pytest.mark.slow
class TestEndToEndCLI:
    def test_tiny_training_run(self, tmp_path):
        """Full trainer on fixtures: supervised + selfsup, 1 epoch."""
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=6,
                               n_points=96)
        args = parse_args([
            "--model", "pointnet2_part_seg_msg", "--epoch", "1",
            "--batch_size", "2", "--npoint", "48", "--k_shot", "2",
            "--selfsup", "--ss_dataset", "acd", "--ss_path", acd,
            "--data_root", sn, "--quantile", "0.05",
            "--msc_iterations", "2", "--max_num_clusters", "4",
            "--n_per_prim", "16", "--chamfer_npoints", "96",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.005"])
        metrics = main(args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0
        assert osp.isdir(str(tmp_path / "log"))

    def test_sp_points_training_run(self, tmp_path):
        """--sp_points routes the self-sup step through the point-SP
        (ring mean-shift + psum fit) path on a 2-D mesh."""
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=6,
                               n_points=96)
        args = parse_args([
            "--model", "pointnet2_part_seg_msg", "--epoch", "1",
            "--batch_size", "2", "--npoint", "48", "--k_shot", "2",
            "--selfsup", "--ss_dataset", "acd", "--ss_path", acd,
            "--data_root", sn, "--quantile", "0.2",
            "--msc_iterations", "2", "--max_num_clusters", "4",
            "--n_per_prim", "16", "--chamfer_npoints", "96",
            "--sp_points", "4",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.005"])
        metrics = main(args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0

    def test_fitting_demo(self):
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.fitting import main

        main(parse_args(["--batch_size", "1", "--quantile", "0.05",
                         "--msc_iterations", "3", "--n_per_prim", "32"]))


class TestFusedAugment:
    def test_augment_jax_matches_provider_semantics(self):
        import jax
        import jax.numpy as jnp
        from prifit_tpu.data import augment_jax

        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
        key = jax.random.PRNGKey(0)
        out = augment_jax.random_scale_point_cloud(key, batch)
        ratio = np.asarray(out) / np.asarray(batch)
        assert ratio.min() >= 0.8 - 1e-5 and ratio.max() <= 1.25 + 1e-5
        out = augment_jax.shift_point_cloud(key, batch)
        d = np.asarray(out) - np.asarray(batch)
        assert np.allclose(d.std(axis=1), 0, atol=1e-6)
        out = augment_jax.rotate_point_cloud(key, batch)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=2),
            np.linalg.norm(np.asarray(batch), axis=2), rtol=1e-4)
        out = augment_jax.jitter_point_cloud(key, batch)
        assert np.abs(np.asarray(out) - np.asarray(batch)).max() <= 0.05001
        out = augment_jax.random_point_dropout(key, batch)
        assert out.shape == batch.shape

    def test_fused_supervised_step(self, ssg_setup):
        mod, model, pts, cls, state = ssg_setup
        step = make_supervised_step(model, mod.get_loss,
                                    fused_augment=True)
        target = jnp.zeros((B, N), jnp.int32)
        state, m = step(state, pts, cls, target, 0.005, 0.1,
                        jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
class TestPretrainAndTestingCLI:
    def test_pretrain_cli(self, tmp_path):
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.pretrain_partseg import main

        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=10,
                               n_points=96)
        args = parse_args([
            "--model", "pretrain_pointnet2_part_seg_msg", "--epoch", "2",
            "--batch_size", "2", "--npoint", "48", "--selfsup",
            "--ss_path", acd, "--quantile", "0.1",
            "--msc_iterations", "2", "--max_num_clusters", "4",
            "--n_per_prim", "16", "--chamfer_npoints", "96",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.001"])
        best_val = main(args)
        assert np.isfinite(best_val)
        # best_model checkpoint saved
        import glob
        assert glob.glob(str(tmp_path / "log" / "**" / "best_model"),
                         recursive=True)

    def test_pretrain_cli_contrastive(self, tmp_path):
        """--ss_loss contrastive pretrains with the ACD pairwise
        contrastive loss (the criterion the reference builds at
        ``pretrain:212`` and bypasses at ``:358``)."""
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.pretrain_partseg import main

        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=10,
                               n_points=96)
        args = parse_args([
            "--model", "pretrain_pointnet2_part_seg_msg", "--epoch", "2",
            "--batch_size", "2", "--npoint", "96", "--selfsup",
            "--ss_loss", "contrastive", "--ss_path", acd,
            "--chamfer_npoints", "96",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.001"])
        best_val = main(args)
        assert np.isfinite(best_val)
        import glob
        assert glob.glob(str(tmp_path / "log" / "**" / "best_model"),
                         recursive=True)

    def test_finetune_from_pretrain_checkpoint(self, tmp_path):
        """--pretrained_model warm-starts the finetune trainer from a
        pretrain checkpoint: backbone params come from the checkpoint,
        finetune-only heads keep their fresh init (reference
        ``train:276-280``; torch's strict load works there because torch
        registers declared-but-uncalled submodules — flax doesn't)."""
        import glob

        from prifit_tpu.cli import pretrain_partseg, train_partseg
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.train.checkpoint import _raw_restore

        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=6,
                               n_points=96)
        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        pre_args = parse_args([
            "--model", "pretrain_pointnet2_part_seg_msg", "--epoch", "1",
            "--epoch_iters", "2", "--batch_size", "2", "--npoint", "48",
            "--selfsup", "--ss_path", acd, "--quantile", "0.2",
            "--msc_iterations", "2", "--max_num_clusters", "4",
            "--n_per_prim", "16", "--chamfer_npoints", "96",
            "--experiment_root", str(tmp_path / "pre"),
            "--learning_rate", "0.001"])
        pretrain_partseg.main(pre_args)
        ck = glob.glob(str(tmp_path / "pre" / "**" / "best_model"),
                       recursive=True)[0]

        ft_args = parse_args([
            "--model", "pointnet2_part_seg_msg", "--epoch", "1",
            "--epoch_iters", "2", "--batch_size", "2", "--npoint", "48",
            "--k_shot", "2", "--data_root", sn,
            "--pretrained_model", ck,
            "--experiment_root", str(tmp_path / "ft"),
            "--learning_rate", "0.0"])  # lr clips to 1e-5: ~frozen
        metrics = train_partseg.main(ft_args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0

        # the saved finetune checkpoint's backbone tracks the pretrain
        # ckpt (2 Adam steps at the 1e-5 lr clip move params O(1e-5);
        # a fresh lecun init would differ at O(0.1))
        restored_pre = _raw_restore(*osp.split(ck))
        ft_ck = glob.glob(str(tmp_path / "ft" / "**" / "best_model"),
                          recursive=True)[0]
        restored_ft = _raw_restore(*osp.split(ft_ck))
        pre_w = restored_pre["params"]["sa1"]["GroupedFirstLayer_0"]
        ft_w = restored_ft["params"]["sa1"]["GroupedFirstLayer_0"]
        np.testing.assert_allclose(np.asarray(pre_w["w_xyz"]),
                                   np.asarray(ft_w["w_xyz"]), atol=1e-3)

    def test_testing_cli(self, tmp_path):
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.testing import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        args = parse_args([
            "--model", "pointnet2_part_seg_ssg", "--batch_size", "2",
            "--npoint", "48", "--data_root", sn])
        metrics = main(args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0


@pytest.mark.slow
class TestInitClass:
    def test_conv2_reinit_runs_and_only_touches_conv2(self, tmp_path):
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import train_init_class
        from prifit_tpu.data import DataLoader, PartNormalDataset
        from tests.fixtures import make_shapenet_fixture

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=4,
                                   n_points=64)
        args = parse_args(["--npoint", "48", "--data_root", sn])
        ds = PartNormalDataset(sn, npoints=48, split="train",
                               rng=np.random.default_rng(0))
        loader = DataLoader(ds, 2)
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=PARTS)
        pts = jnp.zeros((2, 48, 3))
        cls = jnp.zeros((2, 16))
        state = create_train_state(model, (pts, cls), dict(train=True))
        before = jax.tree_util.tree_map(np.asarray, state.params)
        new_state = train_init_class(state, model, mod, loader, args,
                                     lambda *_: None, num_epochs=2)
        after = new_state.params
        # conv2 changed; everything else identical
        assert not np.allclose(before["conv2"]["kernel"],
                               np.asarray(after["conv2"]["kernel"]))
        np.testing.assert_array_equal(
            before["conv1"]["kernel"], np.asarray(after["conv1"]["kernel"]))


@pytest.mark.slow
class TestLearning:
    def test_overfits_single_batch(self):
        """30 steps on one batch must push accuracy way above chance —
        end-to-end evidence that gradients, BN state, and the optimizer
        actually optimize."""
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=4)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = to_categorical(jnp.zeros((2, 1), jnp.int32))
        # learnable structure: label = octant-ish partition of space
        target = jnp.asarray(
            (np.asarray(pts[..., 0]) > 0).astype(np.int32)
            + 2 * (np.asarray(pts[..., 1]) > 0).astype(np.int32))
        state = create_train_state(model, (pts, cls), dict(train=True))
        step = make_supervised_step(model, mod.get_loss)
        accs = []
        for i in range(30):
            state, m = step(state, pts, cls, target, 0.01, 0.1,
                            jax.random.PRNGKey(0))
            accs.append(float(m["acc"]))
        assert accs[-1] > 0.9, f"did not overfit: {accs[-5:]}"


@pytest.mark.slow
class TestContrastivePath:
    def test_contrastive_training_cli(self, tmp_path):
        """The original ACD contrastive objective end-to-end."""
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=6,
                               n_points=96)
        args = parse_args([
            "--model", "pointnet2_part_seg_msg", "--epoch", "1",
            "--batch_size", "2", "--npoint", "48", "--k_shot", "2",
            "--selfsup", "--ss_loss", "contrastive", "--ss_dataset", "acd",
            "--ss_path", acd, "--data_root", sn,
            "--chamfer_npoints", "96",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.005"])
        metrics = main(args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0


@pytest.mark.slow
class TestDummySelfSupPath:
    def test_dummy_dataset_convex_training(self, tmp_path):
        """--ss_dataset dummy yields 3-tuples; the convex branch must use
        the resampled points as their own chamfer target (the reference
        crashes on this combination — latent breakage)."""
        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=8,
                                   n_points=64)
        args = parse_args([
            "--model", "pointnet2_part_seg_msg", "--epoch", "1",
            "--batch_size", "2", "--npoint", "48", "--k_shot", "2",
            "--selfsup", "--ss_dataset", "dummy", "--data_root", sn,
            "--quantile", "0.1", "--msc_iterations", "2",
            "--max_num_clusters", "4", "--n_per_prim", "16",
            "--experiment_root", str(tmp_path / "log"),
            "--learning_rate", "0.005"])
        metrics = main(args)
        assert 0.0 <= metrics["instance_avg_iou"] <= 1.0


class TestStageDtypes:
    """Per-stage dtype overrides for the bf16 bisection (r3)."""

    def test_variants_run_and_round(self):
        mod = get_module("pointnet2_part_seg_msg")
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = jnp.zeros((2, 16), jnp.float32)
        base = mod.get_model(num_parts=50)
        v = base.init({"params": jax.random.PRNGKey(0),
                       "sampling": jax.random.PRNGKey(1),
                       "dropout": jax.random.PRNGKey(2)},
                      pts, cls, train=True)
        o_f32 = base.apply(v, pts, cls, train=False).seg_logits

        quant = mod.get_model(num_parts=50, stage_dtypes="sa1:q,fp2:q")
        o_q = quant.apply(v, pts, cls, train=False).seg_logits
        # quantization rounds forward values (different from f32)...
        assert float(jnp.abs(o_q - o_f32).max()) > 0
        assert bool(jnp.isfinite(o_q).all())

        # ...with an exactly-identity backward: gradient of sum(output)
        # wrt the final Dense bias is the same computation graph shape;
        # just assert gradients exist and are finite
        def loss(p):
            o = quant.apply({**v, "params": p}, pts, cls, train=False)
            return jnp.sum(o.seg_logits ** 2)

        g = jax.grad(loss)(v["params"])
        gsum = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
        assert np.isfinite(gsum) and gsum > 0

    def test_fq_matches_bf16_forward_with_f32_grads(self):
        """`fq` reproduces the bf16 forward numerics (straight-through
        rounding at matmul inputs/outputs + BN outputs) while autodiff
        sees identity — the fwd-vs-bwd rounding discriminator."""
        mod = get_module("pointnet2_part_seg_msg")
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = jnp.zeros((2, 16), jnp.float32)
        # f32 baseline pinned: the DEFAULT is mxsr since round 5, whose
        # eval forward is bf16 — it would equal the bf16 arm exactly
        base = mod.get_model(num_parts=50, compute_dtype="f32")
        v = base.init({"params": jax.random.PRNGKey(0),
                       "sampling": jax.random.PRNGKey(1),
                       "dropout": jax.random.PRNGKey(2)},
                      pts, cls, train=True)
        spec_bf = ",".join(f"{s}:bf16" for s in
                           ("sa1", "sa2", "sa3", "fp3", "fp2", "fp1"))
        spec_fq = spec_bf.replace("bf16", "fq")
        # fq mirrors the EXPLICIT bf16 op sequence (the folded-BN path
        # rounds at different points)
        import os
        os.environ["PRIFIT_FOLDED_BN"] = "0"
        try:
            o_bf = mod.get_model(num_parts=50, stage_dtypes=spec_bf) \
                .apply(v, pts, cls, train=False).seg_logits
        finally:
            os.environ.pop("PRIFIT_FOLDED_BN", None)
        fq_model = mod.get_model(num_parts=50, stage_dtypes=spec_fq)
        o_fq = fq_model.apply(v, pts, cls, train=False).seg_logits
        o_f32 = base.apply(v, pts, cls, train=False).seg_logits
        # fq tracks the bf16 forward much closer than f32 does
        err_fq = float(jnp.abs(o_fq - o_bf).max())
        err_f32 = float(jnp.abs(o_f32 - o_bf).max())
        assert err_fq < 0.5 * err_f32 + 1e-6, (err_fq, err_f32)
        # and rounds (differs from f32)
        assert float(jnp.abs(o_fq - o_f32).max()) > 0

        def loss(p):
            o = fq_model.apply({**v, "params": p}, pts, cls, train=False)
            return jnp.sum(o.seg_logits ** 2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(x.dtype == jnp.float32 for x in leaves)
        gsum = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
        assert np.isfinite(gsum) and gsum > 0


@pytest.mark.slow
class TestBf16Encoder:
    def test_overfits_single_batch_bf16(self):
        """Forced bf16 encoder compute (the TPU default, CLAUDE.md perf
        ledger) still optimizes: same overfit harness as
        TestLearning with compute_dtype='bf16'."""
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=4, compute_dtype="bf16")
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = to_categorical(jnp.zeros((2, 1), jnp.int32))
        target = jnp.asarray(
            (np.asarray(pts[..., 0]) > 0).astype(np.int32)
            + 2 * (np.asarray(pts[..., 1]) > 0).astype(np.int32))
        state = create_train_state(model, (pts, cls), dict(train=True))
        step = make_supervised_step(model, mod.get_loss)
        for i in range(30):
            state, m = step(state, pts, cls, target, 0.01, 0.1,
                            jax.random.PRNGKey(0))
        assert float(m["acc"]) > 0.9
        # params and seg logits stay f32 (heads + optimizer state)
        assert state.params["conv2"]["kernel"].dtype == jnp.float32

    def test_overfits_single_batch_mxsr(self):
        """mxsr (stochastically-rounded bf16 cotangents, nn/mixed.py)
        optimizes through the real supervised step: the SR noise is
        unbiased, so SGD still converges on the overfit harness."""
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=4, compute_dtype="mxsr")
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = to_categorical(jnp.zeros((2, 1), jnp.int32))
        target = jnp.asarray(
            (np.asarray(pts[..., 0]) > 0).astype(np.int32)
            + 2 * (np.asarray(pts[..., 1]) > 0).astype(np.int32))
        state = create_train_state(model, (pts, cls), dict(train=True))
        step = make_supervised_step(model, mod.get_loss)
        for i in range(30):
            # vary the key so each step draws fresh SR bits (as the
            # trainer does) — the convergence must survive the noise
            state, m = step(state, pts, cls, target, 0.01, 0.1,
                            jax.random.PRNGKey(i))
        assert float(m["acc"]) > 0.9
        assert state.params["conv2"]["kernel"].dtype == jnp.float32

    def test_bf16_forward_close_to_f32(self):
        """bf16 vs f32 encoder on identical params: log-prob outputs agree
        to bf16 tolerance (the two paths share parameter shapes/names)."""
        mod = get_module("pointnet2_part_seg_msg")
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
        cls = to_categorical(jnp.zeros((2, 1), jnp.int32))
        m32 = mod.get_model(num_parts=8, compute_dtype="f32")
        m16 = mod.get_model(num_parts=8, compute_dtype="bf16")
        variables = m32.init(
            dict(params=jax.random.PRNGKey(0),
                 sampling=jax.random.PRNGKey(1),
                 dropout=jax.random.PRNGKey(2)),
            pts, cls, train=False)
        out32 = m32.apply(variables, pts, cls, train=False)
        out16 = m16.apply(variables, pts, cls, train=False)
        p32 = np.exp(np.asarray(out32.seg_logits))
        p16 = np.exp(np.asarray(out16.seg_logits))
        assert out16.seg_logits.dtype == jnp.float32
        np.testing.assert_allclose(p16, p32, atol=0.05)


@pytest.mark.slow
class TestTrainerDeterminism:
    def test_two_runs_identical(self, tmp_path):
        """Two identical CLI runs produce identical metrics — worker
        threads, prefetch streams and jax RNG are all seed-deterministic
        end to end."""
        import json as _json

        from prifit_tpu.cli.args_parser import parse_args
        from prifit_tpu.cli.train_partseg import main

        sn = make_shapenet_fixture(str(tmp_path / "sn"), n_per_cat=6,
                                   n_points=64)
        acd = make_acd_fixture(str(tmp_path / "acd"), n_shapes=6,
                               n_points=96)

        def run(tag):
            args = parse_args([
                "--model", "pointnet2_part_seg_msg", "--epoch", "2",
                "--batch_size", "2", "--npoint", "48", "--k_shot", "2",
                "--selfsup", "--ss_dataset", "acd", "--ss_path", acd,
                "--data_root", sn, "--quantile", "0.05",
                "--msc_iterations", "2", "--max_num_clusters", "4",
                "--n_per_prim", "16", "--chamfer_npoints", "96",
                "--num_workers", "3" if tag == "a" else "0",
                "--experiment_root", str(tmp_path / f"log{tag}"),
                "--learning_rate", "0.005", "--seed", "11"])
            metrics = main(args)
            run_dir = next((tmp_path / f"log{tag}").iterdir())
            lines = [(tmp_path / f"log{tag}" / run_dir.name /
                      "metrics.jsonl").read_text().splitlines()]
            epochs = [_json.loads(l) for l in lines[0]
                      if "train_acc" in l]
            return metrics, epochs

        m_a, ep_a = run("a")
        m_b, ep_b = run("b")
        # per-epoch train accuracy identical despite different worker
        # counts (per-(seed, epoch, index) item rng)
        assert len(ep_a) == len(ep_b) == 2
        for ea, eb in zip(ep_a, ep_b):
            np.testing.assert_allclose(ea["train_acc"], eb["train_acc"],
                                       rtol=0, atol=0)
        np.testing.assert_allclose(m_a["instance_avg_iou"],
                                   m_b["instance_avg_iou"], atol=0)


def test_sa_bf16_hybrid_forward_finite():
    """The sa_bf16 opt-in (SA layers bf16, FP + heads f32) runs and
    produces finite f32 logits."""
    mod = get_module("pointnet2_part_seg_msg")
    model = mod.get_model(num_parts=8, compute_dtype="sa_bf16")
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 96, 3)), jnp.float32)
    cls = to_categorical(jnp.zeros((2, 1), jnp.int32))
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), sampling=jax.random.PRNGKey(1),
             dropout=jax.random.PRNGKey(2)), pts, cls, train=False)
    out = model.apply(variables, pts, cls, train=False)
    assert out.seg_logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out.seg_logits)))

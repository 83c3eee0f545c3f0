"""Model zoo tests: shapes, registry, losses, convex-loss integration.

The reference has no model tests beyond ``__main__`` smoke blocks
(SURVEY.md §4); these are the forward-shape/finiteness/grad checks those
blocks imply, on tiny point counts to keep CPU CI fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prifit_tpu.models import (
    MODEL_NAMES,
    SegOutput,
    get_module,
    nll_loss,
    pairwise_contrastive_loss,
    to_categorical,
)

B, N, PARTS = 2, 128, 50


def _init_and_apply(model, args, method_kwargs=None, rngs_extra=()):
    kw = dict(method_kwargs or {})
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(3)
    variables = model.init(rngs, *args, train=True, **kw)
    out, updates = model.apply(
        variables, *args, train=True, rngs=rngs,
        mutable=["batch_stats", "selfsup_state"], **kw)
    return out, variables, updates


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)


@pytest.fixture(scope="module")
def cls_onehot():
    return to_categorical(jnp.zeros((B, 1), jnp.int32))


class TestRegistry:
    def test_all_names_resolve(self):
        for name in MODEL_NAMES:
            mod = get_module(name)
            assert hasattr(mod, "get_model")
            assert hasattr(mod, "get_loss")

    def test_dgcnn_substring(self):
        assert get_module("dgcnn_seg").__name__.endswith("dgcnn")

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_module("resnet50")


class TestPartSegModels:
    @pytest.mark.parametrize("name", ["pointnet2_part_seg_ssg",
                                      "pointnet2_part_seg_msg",
                                      "pretrain_pointnet2_part_seg_msg",
                                      "pointnet_part_seg"])
    def test_forward_shapes(self, name, cloud, cls_onehot):
        mod = get_module(name)
        if name == "pointnet_part_seg":
            model = mod.get_model(part_num=PARTS, normal_channel=False)
        elif name == "pointnet2_part_seg_ssg":
            model = mod.get_model(num_classes=PARTS)
        else:
            model = mod.get_model(num_parts=PARTS)
        out, _, _ = _init_and_apply(model, (cloud, cls_onehot))
        assert isinstance(out, SegOutput)
        assert out.seg_logits.shape == (B, N, PARTS)
        assert out.feat.shape[-1] == 128
        # log-softmax: rows sum to 1 in prob space
        np.testing.assert_allclose(
            np.exp(np.asarray(out.seg_logits)).sum(-1), 1.0, atol=1e-4)

    def test_msg_convex_loss_integration(self, cloud, cls_onehot):
        mod = get_module("pointnet2_part_seg_msg")
        model = mod.get_model(num_parts=PARTS)
        kw = dict(chamfer_points=cloud, include_convex_loss=True,
                  quantile=0.05, msc_iterations=3, max_num_clusters=8,
                  n_per_prim=32)
        out, _, updates = _init_and_apply(
            model, (cloud, cls_onehot), kw, rngs_extra=("selfsup",))
        assert np.isfinite(float(out.total_loss))
        assert out.convex is not None
        assert out.convex.params.r.shape == (B, 8, 3)
        # beta decayed by one forward step
        beta = updates["selfsup_state"]["beta"]
        np.testing.assert_allclose(float(beta), 0.99, atol=1e-6)

    def test_msg_extra_layers(self, cloud, cls_onehot):
        mod = get_module("pointnet2_part_seg_msg")
        model = mod.get_model(num_parts=PARTS, extra_layers=True)
        kw = dict(chamfer_points=cloud, include_convex_loss=True,
                  quantile=0.05, msc_iterations=2, max_num_clusters=4,
                  n_per_prim=16)
        out, _, _ = _init_and_apply(model, (cloud, cls_onehot), kw,
                                    rngs_extra=("selfsup",))
        assert np.isfinite(float(out.total_loss))

    def test_eval_mode_deterministic(self, cloud, cls_onehot):
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=PARTS)
        _, variables, _ = _init_and_apply(model, (cloud, cls_onehot))
        out1 = model.apply(variables, cloud, cls_onehot, train=False)
        out2 = model.apply(variables, cloud, cls_onehot, train=False)
        np.testing.assert_array_equal(np.asarray(out1.seg_logits),
                                      np.asarray(out2.seg_logits))

    def test_supervised_grad_flows(self, cloud, cls_onehot):
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=PARTS)
        _, variables, _ = _init_and_apply(model, (cloud, cls_onehot))
        target = jnp.zeros((B, N), jnp.int32)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                cloud, cls_onehot, train=True,
                rngs={"sampling": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return mod.get_loss(out.seg_logits, target)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(l)) for l in leaves)
        assert any(np.abs(l).max() > 0 for l in leaves)


class TestOtherModels:
    def test_cls_models(self, cloud):
        for name in ["pointnet_cls", "pointnet2_cls_ssg",
                     "pointnet2_cls_msg"]:
            mod = get_module(name)
            if name == "pointnet_cls":
                model = mod.get_model(k=40, normal_channel=False)
            else:
                model = mod.get_model(num_class=40, normal_channel=False)
            (logp, _aux), _, _ = _init_and_apply(model, (cloud,))
            assert logp.shape == (B, 40)

    def test_sem_seg_models(self, cloud):
        for name in ["pointnet_sem_seg", "pointnet2_sem_seg"]:
            mod = get_module(name)
            if name == "pointnet_sem_seg":
                model = mod.get_model(num_class=13, with_rgb=False)
                x = jnp.concatenate([cloud, cloud], -1)  # encoder wants 6ch
            else:
                model = mod.get_model(num_classes=13, with_rgb=False)
                x = cloud
            (logp, _), _, _ = _init_and_apply(model, (x,))
            assert logp.shape == (B, N, 13)

    def test_dgcnn(self, cloud):
        mod = get_module("dgcnn")
        model = mod.get_model(num_parts=3, nn_nb=16)
        out, _, _ = _init_and_apply(model, (cloud, None))
        assert out.seg_logits.shape == (B, N, 3)
        assert out.feat.shape == (B, N, 128)

    def test_edgeconv_matches_edge_tensor(self, cloud):
        """The fused (project-first / no-concat) _EdgeConv equals the
        reference-layout dense over the materialized [B,N,K,2C] edge
        tensor (src/dgcnn.py:74-107 + the Conv2d at :160), both gather
        orders."""
        from flax import linen as fnn
        from prifit_tpu.nn.dgcnn import _EdgeConv, get_graph_feature
        from prifit_tpu.ops.pairwise import knn

        for C in (3, 64):  # narrow (edge path) and wide (project-first)
            x = jnp.asarray(np.random.default_rng(C).normal(
                size=(B, N, C)), jnp.float32)
            idx = knn(x, 8)
            conv = _EdgeConv(features=64, groups=2)
            variables = conv.init(jax.random.PRNGKey(0), x, idx)
            got = conv.apply(variables, x, idx)

            edge, _ = get_graph_feature(x, 8, 8, idx=idx)
            y = jnp.matmul(edge, variables["params"]["kernel"],
                           precision=jax.lax.Precision.HIGHEST)
            gn = fnn.GroupNorm(num_groups=2)
            y = gn.apply({"params": variables["params"]["GroupNorm_0"]}, y)
            want = jnp.max(fnn.leaky_relu(y, negative_slope=0.2), axis=2)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-5)

    def test_reconstruction(self, cloud, cls_onehot):
        mod = get_module("reconstruction")
        model = mod.get_model(num_classes=PARTS, num_charts=4,
                              num_points=16)
        out, _, _ = _init_and_apply(model, (cloud, cls_onehot))
        assert out.recon_points.shape == (B, 4 * 16, 3)


class TestLosses:
    def test_nll_matches_manual(self):
        logits = jax.nn.log_softmax(
            jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 5)),
                        jnp.float32))
        target = jnp.asarray(
            np.random.default_rng(1).integers(0, 5, (4, 8)))
        got = float(nll_loss(logits, target))
        want = -np.mean(np.take_along_axis(
            np.asarray(logits), np.asarray(target)[..., None], -1))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_contrastive_perfect_embedding_low(self):
        # features == one-hot of target: positives sim=1, negatives sim=0
        target = jnp.asarray(np.arange(32) % 4)[None]        # [1, 32]
        feat = jax.nn.one_hot(target, 8)                     # [1, 32, 8]
        l_perfect = float(pairwise_contrastive_loss(
            feat, target, jax.random.PRNGKey(0)))
        rnd = jax.random.normal(jax.random.PRNGKey(1), feat.shape)
        l_rand = float(pairwise_contrastive_loss(
            rnd, target, jax.random.PRNGKey(0)))
        assert l_perfect < 1e-6
        assert l_rand > l_perfect

    def test_to_categorical(self):
        y = jnp.asarray([[2], [5]])
        oh = to_categorical(y)
        assert oh.shape == (2, 16)
        assert float(oh[0, 2]) == 1.0 and float(oh[1, 5]) == 1.0


class TestShapeRobustness:
    """Fused grouping paths across awkward shapes (odd N, N < nsample,
    N < npoint) — the gates and pads must hold everywhere."""

    @pytest.mark.parametrize("n", [40, 100, 130, 513])
    def test_ssg_forward_odd_sizes(self, n, cls_onehot):
        rng = np.random.default_rng(n)
        pts = jnp.asarray(rng.normal(size=(B, n, 3)), jnp.float32)
        mod = get_module("pointnet2_part_seg_ssg")
        model = mod.get_model(num_classes=PARTS)
        out, _, _ = _init_and_apply(model, (pts, cls_onehot))
        assert out.seg_logits.shape == (B, n, PARTS)
        assert np.all(np.isfinite(np.asarray(out.seg_logits)))

    def test_msg_reference_path_matches_shapes(self, cloud, cls_onehot):
        """fused=False (strict reference semantics) still works."""
        from prifit_tpu.nn.pointnet2 import SetAbstractionMsg

        sa = SetAbstractionMsg(16, [0.2, 0.4], [8, 16],
                               [[8, 8], [8, 8]], fused=False)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}
        v = sa.init(rngs, cloud, cloud, False)
        new_xyz, feats = sa.apply(v, cloud, cloud, False)
        assert new_xyz.shape == (B, 16, 3)
        assert feats.shape == (B, 16, 16)


class TestFoldedBNOptIn:
    def test_folded_matches_explicit_chain(self):
        """PRIFIT_FOLDED_BN=1 (the opt-in folded-into-dense variant,
        reverted from default after the measured training regression)
        stays numerically equivalent to the default explicit
        dense/BN/relu chain: outputs and running stats to ~1e-4."""
        import os

        from prifit_tpu.nn.pointnet2 import PointMLP

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 64, 16)), jnp.float32)
        mlp = PointMLP([32, 48], d_in=16)
        v = mlp.init(jax.random.PRNGKey(0), x, True)

        out_e, muts_e = mlp.apply(v, x, True, mutable=["batch_stats"])
        os.environ["PRIFIT_FOLDED_BN"] = "1"
        try:
            out_f, muts_f = mlp.apply(v, x, True,
                                      mutable=["batch_stats"])
        finally:
            os.environ.pop("PRIFIT_FOLDED_BN", None)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                                   atol=1e-4, rtol=1e-4)
        for (ke, le), (kf, lf) in zip(
                sorted(muts_e["batch_stats"].items()),
                sorted(muts_f["batch_stats"].items())):
            assert ke == kf
            np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=ke)

    def test_remat_optin_matches_default(self):
        """PRIFIT_REMAT_MLP=1 (memory opt-in) is the same computation
        under jax.checkpoint — outputs and running stats match the
        default path exactly."""
        import os

        from prifit_tpu.nn.pointnet2 import PointMLP

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 32, 8, 16)), jnp.float32)
        mlp = PointMLP([32, 48], d_in=16)
        v = mlp.init(jax.random.PRNGKey(0), x, True)

        def run():
            out, muts = mlp.apply(v, x, True, mutable=["batch_stats"])
            g = jax.grad(lambda vv: float(0) + jnp.sum(
                mlp.apply({**v, "params": vv}, x, True,
                          mutable=["batch_stats"])[0] ** 2))(v["params"])
            return out, muts, g

        out_d, muts_d, g_d = run()
        os.environ["PRIFIT_REMAT_MLP"] = "1"
        try:
            out_r, muts_r, g_r = run()
        finally:
            os.environ.pop("PRIFIT_REMAT_MLP", None)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d),
                                   atol=1e-6, rtol=1e-6)
        for (kd, ld), (kr, lr) in zip(
                sorted(muts_d["batch_stats"].items()),
                sorted(muts_r["batch_stats"].items())):
            np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                                       atol=1e-6, rtol=1e-6, err_msg=kd)
        for a, b in zip(jax.tree_util.tree_leaves(g_r),
                        jax.tree_util.tree_leaves(g_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

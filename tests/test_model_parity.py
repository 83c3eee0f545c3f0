"""FULL-MODEL parity against the reference (weights ported, unit-level).

Every op and the loss stack are oracled piecewise in
test_reference_parity.py / test_subsystem_parity.py; this file closes the
remaining gap (VERDICT r3 missing item 1): identical weights loaded into
the reference's torch model and ours, whole-forward outputs compared, and
a multi-step SGD training trajectory compared.

Determinism pinning (both sides):
- FPS start: ``torch.randint`` patched to zero / our eval path (start 0);
  training-mode FPS pinned via ``PRIFIT_DET_FPS=1``.
- Ball query: ``fused_ball_query=False`` (reference-exact first-k-by-index
  semantics).
- Dropout: rate 0 on both sides for the trajectory test (eval mode
  elsewhere).

The flagship model's working return contract is the 5-tuple
(SURVEY §2.9.1 — the reference's own ``include_convex_loss=False`` path
NameErrors at the return), so the eval-forward oracle for the flagship
captures ``feat_embed`` by faking ``convex_loss`` in the reference
module's namespace; the convex subsystem itself is oracled end-to-end in
test_subsystem_parity.py.

Reference: ``models/pointnet2_part_seg_msg.py:64-134``,
``models/pretrain_pointnet2_part_seg_msg.py:39-88``,
``models/pointnet_util.py:160-314``,
checkpoint format ``train_partseg_shapenet.py:263-280`` /
``testing.py:96-107``.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not mounted"),
    pytest.mark.slow,  # heavy e2e tier
]

if os.path.isdir(REF):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    def _ns(**kw):
        return types.SimpleNamespace(**kw)

    o3d = sys.modules.get("open3d")
    if o3d is None:
        o3d = types.ModuleType("open3d")
        sys.modules["open3d"] = o3d
    for attr, val in (("utility", _ns(Vector3dVector=None,
                                      Vector3iVector=None)),
                      ("visualization", _ns(draw_geometries=None)),
                      ("geometry", _ns(PointCloud=None))):
        if not hasattr(o3d, attr):
            setattr(o3d, attr, val)
    if "trimesh" not in sys.modules:
        tm = types.ModuleType("trimesh")
        tm.creation = _ns(icosphere=None)
        tm.sample = _ns(sample_surface_even=None)
        sys.modules["trimesh"] = tm
    if "ipdb" not in sys.modules:
        ip = types.ModuleType("ipdb")
        ip.set_trace = lambda: None
        sys.modules["ipdb"] = ip
    if "transforms3d" not in sys.modules:
        t3d = types.ModuleType("transforms3d")
        aff = types.ModuleType("transforms3d.affines")
        aff.compose = None
        eul = types.ModuleType("transforms3d.euler")
        eul.euler2mat = None
        t3d.affines, t3d.euler = aff, eul
        sys.modules["transforms3d"] = t3d
        sys.modules["transforms3d.affines"] = aff
        sys.modules["transforms3d.euler"] = eul

    import models.pointnet2_part_seg_msg as ref_msg          # noqa: E402
    import models.pretrain_pointnet2_part_seg_msg as ref_pre  # noqa: E402

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from prifit_tpu.train.torch_port import (                     # noqa: E402
    export_msg_state_dict,
    import_msg_state_dict,
    load_torch_checkpoint,
)

B, N, PARTS = 2, 192, 50


@pytest.fixture(autouse=True)
def _pin(monkeypatch):
    """cuda no-ops, FPS start pinned to 0 on both sides, torch seed."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self)
    real = torch.randint
    monkeypatch.setattr(
        torch, "randint",
        lambda *a, **k: torch.zeros_like(real(*a, **k)))
    monkeypatch.setenv("PRIFIT_DET_FPS", "1")
    torch.manual_seed(0)


@pytest.fixture
def data():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    cls = np.zeros((B, 16), np.float32)
    cls[:, 2] = 1.0
    return x, cls


def _warm_bn(ref, xt, ct, steps=2, **fwd_kwargs):
    """Populate torch running BN stats so the mean/var mapping is
    actually exercised (fresh stats are the trivial 0/1)."""
    ref.train()
    with torch.no_grad():
        for _ in range(steps):
            ref(xt, ct, **fwd_kwargs)
    ref.eval()


def _ours(module_name, **kw):
    import importlib

    mod = importlib.import_module(f"prifit_tpu.models.{module_name}")
    # dtype pinned to f32: these tests compare ported weights against
    # the f32 torch reference at atol 5e-5, which the default mxsr
    # mode's bf16 forward storage cannot (and should not) meet
    kw.setdefault("compute_dtype", "f32")
    return mod, mod.get_model(num_parts=PARTS, fused_ball_query=False,
                              **kw)


class TestEvalForwardParity:
    def test_pretrain_model(self, data):
        """Whole-forward oracle: logits / feat / l1-l3 hidden states."""
        x, cls = data
        xt = torch.tensor(x).permute(0, 2, 1)
        ct = torch.tensor(cls)
        ref = ref_pre.get_model(num_parts=PARTS)
        _warm_bn(ref, xt, ct)
        with torch.no_grad():
            lr, (l1r, l2r, l3r), fr, _, _ = ref(xt, ct)

        variables = import_msg_state_dict(ref.state_dict())
        _, model = _ours("pretrain_pointnet2_part_seg_msg")
        out = model.apply(variables, jnp.asarray(x), jnp.asarray(cls),
                          train=False)
        np.testing.assert_allclose(np.asarray(out.seg_logits),
                                   lr.numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(out.feat), fr.permute(0, 2, 1).numpy(), atol=5e-5)
        for ours, theirs in zip(out.hidden, (l1r, l2r, l3r)):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.permute(0, 2, 1).numpy(),
                atol=5e-5)

    @pytest.mark.parametrize("extra_layers", [False, True])
    def test_flagship_embedding(self, data, monkeypatch, extra_layers):
        """Flagship MSG model incl. the embedding tower: the reference's
        working embedding path is ``include_convex_loss=True``, so the
        oracle fakes ``convex_loss`` and captures the ``feat_embed``
        argument it receives."""
        x, cls = data
        xt = torch.tensor(x).permute(0, 2, 1)
        ct = torch.tensor(cls)
        captured = {}

        def fake_convex(xyz, chamfer_points, feat_embed, **kw):
            captured["feat_embed"] = feat_embed.detach().clone()
            return (torch.zeros(1), torch.zeros(1), [], [])

        monkeypatch.setattr(ref_msg, "convex_loss", fake_convex)
        ref = ref_msg.get_model(num_parts=PARTS,
                                extra_layers=extra_layers)
        _warm_bn(ref, xt, ct, include_convex_loss=True, chamfer_points=xt)
        with torch.no_grad():
            (lr, _, fr, _, _, _, _, fer) = ref(
                xt, ct, include_convex_loss=True, chamfer_points=xt)

        variables = import_msg_state_dict(ref.state_dict())
        _, model = _ours("pointnet2_part_seg_msg",
                         extra_layers=extra_layers)
        out = model.apply(variables, jnp.asarray(x), jnp.asarray(cls),
                          train=False, embed=True)
        np.testing.assert_allclose(np.asarray(out.seg_logits),
                                   lr.numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(out.feat), fr.permute(0, 2, 1).numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(out.embedding),
            captured["feat_embed"].permute(0, 2, 1).numpy(), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(out.embedding), fer.permute(0, 2, 1).numpy(),
            atol=5e-5)


class TestTrainingTrajectory:
    def test_sgd_three_steps(self, data):
        """3 SGD steps of supervised NLL: per-step losses and the
        resulting eval forwards must track the reference (train-mode BN
        stats, BN momentum schedule arg, gradient flow through the whole
        encoder)."""
        x, cls = data
        rng = np.random.default_rng(7)
        target = rng.integers(0, PARTS, size=(B, N))
        xt = torch.tensor(x).permute(0, 2, 1)
        ct = torch.tensor(cls)
        tt = torch.tensor(target, dtype=torch.long)

        ref = ref_pre.get_model(num_parts=PARTS)
        ref.drop1.p = 0.0
        ref.train()
        opt = torch.optim.SGD(ref.parameters(), lr=0.01)
        ref_losses = []
        for _ in range(3):
            opt.zero_grad()
            logp, _, _, _, _ = ref(xt, ct)      # [B, N, PARTS] log-probs
            loss = torch.nn.functional.nll_loss(
                logp.reshape(-1, PARTS), tt.reshape(-1))
            loss.backward()
            opt.step()
            ref_losses.append(float(loss))
        ref.eval()
        with torch.no_grad():
            lr_final, _, _, _, _ = ref(xt, ct)

        mod, model = _ours("pretrain_pointnet2_part_seg_msg",
                           dropout_rate=0.0)
        # start from the SAME init: re-import the torch init would be
        # stale (ref already trained) — export isn't needed, we rebuild a
        # fresh torch model with the same seed instead
        torch.manual_seed(0)
        ref0 = ref_pre.get_model(num_parts=PARTS)
        variables = import_msg_state_dict(ref0.state_dict())
        params, stats = variables["params"], variables["batch_stats"]
        xj, cj = jnp.asarray(x), jnp.asarray(cls)
        tj = jnp.asarray(target)

        def loss_fn(p, s):
            out, mut = model.apply(
                {"params": p, "batch_stats": s}, xj, cj, train=True,
                mutable=["batch_stats"])
            return mod.get_loss(out.seg_logits, tj), mut["batch_stats"]

        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        our_losses = []
        for _ in range(3):
            (loss, stats), grads = step(params, stats)
            params = jax.tree.map(lambda p, g: p - 0.01 * g, params,
                                  grads)
            our_losses.append(float(loss))
        out = model.apply({"params": params, "batch_stats": stats},
                          xj, cj, train=False)

        # step-1 loss is computed from identical weights — tight bound
        # proves forward+loss parity; later steps amplify f32
        # reduction-order noise through BN batch stats (measured drift
        # ~1e-3 relative by step 3), so the trajectory bound is looser
        # but still catches any real gradient defect (those are O(1))
        np.testing.assert_allclose(our_losses[0], ref_losses[0],
                                   rtol=1e-4)
        np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(out.seg_logits),
                                   lr_final.numpy(), atol=0.1)


class TestCheckpointInterop:
    def test_pth_roundtrip(self, data, tmp_path):
        """Reference training-checkpoint wrapper -> our variables; and
        export -> import is exact."""
        ref = ref_pre.get_model(num_parts=PARTS)
        path = tmp_path / "model_000.pth"
        torch.save({"epoch": 7, "train_acc": 0.5,
                    "model_state_dict": ref.state_dict(),
                    "optimizer_state_dict": {}}, path)
        variables, meta = load_torch_checkpoint(str(path))
        assert meta["epoch"] == 7
        direct = import_msg_state_dict(ref.state_dict())
        for a, b in zip(jax.tree.leaves(variables),
                        jax.tree.leaves(direct)):
            np.testing.assert_array_equal(a, b)

        sd = export_msg_state_dict(variables)
        again = import_msg_state_dict(sd)
        for a, b in zip(jax.tree.leaves(variables),
                        jax.tree.leaves(again)):
            np.testing.assert_array_equal(a, b)

    def test_dataparallel_prefix_and_strict_keys(self):
        ref = ref_pre.get_model(num_parts=PARTS)
        sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
        import_msg_state_dict(sd)  # no raise
        sd["module.sa9.bogus"] = np.zeros(3)
        with pytest.raises(ValueError, match="unmapped"):
            import_msg_state_dict(sd)

    def test_structure_matches_init(self, data):
        """Imported tree == our init tree (paths and shapes), so apply()
        can't silently ignore ported weights."""
        x, cls = data
        ref = ref_msg.get_model(num_parts=PARTS)
        variables = import_msg_state_dict(ref.state_dict())
        _, model = _ours("pointnet2_part_seg_msg")
        init = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), jnp.asarray(cls),
                          train=False, embed=True)

        def paths(tree, pre=()):
            if isinstance(tree, dict):
                out = []
                for k, v in tree.items():
                    out += paths(v, pre + (k,))
                return out
            return [(pre, np.shape(np.asarray(tree)))]

        for col in ("params", "batch_stats"):
            ours = dict(paths(jax.tree.map(np.asarray, init[col])))
            ported = dict(paths(variables[col]))
            assert ours == ported, (
                sorted(set(ours) ^ set(ported))[:8])

"""Reference-checkpoint interop: torch state_dict <-> flax variables.

The reference trains and ships ``.pth`` checkpoints
(``train_partseg_shapenet.py:263-280`` resume format,
``testing.py:96-107`` ``--pretrained_model``).  This module maps the
reference ``pointnet2_part_seg_msg.get_model`` state_dict onto our flax
``get_model`` variables (and back), so a reference-trained model can be
evaluated here (``cli/testing.py --pretrained_model model.pth``) and our
full-model forward can be oracled against the reference's with identical
weights (tests/test_model_parity.py).

Layout facts this mapping encodes (all verified against
``/root/reference/models/pointnet_util.py``):

- MSG grouped features are ``concat([point_feats, xyz - center])``
  (features FIRST, ``pointnet_util.py:243``), so the first conv's
  ``[F, d_in + 3, 1, 1]`` weight splits into our GroupedFirstLayer's
  ``w_feat = W[:, :d_in].T`` and ``w_xyz = W[:, d_in:].T``; the
  conv bias becomes ``b_feat`` (our decomposition
  ``(W_f f + W_x x + b) - W_x c`` is the same affine map).
- group_all (sa3) concatenates ``[xyz, points]`` with no center
  subtraction (``pointnet_util.py:148-153``): plain transpose.
- FP input is ``concat([points1, interpolated])``
  (``pointnet_util.py:301-304``): plain transpose.
- torch Conv1d/Conv2d 1x1 weights ``[out, in, 1(,1)]`` transpose to our
  Dense/PointMLP ``[in, out]`` kernels; BatchNorm ``weight/bias/
  running_mean/running_var`` map to ``scale/bias`` params and
  ``mean/var`` batch_stats (same eps, same running semantics —
  ``nn/norm.py``).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- layout

# the flagship MSG architecture (models/pointnet2_part_seg_msg.py both
# here and in the reference)
_SA_CFG = (
    ("sa1", 3, [[32, 32, 64], [64, 64, 128], [64, 96, 128]]),
    ("sa2", 320, [[128, 128, 256], [128, 196, 256]]),
)
_FP_NAMES = ("fp3", "fp2", "fp1")


def _t(w):
    """torch conv weight [out, in, 1(,1)] or linear [out, in] -> [in, out]."""
    w = np.asarray(w, np.float32)
    return w.reshape(w.shape[0], w.shape[1]).T


def _entries(extra_layers=False):
    """Yield (torch_prefix, kind, flax_path) map rows.

    kinds: ``gfl`` (first grouped conv, split), ``mlp`` (conv+bn pair
    inside a PointMLP at index j), ``dense`` (1x1 conv -> Dense),
    ``bn`` (BatchNorm module).  flax_path is a tuple under params/ (the
    batch-stats halves are derived per kind).
    """
    rows = []
    for name, d_in, mlps in _SA_CFG:
        for i, mlp in enumerate(mlps):
            rows.append((f"{name}.conv_blocks.{i}.0",
                         f"{name}.bn_blocks.{i}.0",
                         "gfl", (name, f"GroupedFirstLayer_{i}"), d_in))
            for j in range(1, len(mlp)):
                rows.append((f"{name}.conv_blocks.{i}.{j}",
                             f"{name}.bn_blocks.{i}.{j}",
                             "mlp", (name, f"PointMLP_{i}"), j - 1))
    for j in range(3):  # sa3 group-all MLP [256, 512, 1024]
        rows.append((f"sa3.mlp_convs.{j}", f"sa3.mlp_bns.{j}",
                     "mlp", ("sa3", "PointMLP_0"), j))
    fp_mlps = {"fp3": 2, "fp2": 2, "fp1": 0 if extra_layers else 2}
    for name in _FP_NAMES:
        for j in range(fp_mlps[name]):
            rows.append((f"{name}.mlp_convs.{j}", f"{name}.mlp_bns.{j}",
                         "mlp", (name, "PointMLP_0"), j))
    # head + embedding projection (1x1 Conv1d -> Dense)
    for nm in ("conv1", "conv2", "extra_conv_emb"):
        rows.append((nm, None, "dense", (nm,), None))
    rows.append(("bn1", None, "bn", ("bn1",), None))
    if extra_layers:
        for nm in ("fp1_conv1", "fp1_conv1_bn1", "fp1_conv2",
                   "fp1_conv2_bn2", "fp1_embed_conv1", "fp1_embed_conv2",
                   "fp1_embed_conv2_bn2", "conv1_embed", "conv2_embed"):
            rows.append((nm, None, "dense", (nm,), None))
        for nm in ("conv1_embed_bn", "conv2_embed_bn"):
            rows.append((nm, None, "bn", (nm,), None))
    return rows


# ---------------------------------------------------------------- import

def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = np.asarray(value, np.float32)


def import_msg_state_dict(sd):
    """Reference MSG ``state_dict`` -> ``{"params", "batch_stats"}``.

    ``sd`` maps torch key -> array-like (torch tensors or numpy).  The
    ``module.`` DataParallel prefix and ``num_batches_tracked`` entries
    are handled; any other unconsumed model key raises (so silent
    architecture mismatches can't slip through).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                     else v)
          for k, v in sd.items()}
    extra = any(k.startswith("fp1_conv1.") for k in sd)
    params, stats = {}, {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    for conv, bn, kind, path, aux in _entries(extra):
        if kind == "gfl":
            w, b = take(f"{conv}.weight"), take(f"{conv}.bias")
            w2 = _t(w)                              # [d_in + 3, F]
            d_in = aux
            if d_in:
                _set(params, path + ("w_feat",), w2[:d_in])
                _set(params, path + ("w_xyz",), w2[d_in:])
                _set(params, path + ("b_feat",), b)
            else:
                _set(params, path + ("w_xyz",), w2)
                _set(params, path + ("bias",), b)
            _set(params, path + ("bn_scale",), take(f"{bn}.weight"))
            _set(params, path + ("bn_bias",), take(f"{bn}.bias"))
            _set(stats, path + ("bn_mean",), take(f"{bn}.running_mean"))
            _set(stats, path + ("bn_var",), take(f"{bn}.running_var"))
        elif kind == "mlp":
            j = aux
            _set(params, path + (f"w{j}",), _t(take(f"{conv}.weight")))
            _set(params, path + (f"b{j}",), take(f"{conv}.bias"))
            _set(params, path + (f"bn{j}_scale",), take(f"{bn}.weight"))
            _set(params, path + (f"bn{j}_bias",), take(f"{bn}.bias"))
            _set(stats, path + (f"bn{j}_mean",),
                 take(f"{bn}.running_mean"))
            _set(stats, path + (f"bn{j}_var",),
                 take(f"{bn}.running_var"))
        elif kind == "dense":
            _set(params, path + ("kernel",), _t(take(f"{conv}.weight")))
            _set(params, path + ("bias",), take(f"{conv}.bias"))
        elif kind == "bn":
            _set(params, path + ("scale",), take(f"{conv}.weight"))
            _set(params, path + ("bias",), take(f"{conv}.bias"))
            _set(stats, path + ("mean",), take(f"{conv}.running_mean"))
            _set(stats, path + ("var",), take(f"{conv}.running_var"))

    # fp1_embed_conv1_bn1 is DEFINED by the reference's extra_layers
    # branch but never used in its forward — the embedding tower shares
    # fp1_conv1_bn1 instead (models/pointnet2_part_seg_msg.py:53 vs
    # :106-108, the quirk our model replicates) — so its weights are
    # dead and dropped here.
    leftovers = [k for k in sd
                 if k not in used and not k.endswith("num_batches_tracked")
                 and not k.startswith(("atlasnet.",
                                       "fp1_embed_conv1_bn1."))]
    if leftovers:
        raise ValueError(
            "unmapped reference state_dict keys (architecture mismatch?): "
            f"{sorted(leftovers)[:8]}{'...' if len(leftovers) > 8 else ''}")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------- export

def _get(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree, np.float32)


def _tc(w2):
    """[in, out] kernel -> torch Conv1d weight [out, in, 1]."""
    return np.ascontiguousarray(w2.T)[:, :, None]


def export_msg_state_dict(variables, extra_layers=False):
    """Our flax variables -> a reference-format MSG ``state_dict``
    (numpy arrays; Conv1d-shaped ``[out, in, 1]`` weights — torch
    broadcasts Conv2d ``[out, in, 1, 1]`` loads from these are NOT
    automatic, so SA entries are emitted 4-D)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd = {}
    for conv, bn, kind, path, aux in _entries(extra_layers):
        if kind == "gfl":
            d_in = aux
            if d_in:
                w2 = np.concatenate([_get(params, path + ("w_feat",)),
                                     _get(params, path + ("w_xyz",))], 0)
                b = _get(params, path + ("b_feat",))
            else:
                w2 = _get(params, path + ("w_xyz",))
                b = _get(params, path + ("bias",))
            sd[f"{conv}.weight"] = _tc(w2)[:, :, :, None]
            sd[f"{conv}.bias"] = b
            sd[f"{bn}.weight"] = _get(params, path + ("bn_scale",))
            sd[f"{bn}.bias"] = _get(params, path + ("bn_bias",))
            sd[f"{bn}.running_mean"] = _get(stats, path + ("bn_mean",))
            sd[f"{bn}.running_var"] = _get(stats, path + ("bn_var",))
        elif kind == "mlp":
            j = aux
            w = _tc(_get(params, path + (f"w{j}",)))
            if conv.startswith(("sa1.", "sa2.", "sa3.")):
                w = w[:, :, :, None]                # Conv2d shape
            sd[f"{conv}.weight"] = w
            sd[f"{conv}.bias"] = _get(params, path + (f"b{j}",))
            sd[f"{bn}.weight"] = _get(params, path + (f"bn{j}_scale",))
            sd[f"{bn}.bias"] = _get(params, path + (f"bn{j}_bias",))
            sd[f"{bn}.running_mean"] = _get(stats,
                                            path + (f"bn{j}_mean",))
            sd[f"{bn}.running_var"] = _get(stats, path + (f"bn{j}_var",))
        elif kind == "dense":
            sd[f"{conv}.weight"] = _tc(_get(params, path + ("kernel",)))
            sd[f"{conv}.bias"] = _get(params, path + ("bias",))
        elif kind == "bn":
            sd[f"{conv}.weight"] = _get(params, path + ("scale",))
            sd[f"{conv}.bias"] = _get(params, path + ("bias",))
            sd[f"{conv}.running_mean"] = _get(stats, path + ("mean",))
            sd[f"{conv}.running_var"] = _get(stats, path + ("var",))
    return sd


# ------------------------------------------------------------ checkpoint

def load_torch_checkpoint(path):
    """Load a reference ``.pth`` checkpoint -> flax variable collections.

    Accepts both the raw state_dict and the reference's training
    checkpoint wrapper ``{epoch, ..., model_state_dict,
    optimizer_state_dict}`` (``train_partseg_shapenet.py:467-475``).
    Returns ``(variables, meta)`` where ``meta`` carries epoch/metrics
    if present.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(obj, dict) and "model_state_dict" in obj:
        meta = {k: v for k, v in obj.items()
                if k not in ("model_state_dict", "optimizer_state_dict")}
        obj = obj["model_state_dict"]
    return import_msg_state_dict(obj), meta

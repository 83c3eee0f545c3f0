"""Checkpointing with orbax (reference ``torch.save`` artifacts).

The reference saves ``{epoch, train_acc | losses, model_state_dict,
optimizer_state_dict}`` every epoch (``train_partseg_shapenet.py:467-475``)
and auto-resumes from ``checkpoints/best_model.pth`` (``:263-274``).  Same
artifact contents here, as an orbax pytree checkpoint per epoch plus a
``best_model`` alias directory.
"""

import os
import os.path as osp
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, name: str, *, epoch: int, state,
                    extra: dict | None = None) -> str:
    """Save a train state under ``directory/name``.

    Mirrors the reference artifact: epoch + metrics + model state +
    optimizer state.
    """
    path = osp.abspath(osp.join(directory, name))
    # opt_state holds optax namedtuples whose restored dict form
    # enumerates leaves in sorted-KEY order, not field order — store the
    # leaves under zero-padded INDEX keys so restore-by-unflatten is
    # immune to field naming
    opt_leaves = jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
    payload = {
        "epoch": np.asarray(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "selfsup_state": jax.device_get(state.selfsup_state),
        "opt_state": {f"{i:05d}": l for i, l in enumerate(opt_leaves)},
        "step": jax.device_get(state.step),
    }
    if extra:
        payload["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(directory: str, name: str, state) -> tuple[Any, int]:
    """Restore into an existing state skeleton; returns (state, epoch).

    Raises FileNotFoundError if the checkpoint doesn't exist (callers
    mirror the reference's try/except resume, ``train:263-274``).
    """
    restored = _raw_restore(directory, name)
    # rebuild optax state from the index-keyed leaves (see save_checkpoint)
    stored = restored["opt_state"]
    opt_leaves = [stored[k] for k in sorted(stored)]
    opt_state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state.opt_state), opt_leaves)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        selfsup_state=restored["selfsup_state"],
        opt_state=opt_state,
        step=restored["step"],
    )
    return new_state, int(restored["epoch"])


def _raw_restore(directory: str, name: str):
    path = osp.abspath(osp.join(directory, name))
    if not osp.exists(path):
        raise FileNotFoundError(path)
    return _checkpointer().restore(path)


def _merge_trees(fresh, restored, path=""):
    """Recursive right-biased merge: take ``restored`` where a key exists
    in both, keep the ``fresh`` init elsewhere.  Returns
    (merged, missing, matched) with ``missing`` the fresh-only paths
    (e.g. heads absent from a pretrain checkpoint) and ``matched`` the
    count of leaves taken from the checkpoint.  A matched leaf with a
    different shape raises — that is a wrong/incompatible checkpoint,
    not a missing head."""
    if not isinstance(fresh, dict):
        if restored is None:
            return fresh, [path], 0
        fs = getattr(fresh, "shape", None)
        rs = getattr(restored, "shape", None)
        if fs != rs:
            raise ValueError(
                f"warm-start shape mismatch at {path}: checkpoint {rs} "
                f"vs model {fs} (incompatible architecture/config)")
        return restored, [], 1
    merged, missing, matched = {}, [], 0
    for k, v in fresh.items():
        sub = restored.get(k) if isinstance(restored, dict) else None
        merged[k], miss, n = _merge_trees(v, sub, f"{path}/{k}")
        missing += miss
        matched += n
    return merged, missing, matched


def restore_params_only(directory: str, name: str, state):
    """Warm-start model weights from a pretrained checkpoint
    (``--pretrained_model``, reference ``train:276-280``): parameters and
    batch stats only, fresh optimizer.

    The reference's strict ``load_state_dict`` works because torch
    registers every declared submodule whether or not the pretrain
    forward ever calls it; flax only materializes called modules, so a
    pretrain checkpoint legitimately lacks finetune-only heads (e.g.
    ``extra_conv_emb`` when the pretrainer ran without the embedding
    head).  Equivalent semantics here: merge the checkpoint into the
    fresh init, keeping fresh params for subtrees the checkpoint lacks.

    A ``.pth`` name is a REFERENCE torch checkpoint (raw state_dict or
    the reference's ``{model_state_dict, ...}`` training wrapper,
    ``testing.py:96-107`` / ``train_partseg_shapenet.py:263-280``) and
    is imported via the weight-port shim (``train/torch_port.py``)."""
    if name.endswith(".pth"):
        from prifit_tpu.train.torch_port import load_torch_checkpoint

        restored, meta = load_torch_checkpoint(osp.join(directory, name))
        if meta:
            print(f"torch checkpoint metadata keys: {sorted(meta)}")
    else:
        restored = _raw_restore(directory, name)
    params, miss_p, n_p = _merge_trees(jax.device_get(state.params),
                                       restored["params"])
    stats, miss_s, _ = _merge_trees(jax.device_get(state.batch_stats),
                                    restored["batch_stats"])
    if n_p == 0:
        raise ValueError(
            f"warm-start: checkpoint {directory}/{name} matched ZERO "
            f"model parameters — wrong file or incompatible naming "
            f"(first missing: {miss_p[:3]})")
    for m in miss_p + miss_s:
        print(f"warm-start: keeping fresh init for {m} "
              f"(absent from checkpoint)")
    return state.replace(params=params, batch_stats=stats)


def latest_checkpoint(directory: str, prefix: str = "model_") -> str | None:
    """Name of the newest epoch checkpoint in a directory, or None."""
    if not osp.isdir(directory):
        return None
    names = [n for n in os.listdir(directory) if n.startswith(prefix)]
    return max(names) if names else None

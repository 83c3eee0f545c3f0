"""Point-axis (sequence-parallel) sharding for the O(N^2) fit pipeline.

The reference "scales" point count by subsampling (2048 of 5000,
``train_partseg_shapenet.py:441``) because its mean-shift kernel matrix is
O(N^2) (``src/mean_shift.py:65``).  SURVEY.md §5 identifies the point axis
as this codebase's sequence-length analog; this module is the TPU-native
scaling path for clouds too large for one chip's N^2: a 2-D
``(data, points)`` mesh where

  - mean-shift runs as a **ring**: every device holds an N/P slice of the
    seeds and streams the point chunks around the ring with
    ``lax.ppermute``, accumulating ``K @ X`` and the row sums — the
    ring-attention structure applied to the mean-shift kernel (each chunk
    of the [N, N] matrix is produced and consumed on-core, never stored);
  - membership weights stay sharded with their points;
  - the weighted ellipsoid fit becomes ``psum``-reduced moment
    accumulation (weight sums, centroids, covariances) + replicated 3x3
    eigh, with the slow-mode axis lengths via ``pmax``/``pmin``.

Semantics match ``clustering.mean_shift`` / ``geometry.fitting`` (same
kernels, guards and slot layout).  Two documented deviations, both
bandwidth-related: the quantile bandwidth is estimated from an
``all_gather`` of (up to) ``bandwidth_samples`` points in global order,
and there is no quantile-doubling retry — pick a quantile that fits the
slot budget (the DP path keeps the retry).  NMS runs replicated on the
gathered converged modes: O(N^2) again but on *modes*, which is the one
stage that inherently needs the global mode graph; the O(N^2 D iters)
mean-shift dominates at scale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from prifit_tpu.clustering.mean_shift import (
    ClusterResult,
    compute_bandwidth,
    membership,
    nms_fixed_slots,
)
from prifit_tpu.geometry.fitting import PrimitiveParams, eigh3_guarded
from prifit_tpu.utils.guard import guard_exp


def make_dp_sp_mesh(n_data: int, n_points: int, devices=None) -> Mesh:
    """2-D ``(data, points)`` mesh."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_points
    arr = np.asarray(devices[: n_data * n_points]).reshape(
        n_data, n_points)
    return Mesh(arr, ("data", "points"))


def _ring_mean_shift(x_local, bw, iterations, axis, axis_size,
                     kernel_type="gaussian"):
    """Ring-blocked fixed-iteration mean-shift.

    x_local: ``[B, n_loc, D]`` this device's point slice (unit norm).
    Returns converged modes for the local seeds, ``[B, n_loc, D]``.
    """
    b2 = bw ** 2                                             # [B]
    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def one_iteration(q, _):
        def ring_body(carry, _):
            acc, s, chunk = carry
            sim = jnp.einsum("bnd,bmd->bnm", q, chunk,
                             preferred_element_type=jnp.float32)
            dist = 2.0 - 2.0 * sim
            if kernel_type == "gaussian":
                K = guard_exp(-dist / b2[:, None, None] / 2.0)
            else:
                K = jax.nn.relu(0.75 * (1.0 - dist / b2[:, None, None]))
            acc = acc + jnp.einsum("bnm,bmd->bnd", K, chunk,
                                   preferred_element_type=jnp.float32)
            s = s + jnp.sum(K, axis=-1)
            chunk = jax.lax.ppermute(chunk, axis, perm)
            return (acc, s, chunk), None

        init = (jnp.zeros_like(q), jnp.zeros(q.shape[:2], jnp.float32),
                x_local)
        (acc, s, _), _ = jax.lax.scan(ring_body, init, None,
                                      length=axis_size)
        new = acc / s[..., None]
        new = new / jnp.linalg.norm(new, axis=-1, keepdims=True)
        return new, None

    out, _ = jax.lax.scan(one_iteration, x_local, None, length=iterations)
    return out


def _fit_one_slot_sharded(points_local, w_local, axis):
    """psum-reduced weighted ellipsoid fit of one cluster slot.

    points_local ``[n_loc, 3]``, w_local ``[n_loc]`` -> (r, V, center,
    valid), replicated (all moments are global psums).  Mirrors
    ``geometry.fitting.fit_ellipsoid_weighted``.
    """
    sum_w = jax.lax.psum(jnp.sum(w_local), axis)
    safe = jnp.maximum(sum_w, 1e-6)
    center = jax.lax.psum(
        jnp.sum(points_local * w_local[:, None], axis=0), axis) / safe
    centered = points_local - center
    cov = jax.lax.psum(
        jnp.matmul((centered * w_local[:, None]).T, centered,
                   preferred_element_type=jnp.float32), axis) / safe

    s, V = eigh3_guarded(cov)
    s_ng = jax.lax.stop_gradient(s)
    cond_ok = s_ng[0] / jnp.maximum(s_ng[2], 1e-30) <= 1e5
    valid = cond_ok & (sum_w > 1e-6)

    flip = jnp.where(jnp.linalg.det(V) < 0, -1.0, 1.0)
    V = V.at[:, 2].multiply(flip)
    transformed = jnp.matmul(centered * w_local[:, None], V,
                             preferred_element_type=jnp.float32)
    # global extrema via all_gather of the local ones (pmax/pmin have no
    # differentiation rule; all_gather's transpose is a scatter, so the
    # axis-length gradient reaches the argmax point like the DP path)
    loc = jnp.stack([jnp.max(transformed, axis=0),
                     -jnp.min(transformed, axis=0)])          # [2, 3]
    glob = jax.lax.all_gather(loc, axis)                      # [P, 2, 3]
    mx = jnp.max(glob[:, 0], axis=0)
    mn = -jnp.max(glob[:, 1], axis=0)
    r = (mx - mn) / 2.0
    return r, V, center, valid


def fit_ellipsoids_sharded(points_local, weights_local, slot_valid, axis):
    """Point-sharded batch fit: ``[B, n_loc, 3] x [B, n_loc, K] ->``
    replicated :class:`PrimitiveParams` (call inside ``shard_map``)."""
    def one_shape(p, w, sv):
        r, V, center, fv = jax.vmap(
            lambda wk: _fit_one_slot_sharded(p, wk, axis),
            in_axes=1)(w)
        valid = fv & sv
        m = valid[:, None]
        return PrimitiveParams(
            r=jnp.where(m, r, 1.0),
            V=jnp.where(m[..., None], V, jnp.eye(3)[None]),
            center=jnp.where(m, center, 0.0),
            valid=valid)

    return jax.vmap(one_shape)(points_local, weights_local, slot_valid)


def _cluster_local(x_local, *, quantile, iterations, max_num_clusters,
                   bandwidth_samples, axis, axis_size, kernel_type):
    """shard_map body: local slice in, sharded-weights ClusterResult out."""
    x_local = x_local / jnp.maximum(
        jnp.linalg.norm(x_local, axis=-1, keepdims=True), 1e-12)

    # bandwidth from a globally-ordered subsample (reference subsamples
    # too: num_samples in compute_bandwidth, src/mean_shift.py:148-151)
    n_loc = x_local.shape[1]
    m = min(max(bandwidth_samples // axis_size, 1), n_loc)
    sub = jax.lax.all_gather(x_local[:, :m], axis, axis=1, tiled=True)
    bw = jax.vmap(lambda s: compute_bandwidth(s, quantile))(sub)   # [B]

    modes_local = _ring_mean_shift(x_local, bw, iterations, axis,
                                   axis_size, kernel_type)
    modes = jax.lax.all_gather(modes_local, axis, axis=1, tiled=True)

    # NMS + center selection on the gathered modes (replicated compute)
    center_ids, valid, _ = jax.vmap(
        lambda mo, b: nms_fixed_slots(mo, b, max_num_clusters))(modes, bw)
    centers = jnp.take_along_axis(
        modes, center_ids[..., None], axis=1) * valid[..., None]

    sim = jnp.einsum("bkd,bnd->bkn", centers, modes_local,
                     preferred_element_type=jnp.float32)
    sim = jnp.where(valid[..., None], sim, -1e9)
    labels_local = jnp.argmax(sim, axis=1).astype(jnp.int32)

    weights_local = jax.vmap(
        lambda c, v, x, b: membership(c, v, x, b).T)(
        centers, valid, x_local, bw)

    return ClusterResult(
        centers=centers, valid=valid, labels=labels_local,
        weights=weights_local, bandwidth=bw,
        num_clusters=jnp.sum(valid, axis=1).astype(jnp.int32))


def analytic_chamfer_sharded(params: PrimitiveParams, samples, sample_w,
                             target_local, axis, cuboid: bool = False,
                             data_axis: str | None = None):
    """Point-sharded analytic chamfer (call inside ``shard_map``).

    Mirrors ``geometry.losses.analytic_chamfer`` with the TARGET cloud
    sharded over ``axis``: the SDF side reduces local sums with ``psum``;
    the NN side takes per-device minima over the local targets and
    all-gathers them (differentiable, unlike ``pmin``).  Primitive
    samples are replicated — there are only K*n_per_prim of them.

    Args:
        params: replicated ``[B, K, ...]``; samples ``[B, S, 3]``;
        sample_w ``[B, S]``; target_local ``[B, m_loc, 3]``.
    """
    from prifit_tpu.geometry.sdf import sdf_primitives

    def one(p, s, w, t_loc):
        sdf = sdf_primitives(t_loc, p.r, p.V, p.center, cuboid)  # [m, K]
        asdf = jnp.where(p.valid[None, :], jnp.abs(sdf), jnp.inf)
        d_ts_sum = jax.lax.psum(jnp.sum(jnp.min(asdf, axis=1) ** 2), axis)
        m_total = jax.lax.psum(t_loc.shape[0], axis)

        # local NN distances of every (replicated) sample to the local
        # target slice, then a differentiable global min via all_gather
        diff = s[:, None, :] - t_loc[None, :, :]
        d_local = jnp.min(jnp.sum(diff ** 2, axis=-1), axis=1)   # [S]
        d_all = jax.lax.all_gather(d_local, axis)                # [P, S]
        d_st = jnp.min(d_all, axis=0)

        w_sum = jnp.maximum(jnp.sum(w), 1e-12)
        mean_st = jnp.sum(d_st * w) / w_sum
        has = jnp.any(p.valid)
        mean_ts = jnp.where(has, d_ts_sum / m_total, 0.0)
        return jnp.where(has, (mean_st + mean_ts) / 2.0, 0.0), has

    dists, has = jax.vmap(one)(params, samples, sample_w, target_local)
    num = jnp.sum(dists)
    den = jnp.sum(has)
    if data_axis is not None:
        # global batch mean when the batch axis is sharded too
        num = jax.lax.psum(num, data_axis)
        den = jax.lax.psum(den, data_axis)
    return num / jnp.maximum(den, 1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "quantile", "iterations", "max_num_clusters",
                     "bandwidth_samples", "kernel_type", "fit"))
def cluster_and_fit_point_sharded(
        X: jax.Array, points: jax.Array, *, mesh: Mesh,
        quantile: float = 0.05, iterations: int = 5,
        max_num_clusters: int = 25, bandwidth_samples: int = 1 << 30,
        kernel_type: str = "gaussian", fit: bool = True):
    """Cluster (and optionally fit) with the point axis sharded.

    Args:
        X: ``[B, N, D]`` embeddings; points: ``[B, N, 3]``.  B must divide
            ``mesh.shape['data']`` evenly and N ``mesh.shape['points']``.
        bandwidth_samples: cap on the gathered bandwidth subsample
            (default: all points — exact parity with the DP path).
    Returns:
        ``(ClusterResult, PrimitiveParams | None)`` — weights/labels
        sharded over points, everything else replicated.
    """
    axis_size = mesh.shape["points"]

    def body(x_local, p_local):
        res = _cluster_local(
            x_local, quantile=quantile, iterations=iterations,
            max_num_clusters=max_num_clusters,
            bandwidth_samples=bandwidth_samples, axis="points",
            axis_size=axis_size, kernel_type=kernel_type)
        if fit:
            params = fit_ellipsoids_sharded(p_local, res.weights,
                                            res.valid, "points")
        else:
            params = None
        return res, params

    out_cluster = ClusterResult(
        centers=P("data"), valid=P("data"),
        labels=P("data", "points"), weights=P("data", "points"),
        bandwidth=P("data"), num_clusters=P("data"))
    out_params = PrimitiveParams(
        r=P("data"), V=P("data"), center=P("data"),
        valid=P("data")) if fit else None

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "points"), P("data", "points")),
        out_specs=(out_cluster, out_params),
        check_vma=False,
    )(X, points)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "quantile", "iterations", "max_num_clusters",
                     "n_per_prim", "bandwidth_samples", "cuboid"))
def convex_fit_loss_point_sharded(
        X: jax.Array, points: jax.Array, target: jax.Array, *, mesh: Mesh,
        quantile: float = 0.05, iterations: int = 5,
        max_num_clusters: int = 25, n_per_prim: int = 64,
        bandwidth_samples: int = 1 << 30, cuboid: bool = False):
    """Full self-sup fit loss with the point axis sharded: ring mean-shift
    -> psum fit -> (replicated) primitive sampling -> sharded analytic
    chamfer.  The sequence-parallel equivalent of
    ``geometry.convex_loss`` minus the optional entropy/intersection
    terms; the scalar loss is slot-permutation invariant, so it equals
    the unsharded pipeline's value.

    Args:
        X ``[B, N, D]`` embeddings; points ``[B, N, 3]`` fit targets;
        target ``[B, M, 3]`` chamfer cloud (sharded over its M axis).
    Returns:
        ``(loss [], PrimitiveParams)``.
    """
    from prifit_tpu.geometry.sampling import sample_primitives_batch

    axis_size = mesh.shape["points"]

    def body(x_loc, p_loc, t_loc):
        res = _cluster_local(
            x_loc, quantile=quantile, iterations=iterations,
            max_num_clusters=max_num_clusters,
            bandwidth_samples=bandwidth_samples, axis="points",
            axis_size=axis_size, kernel_type="gaussian")
        params = fit_ellipsoids_sharded(p_loc, res.weights, res.valid,
                                        "points")
        samples, w = sample_primitives_batch(
            params, n_per_prim=n_per_prim, cuboid=cuboid)
        loss = analytic_chamfer_sharded(params, samples, w, t_loc,
                                        "points", cuboid,
                                        data_axis="data")
        return loss, params

    out_params = PrimitiveParams(r=P("data"), V=P("data"),
                                 center=P("data"), valid=P("data"))
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "points"), P("data", "points"),
                  P("data", "points")),
        out_specs=(P(), out_params),
        check_vma=False,
    )(X, points, target)

"""Differentiable mean-shift clustering on the unit hypersphere, TPU-native.

Rebuilds the reference subsystem (``src/mean_shift.py``,
``src/ellipsoid_utils.py:9-73``) with static shapes and zero host syncs:

- the per-shape Python loop becomes ``vmap`` over the batch;
- the fixed-iteration update loop becomes ``lax.scan`` (differentiable,
  rematerialized backward);
- NMS's ``np.unique`` host round-trip (``src/mean_shift.py:175``) becomes
  on-device scatter/segment ops with a fixed number of output slots
  ``K = max_num_clusters`` plus a validity mask;
- the unbounded quantile-doubling retry (``src/ellipsoid_utils.py:19-27``)
  becomes a static set of bandwidth candidates (quantile, 2*quantile, ...)
  evaluated in parallel, selecting the first whose cluster count fits —
  same semantics, compiler-friendly control flow.

Math parity (against ``src/mean_shift.py``):
  bandwidth  = mean over points of sqrt(K-th-NN squared chordal distance),
               K = int(quantile * num_samples)                  (:138-160)
  update     = new_X += (K @ X) / sum(K) - new_X; renormalize    (:50-84)
               K = exp(-(2 - 2 <new_X, X>) / b^2 / 2)  [gaussian]
  NMS        = nearest-converged-mode assignment -> per-mode counts ->
               mode-graph (dist < b) -> representative = neighbor with the
               biggest count -> unique representatives            (:162-202)
  membership = column-normalized von-Mises kernel exp(<c,x>/b^2 - max)
               with the max detached                              (:230-247)
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from prifit_tpu.utils.guard import guard_exp, guard_sqrt


class ClusterResult(NamedTuple):
    """Static-shape clustering output for one shape (or a batch of shapes).

    Replaces the reference's ragged ``(centers[K_b, D], labels[N])`` per
    shape with fixed ``K = max_num_clusters`` slots.
    """
    centers: jax.Array     # [K, D] cluster centers (zero-padded)
    valid: jax.Array       # [K] bool, slot holds a real cluster
    labels: jax.Array      # [N] int32, hard assignment into slots [0, K)
    weights: jax.Array     # [N, K] soft membership (von-Mises), invalid=0
    bandwidth: jax.Array   # [] selected bandwidth
    num_clusters: jax.Array  # [] int32, number of valid slots


def _chordal_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """2 - 2 <a, b> for unit vectors == squared chordal distance."""
    return 2.0 - 2.0 * jnp.matmul(a, b.T, preferred_element_type=jnp.float32)


def compute_bandwidth(X: jax.Array, quantile: float,
                      num_samples: int | None = None) -> jax.Array:
    """Quantile-K-th-NN bandwidth (reference ``src/mean_shift.py:138-160``).

    The reference subsamples ``num_samples`` rows; its default (5000)
    exceeds N=2048 so in practice all points are used, which is what we do
    (subsampling would need an rng and buys nothing at these sizes).

    Args:
        X: ``[N, D]`` unit-norm embeddings.
        quantile: fraction of N giving the NN rank K.
    Returns:
        scalar bandwidth.
    """
    X = jax.lax.stop_gradient(X)  # no-grad in the reference (:29-31)
    N = X.shape[0]
    n = min(num_samples or N, N)
    K = max(int(quantile * n), 1)
    # subsample to n points like the reference (deterministic first-n
    # instead of its random choice) so the rank matches the quantile OF n
    Xs = X[:n]
    dist = _chordal_sqdist(Xs, Xs)
    kth = _kth_smallest_bisect(dist, [K])[0]
    return jnp.mean(guard_sqrt(kth, 1e-6))


def _kth_smallest_bisect(dist: jax.Array, Ks, iters: int = 24) -> jax.Array:
    """Per-row K-th smallest values by bisection counting.

    ``top_k`` over 2048 lanes costs ~40 ms/batch on a v5e for K~200;
    counting bisection on the value axis is numerically exact after 24
    halvings of the [0, 4] chordal range (< 1e-7 relative) and 3x faster
    (all candidates share each counting pass over the distance matrix).

    Args:
        dist: ``[N, M]`` squared chordal distances (values in [0, 4]).
        Ks: static list of C ranks.
    Returns:
        ``[C, N]`` K-th smallest value per row per rank.
    """
    N = dist.shape[0]
    ks = jnp.asarray(Ks)[:, None]                       # [C, 1]
    lo = jnp.zeros((len(Ks), N), jnp.float32)
    hi = jnp.full((len(Ks), N), 4.0, jnp.float32)

    def body(carry, _):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        # count_{c,n} = #{m : d[n, m] <= mid[c, n]}
        cnt = jnp.sum(dist[None] <= mid[:, :, None], axis=-1)
        ge = cnt >= ks
        return (jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=iters)
    return hi


def _bandwidth_candidates(X: jax.Array, quantile: float,
                          num_candidates: int,
                          use_pallas: bool = True) -> jax.Array:
    """Bandwidths for quantile, 2q, 4q, ... from one shared counting pass.

    No-grad like the reference (``mean_shift.py:29-31`` wraps
    ``compute_bandwidth`` in ``torch.no_grad``).  ``use_pallas=False``
    forces the jnp bisection (needed inside ``lax.cond`` retry branches,
    which reverse-mode linearizes).
    """
    X = jax.lax.stop_gradient(X)
    N, D = X.shape
    Ks = [max(min(int(quantile * (2 ** c) * N), N), 1)
          for c in range(num_candidates)]
    if use_pallas and jax.default_backend() == "tpu":
        from prifit_tpu.ops.pallas.bandwidth import (
            kth_nn_distance_pallas,
            supports_bandwidth_pallas,
        )

        if supports_bandwidth_pallas(N, D):
            kths = kth_nn_distance_pallas(X, tuple(Ks))          # [C, N]
            return jnp.mean(guard_sqrt(kths, 1e-6), axis=1)
    dist = _chordal_sqdist(X, X)
    kths = _kth_smallest_bisect(dist, Ks)                        # [C, N]
    return jnp.mean(guard_sqrt(kths, 1e-6), axis=1)              # [C]


def mean_shift_iterations(X: jax.Array, bandwidth: jax.Array,
                          iterations: int,
                          kernel_type: str = "gaussian",
                          use_pallas: bool | None = None) -> jax.Array:
    """Fixed-iteration differentiable mean-shift updates.

    Reference ``src/mean_shift.py:50-84``: every point is a seed; gaussian
    kernel on chordal distance; each step moves seeds to the kernel-weighted
    mean and renormalizes onto the unit sphere.

    Args:
        X: ``[N, D]`` unit-norm embeddings (gradient flows through).
        bandwidth: scalar.
        iterations: static iteration count.
    Returns:
        ``[N, D]`` converged modes (unit norm).
    """
    b2 = bandwidth ** 2

    N, D_ = X.shape
    if use_pallas is None:
        use_pallas = True
    if use_pallas and kernel_type == "gaussian" \
            and jax.default_backend() == "tpu":
        from prifit_tpu.ops.pallas.mean_shift import (
            mean_shift_step_pallas,
            supports_pallas,
        )

        if supports_pallas(N, D_):
            # fused flash-style kernel: no [N, N] HBM traffic in either
            # direction; custom VJP with the same tiled structure.
            # (Folding the renormalization into the kernel epilogue was
            # tried and measured SLOWER — fwd+grad 16.8 -> 18.0 ms at
            # the bench shapes — XLA fuses these elementwise passes with
            # the scan residual traffic better than the kernel prologue
            # can.)
            def pallas_step(new_X, _):
                m = mean_shift_step_pallas(new_X, X, b2)
                m = m / jnp.linalg.norm(m, axis=1, keepdims=True)
                return m, None

            out, _ = jax.lax.scan(pallas_step, X, None, length=iterations)
            return out

    # remat: without this the backward pass stores every iteration's [N, N]
    # kernel matrix (iters x B x candidates x N x N blew 32 GB HBM on a
    # B=24, N=2048 run); recomputing them per backward step is cheap
    # relative to the matmuls themselves.
    @jax.checkpoint
    def step(new_X, _):
        dist = _chordal_sqdist(new_X, X)
        if kernel_type == "gaussian":
            K = guard_exp(-dist / b2 / 2.0)
        elif kernel_type == "epanechnikov":
            K = jax.nn.relu(0.75 * (1.0 - dist / b2))
        else:
            raise ValueError(f"unknown kernel {kernel_type}")
        D = 1.0 / jnp.sum(K, axis=1, keepdims=True)
        new_X = jnp.matmul(K, X, preferred_element_type=jnp.float32) * D
        new_X = new_X / jnp.linalg.norm(new_X, axis=1, keepdims=True)
        return new_X, None

    out, _ = jax.lax.scan(step, X, None, length=iterations)
    return out


def mean_shift_eff_iterations(X: jax.Array, seeds: jax.Array,
                              bandwidth: jax.Array, iterations: int,
                              kernel_type: str = "gaussian") -> jax.Array:
    """Seeded mean-shift updates (reference ``mean_shift_eff_``,
    ``src/mean_shift.py:86-118``): only the given seed rows are iterated
    against the full point set, halving the kernel-matrix work when
    seeds = N/2.

    Reference quirks reproduced exactly: the gaussian branch uses the
    *similarity* kernel ``exp(<s, x> / b^2)`` (not the chordal-distance
    kernel of ``mean_shift_``), and the update REPLACES the seed with the
    kernel-weighted mean instead of adding the shift to it (same fixed
    point, different trajectory).  The reference's entry points never
    enable ``eff=True`` (``mean_shift`` is always called with the
    default, ``src/ellipsoid_utils.py:20``), so this is surface parity +
    an optional speed knob, not a default path.

    Args:
        X: ``[N, D]`` unit-norm embeddings.
        seeds: ``[M, D]`` initial seed rows (the reference samples a
            random half of X).
        bandwidth: scalar.
    Returns:
        ``[M, D]`` converged seed modes (unit norm).
    """
    b2 = bandwidth ** 2

    @jax.checkpoint
    def step(s, _):
        if kernel_type == "gaussian":
            sim = jnp.matmul(s, X.T, preferred_element_type=jnp.float32)
            K = guard_exp(sim / b2)
        elif kernel_type == "epanechnikov":
            dist = _chordal_sqdist(s, X)
            K = jax.nn.relu(0.75 * (1.0 - dist / b2))
        else:
            raise ValueError(f"unknown kernel {kernel_type}")
        D = 1.0 / jnp.sum(K, axis=1, keepdims=True)
        s = jnp.matmul(K, X, preferred_element_type=jnp.float32) * D
        return s / jnp.linalg.norm(s, axis=1, keepdims=True), None

    out, _ = jax.lax.scan(step, seeds, None, length=iterations)
    return out


def _nms_tail(counts, is_center, used, N, K):
    """Slot selection from the three NMS reductions (shared by the jnp
    and Pallas paths; all inputs are [N] vectors — negligible work)."""
    n_selected = jnp.sum(is_center).astype(jnp.int32)
    n_distinct = jnp.sum(used & is_center).astype(jnp.int32)
    # rank candidates: keep the K largest elected counts, then order the
    # kept ones by ascending mode id (matches np.unique order when <= K)
    elected_count = jnp.where(is_center, counts, -1.0)
    _, keep_ids = jax.lax.top_k(elected_count, K)          # by count desc
    keep_valid = jnp.take(is_center, keep_ids) & (
        jnp.arange(K) < jnp.minimum(n_selected, K))
    # ascending id order among kept slots; invalid slots pushed to the end
    sort_key = jnp.where(keep_valid, keep_ids, N + 1)
    order = jnp.argsort(sort_key)
    center_ids = jnp.take(keep_ids, order)
    valid = jnp.take(keep_valid, order)
    center_ids = jnp.where(valid, center_ids, 0)
    return center_ids.astype(jnp.int32), valid, n_distinct


def nms_fixed_slots(modes: jax.Array, bandwidth: jax.Array,
                    max_num_clusters: int,
                    use_pallas: bool | None = None):
    """Non-max suppression of converged modes into fixed cluster slots.

    Reference semantics (``src/mean_shift.py:162-202``) with the host-side
    ``np.unique`` replaced by on-device scatters:

      1. assign each point to its nearest mode (chordal argmin);
      2. count members per mode;
      3. modes closer than ``bandwidth`` (NOT squared — reference quirk,
         ``mean_shift.py:191``) are neighbors; each occupied mode elects
         the neighbor with the largest member count as its representative;
      4. the distinct representatives are the surviving cluster centers.

    Slot order: surviving mode ids ascending (== np.unique order).  If more
    than ``max_num_clusters`` survive, the K with the largest elected-count
    are kept (the reference instead re-runs everything with a doubled
    quantile; the candidate loop in :func:`cluster_single` reproduces that,
    this truncation is only the last-resort fallback).

    Returns:
        center_ids: [K] int32 indices into modes (padded with 0)
        valid:      [K] bool
        n_distinct: [] int32 — number of distinct labels over the
                    untruncated center set (the reference's
                    ``torch.unique(cluster_ids).shape[0]`` retry count).
    """
    N = modes.shape[0]
    K = max_num_clusters

    if use_pallas is None:
        use_pallas = True
    if use_pallas and jax.default_backend() == "tpu":
        from prifit_tpu.ops.pallas.nms import (
            nms_passes_pallas,
            supports_nms_pallas,
        )

        if supports_nms_pallas(N, modes.shape[1]):
            # the three distance-dependent reductions recompute their
            # distance tiles in VMEM — no [N, N] matrix in HBM (the jnp
            # path below writes it once and reads it three times)
            counts, is_center, used = nms_passes_pallas(
                jax.lax.stop_gradient(modes), bandwidth)
            return _nms_tail(counts, is_center, used, N, K)

    # All reductions run on the LANE axis of the (bitwise-symmetric)
    # distance matrix, and the three scatters of the natural formulation
    # (count add, center max, used set) are [N, N] compare-reduces against
    # an iota — XLA's TPU scatter lowering serializes; the dense compares
    # are one VPU pass each (measured: nms 4.1 -> ~1 ms at N=2048).
    dist_mm = _chordal_sqdist(modes, modes)               # [N, N]
    iota = jnp.arange(N)
    assign = jnp.argmin(dist_mm, axis=-1)                 # nearest mode
    # counts[j] = #{i : assign[i] == j}
    counts = jnp.sum((assign[:, None] == iota[None, :]).astype(jnp.float32),
                     axis=0)
    occupied = counts > 0

    nbrs = (dist_mm < bandwidth).astype(jnp.float32)
    # representative of mode i: neighbor j maximizing member count
    rep = jnp.argmax(nbrs * counts[None, :], axis=1)      # [N]
    # distinct representatives elected by occupied modes
    is_center = jnp.any((rep[:, None] == iota[None, :]) &
                        occupied[:, None], axis=0)

    # the reference's retry condition counts DISTINCT LABELS over the full
    # (untruncated) center set: labels = nearest selected center per mode
    # (src/mean_shift.py:200-201, src/ellipsoid_utils.py:23)
    dist_masked = jnp.where(is_center[None, :], dist_mm, jnp.inf)
    label_full = jnp.argmin(dist_masked, axis=-1)         # [N] mode ids
    used = jnp.any(label_full[:, None] == iota[None, :], axis=0)
    return _nms_tail(counts, is_center, used, N, K)


def membership(centers: jax.Array, valid: jax.Array, X: jax.Array,
               bandwidth: jax.Array) -> jax.Array:
    """Soft von-Mises membership of each point to each cluster slot.

    Reference ``src/mean_shift.py:230-247``: similarity / b^2, global max
    subtracted through a detached path (deliberately not per-column — the
    gradient must flow through the un-detached kernel), exp, normalize over
    clusters.  Invalid slots contribute zero mass.

    Returns:
        ``[K, N]`` membership (columns sum to 1 over valid slots).
    """
    sim = jnp.matmul(centers, X.T,
                     preferred_element_type=jnp.float32) / (bandwidth ** 2)
    big_neg = jnp.float32(-1e9)
    sim = jnp.where(valid[:, None], sim, big_neg)
    sim = sim - jax.lax.stop_gradient(jnp.max(sim))
    kernel = guard_exp(sim) * valid[:, None]
    denom = jnp.sum(kernel, axis=0, keepdims=True)
    return kernel / jnp.maximum(denom, 1e-12)


@partial(jax.jit,
         static_argnames=("quantile", "iterations", "max_num_clusters",
                          "num_candidates", "kernel_type", "hard_weights"))
def cluster_single(X: jax.Array, *, quantile: float = 0.01,
                   iterations: int = 5, max_num_clusters: int = 25,
                   num_candidates: int = 2,
                   kernel_type: str = "gaussian",
                   hard_weights: bool = False) -> ClusterResult:
    """Cluster one shape's embeddings into fixed slots.

    Equivalent of ``guard_mean_shift`` + ``clustering`` for one batch
    element (``src/ellipsoid_utils.py:9-73``).  ``num_candidates``
    bandwidths (quantile doubling each time) are evaluated in parallel and
    the first with ``<= max_num_clusters`` distinct clusters wins —
    mirroring the reference's retry loop with static control flow.

    Args:
        X: ``[N, D]`` embeddings; normalized to unit norm here (the
           reference normalizes in convex_loss before clustering).
        hard_weights: one-hot weights from the hard labels (the reference's
           ``visualize`` branch, ``ellipsoid_utils.py:48-54``).
    Returns:
        :class:`ClusterResult` with ``weights [N, K]``.
    """
    X = X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    bws = _bandwidth_candidates(X, quantile, num_candidates)   # [C]

    def run_candidate(bw):
        modes = mean_shift_iterations(X, bw, iterations, kernel_type)
        center_ids, valid, n_distinct = nms_fixed_slots(
            modes, bw, max_num_clusters)
        centers = jnp.take(modes, center_ids, axis=0) * valid[:, None]
        # final labels: nearest kept center per converged mode — the
        # reference computes argmax of centers @ modes^T
        # (mean_shift.py:200-201; nms is called with X = new_X)
        sim = jnp.matmul(centers, modes.T, preferred_element_type=jnp.float32)
        sim = jnp.where(valid[:, None], sim, -1e9)
        labels = jnp.argmax(sim, axis=0).astype(jnp.int32)
        return centers, valid, labels, n_distinct

    centers_c, valid_c, labels_c, n_sel_c = jax.vmap(run_candidate)(bws)

    fits = n_sel_c <= max_num_clusters                        # [C]
    # first fitting candidate, else the last one (truncated fallback)
    idx = jnp.argmax(fits)
    sel = jnp.where(jnp.any(fits), idx, num_candidates - 1)

    centers = centers_c[sel]
    valid = valid_c[sel]
    labels = labels_c[sel]
    bw = bws[sel]

    weights_kn = membership(centers, valid, X, bw)            # [K, N]
    if hard_weights:
        # reference visualize branch one-hots the MEMBERSHIP argmax of
        # the original embedding (ellipsoid_utils.py:48-54), not the
        # mode-nearest labels
        cluster_ids = jnp.argmax(weights_kn, axis=0)
        hard = jax.nn.one_hot(cluster_ids, max_num_clusters,
                              dtype=weights_kn.dtype)
        weights = hard * valid[None, :]
    else:
        weights = weights_kn.T                                # [N, K]
    return ClusterResult(centers=centers, valid=valid, labels=labels,
                         weights=weights, bandwidth=bw,
                         num_clusters=jnp.sum(valid).astype(jnp.int32))


def cluster_batch(X: jax.Array, *, quantile: float = 0.01,
                  iterations: int = 5, max_num_clusters: int = 25,
                  num_candidates: int = 2,
                  kernel_type: str = "gaussian",
                  hard_weights: bool = False) -> ClusterResult:
    """Batched clustering with LAZY bandwidth-candidate evaluation.

    Replaces the reference's per-shape Python loop
    (``src/ellipsoid_utils.py:43``).  Semantics match
    ``vmap(cluster_single)``: per shape, the first quantile-doubling
    candidate with <= max_num_clusters distinct clusters wins (last one as
    fallback).  Unlike :func:`cluster_single` — which evaluates every
    candidate — the retry candidates only run when some shape in the batch
    actually overflows (a batch-level ``lax.cond``; with the recipe's
    quantile the retry almost never fires, saving ~half the mean-shift
    work).
    """
    Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=2, keepdims=True), 1e-12)
    # Only the FIRST candidate's bandwidth is needed unless some shape
    # overflows; the retry bandwidths are computed lazily inside the retry
    # cond below (halves the kth-NN counting work in the common no-retry
    # path).  quantile * 2 is a power-of-2 scale (exact in fp), so the
    # lazily-computed Ks match cluster_single's eager int(q * 2^c * N).
    bws0 = jax.vmap(
        lambda x: _bandwidth_candidates(x, quantile, 1))(Xn)[:, 0]  # [B]

    def run_candidate(x, bw, use_pallas=None):
        modes = mean_shift_iterations(x, bw, iterations, kernel_type,
                                      use_pallas=use_pallas)
        center_ids, valid, n_distinct = nms_fixed_slots(
            modes, bw, max_num_clusters, use_pallas=use_pallas)
        centers = jnp.take(modes, center_ids, axis=0) * valid[:, None]
        sim = jnp.matmul(centers, modes.T,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(valid[:, None], sim, -1e9)
        labels = jnp.argmax(sim, axis=0).astype(jnp.int32)
        return centers, valid, labels, n_distinct, bw

    run_batch = jax.vmap(run_candidate)
    sel = run_batch(Xn, bws0)

    if num_candidates > 1:
        B = X.shape[0]
        overflow = sel[3] > max_num_clusters                   # [B]
        need_retry = jnp.any(overflow)

        # the retry branch must avoid the Pallas custom_vjp: reverse-mode
        # through lax.cond linearizes both branches and custom_vjp has no
        # JVP rule; the rare retry path uses the jnp mean-shift instead
        run_chunk_jnp = jax.vmap(
            lambda x, bw: run_candidate(x, bw, use_pallas=False))

        # PER-SHAPE retry (VERDICT r2 item 8): instead of re-running the
        # whole batch through the slower jnp mean-shift when ANY shape
        # overflows (a measured 1.75x cliff), sort the offenders to the
        # front and scan fixed-size chunks of them; chunks whose shapes
        # all fit take the cheap cond branch, so retry cost scales with
        # the offender count.  Chunk size divides B exactly (no padding
        # -> no duplicate scatter indices).
        R = max((d for d in range(1, min(4, B) + 1) if B % d == 0))
        n_chunks = B // R
        # stable ascending argsort of fits (overflow -> 0): offenders
        # first, original order preserved otherwise
        perm = jnp.argsort((~overflow).astype(jnp.int32),
                           stable=True)                        # [B]

        def retry_chunks(prev):
            def chunk_body(out, i):
                idx = jax.lax.dynamic_slice(perm, (i * R,), (R,))
                write = overflow[idx]                          # [R]

                def do(out):
                    x_c = Xn[idx]
                    # retry bandwidths, computed only when the cond fires
                    # (jnp path: the linearized branch must not contain
                    # the Pallas kernel)
                    bw_rest = jax.vmap(lambda x: _bandwidth_candidates(
                        x, quantile * 2.0, num_candidates - 1,
                        use_pallas=False))(x_c)            # [R, C-1]
                    old = jax.tree_util.tree_map(
                        lambda a: a[idx], out)
                    new, taken = old, ~write
                    for c in range(1, num_candidates):
                        cand = run_chunk_jnp(x_c, bw_rest[:, c - 1])
                        is_last = c == num_candidates - 1
                        fits = cand[3] <= max_num_clusters
                        use = (~taken) & (fits | is_last)
                        new = jax.tree_util.tree_map(
                            lambda n_, o_: jnp.where(
                                use.reshape((-1,) + (1,) *
                                            (n_.ndim - 1)), n_, o_),
                            cand, new)
                        taken = taken | use
                    return jax.tree_util.tree_map(
                        lambda a, n_: a.at[idx].set(n_), out, new)

                out = jax.lax.cond(jnp.any(write), do, lambda o: o, out)
                return out, None

            out, _ = jax.lax.scan(chunk_body, prev,
                                  jnp.arange(n_chunks))
            return out

        sel = jax.lax.cond(need_retry, retry_chunks, lambda p: p, sel)

    centers, valid, labels, n_distinct, bw = sel

    def finish(c, v, x, b, l):
        w_kn = membership(c, v, x, b)
        if hard_weights:
            cluster_ids = jnp.argmax(w_kn, axis=0)
            hard = jax.nn.one_hot(cluster_ids, max_num_clusters,
                                  dtype=w_kn.dtype)
            return hard * v[None, :]
        return w_kn.T

    weights = jax.vmap(finish)(centers, valid, Xn, bw, labels)
    return ClusterResult(centers=centers, valid=valid, labels=labels,
                         weights=weights, bandwidth=bw,
                         num_clusters=jnp.sum(valid, axis=1).astype(
                             jnp.int32))

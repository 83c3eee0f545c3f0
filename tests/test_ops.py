"""Golden-value tests for the geometric ops against tiny numpy oracles.

The oracles re-state the reference algorithms (models/pointnet_util.py,
src/dgcnn.py) in plain numpy so correctness is checked against intended
behavior, not against our own implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prifit_tpu.ops import (
    square_distance,
    knn_with_dilation,
    index_points,
    farthest_point_sample,
    query_ball_point,
    three_nn_interpolate,
    chamfer_distance,
    nn_squared_distance,
)


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def test_square_distance(rng):
    src = rng.normal(size=(2, 7, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 5, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = np_square_distance(src, dst)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_index_points(rng):
    pts = rng.normal(size=(3, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(3, 6)).astype(np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(3)])
    np.testing.assert_allclose(got, want)

    # 3-D index (grouping)
    idx2 = rng.integers(0, 10, size=(3, 6, 5)).astype(np.int32)
    got2 = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx2)))
    want2 = np.stack([pts[b][idx2[b]] for b in range(3)])
    np.testing.assert_allclose(got2, want2)


def np_fps(xyz, npoint, start):
    """Oracle for models/pointnet_util.py:63-84 with fixed start."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    dist = np.full((B, N), 1e10)
    far = np.asarray(start)
    for i in range(npoint):
        out[:, i] = far
        c = xyz[np.arange(B), far][:, None, :]
        d = ((xyz - c) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        far = dist.argmax(-1)
    return out


def test_farthest_point_sample_matches_oracle(rng):
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    got = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 16, deterministic=True))
    want = np_fps(xyz, 16, np.zeros(2, dtype=np.int64))
    np.testing.assert_array_equal(got, want)


def test_farthest_point_sample_spreads_points(rng):
    # FPS of 4 points from 2 well-separated clusters must hit both clusters
    a = rng.normal(size=(32, 3)) * 0.01
    b = rng.normal(size=(32, 3)) * 0.01 + 10.0
    xyz = np.concatenate([a, b])[None].astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 4,
                                           deterministic=True))[0]
    assert (idx < 32).any() and (idx >= 32).any()


def np_query_ball(radius, nsample, xyz, new_xyz):
    """Oracle for models/pointnet_util.py:87-107."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    d = np_square_distance(new_xyz, xyz)
    gidx = np.broadcast_to(np.arange(N), (B, S, N)).copy()
    gidx[d > radius ** 2] = N
    gidx = np.sort(gidx, axis=-1)[:, :, :nsample]
    first = gidx[:, :, :1]
    mask = gidx == N
    gidx = np.where(mask, np.broadcast_to(first, gidx.shape), gidx)
    return gidx


def test_query_ball_point(rng):
    xyz = rng.uniform(size=(2, 50, 3)).astype(np.float32)
    centers = xyz[:, :8]
    got = np.asarray(query_ball_point(0.3, 12, jnp.asarray(xyz),
                                      jnp.asarray(centers)))
    want = np_query_ball(0.3, 12, xyz, centers)
    np.testing.assert_array_equal(got, want)


def test_three_nn_interpolate(rng):
    dst = rng.normal(size=(2, 20, 3)).astype(np.float32)
    src = rng.normal(size=(2, 6, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 6, 4)).astype(np.float32)
    got = np.asarray(three_nn_interpolate(
        jnp.asarray(dst), jnp.asarray(src), jnp.asarray(feats)))

    d = np_square_distance(dst, src)
    idx = np.argsort(d, axis=-1)[:, :, :3]
    dd = np.take_along_axis(d, idx, axis=-1)
    w = 1.0 / (dd + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bnk,bnkc->bnc",
                     w, np.stack([feats[b][idx[b]] for b in range(2)]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_three_nn_interpolate_single_source(rng):
    dst = rng.normal(size=(2, 20, 3)).astype(np.float32)
    src = rng.normal(size=(2, 1, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 1, 4)).astype(np.float32)
    got = np.asarray(three_nn_interpolate(
        jnp.asarray(dst), jnp.asarray(src), jnp.asarray(feats)))
    want = np.broadcast_to(feats, (2, 20, 4))
    np.testing.assert_allclose(got, want)


def test_knn_with_dilation(rng):
    x = rng.normal(size=(1, 30, 3)).astype(np.float32)
    idx = np.asarray(knn_with_dilation(jnp.asarray(x), k1=4, k2=8))
    d = np_square_distance(x, x)[0]
    order = np.argsort(d, axis=-1)
    want = order[:, np.arange(0, 8, 2)]
    np.testing.assert_array_equal(idx[0], want)


def test_chamfer_distance_zero_for_identical(rng):
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    cd = float(chamfer_distance(jnp.asarray(x), jnp.asarray(x)))
    assert cd == pytest.approx(0.0, abs=1e-6)


def test_chamfer_distance_matches_dense_oracle(rng):
    a = rng.normal(size=(2, 16, 3)).astype(np.float32)
    b = rng.normal(size=(2, 24, 3)).astype(np.float32)
    got = float(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    d = np_square_distance(a, b)
    want = (d.min(1).mean(-1) + d.min(2).mean(-1)).mean() / 2.0
    assert got == pytest.approx(float(want), rel=1e-4)


def test_nn_squared_distance_mask(rng):
    src = np.array([[0.0, 0, 0]], dtype=np.float32)
    dst = np.array([[0.1, 0, 0], [5.0, 0, 0]], dtype=np.float32)
    mask = jnp.asarray([False, True])
    d = float(nn_squared_distance(jnp.asarray(src), jnp.asarray(dst),
                                  dst_mask=mask)[0])
    assert d == pytest.approx(25.0, rel=1e-5)


def test_chamfer_gradient_flows(rng):
    a = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    g = jax.grad(lambda p: chamfer_distance(p, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_min_k_cpu_fallback_exact(rng):
    """Off-TPU min_k/min_k_packed must be the exact top_k path."""
    from prifit_tpu.ops.pairwise import min_k, min_k_packed

    d = rng.random((3, 17, 256)).astype(np.float32)
    nv, ei = jax.lax.top_k(-jnp.asarray(d), 32)
    for fn in (min_k, min_k_packed):
        v, i = fn(jnp.asarray(d), 32)
        np.testing.assert_array_equal(np.asarray(v), -np.asarray(nv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))


def test_min_k_packed_encoding_numpy_model():
    """Numpy model of the TPU mantissa-packing: quantized-distance order
    with ascending-index tie-break, decode recovers index and quantized
    value (ops/pairwise.py::min_k_packed)."""
    rng = np.random.default_rng(0)
    N, k, bits = 2048, 128, 11
    mask = (1 << bits) - 1
    d = (rng.random(N).astype(np.float32) * 4.0)
    d[100:110] = 0.0                      # exact-zero ties
    d[200:210] = d[300]                   # duplicated values
    di = d.view(np.int32)
    packed = ((di & ~np.int32(mask)) | np.arange(N, dtype=np.int32)) \
        + np.int32(1 << 23)
    pf = packed.view(np.float32)
    assert np.all(pf > 0)                 # exponent bump: no denormals
    # float order == int order for positive floats
    order_f = np.argsort(pf, kind="stable")
    order_i = np.argsort(packed, kind="stable")
    np.testing.assert_array_equal(order_f, order_i)
    sel = np.sort(pf)[:k]
    vi = sel.view(np.int32) - np.int32(1 << 23)
    idx = vi & mask
    vals = (vi & ~np.int32(mask)).view(np.float32)
    # decoded values are the quantized distances of the decoded indices
    np.testing.assert_array_equal(
        vals, (d[idx].view(np.int32) & ~np.int32(mask)).view(np.float32))
    # selection contains the true k smallest up to quantization ties
    kth = np.sort(d)[k - 1]
    assert np.all(d[idx] <= kth * (1 + 2.0 ** (bits - 23)) + 1e-12)
    # zero-distance ties come out in ascending index order
    zeros = idx[vals == 0.0]
    np.testing.assert_array_equal(zeros, np.sort(zeros))

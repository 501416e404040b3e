"""Point-op parity vs straightforward numpy/torch oracles.

Oracles are written from the published PointNet++/Point-Transformer semantics
(sequential FPS, ball query keeping smallest-index in-radius points, 3-NN
inverse-distance interpolation) — independent implementations, used to pin
down behavior the on-device lax versions must reproduce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple3dformer_tpu.ops import pointops


def fps_oracle(xyz, npoint, start):
    """Sequential farthest point sampling, one batch element."""
    N = xyz.shape[0]
    dist = np.full(N, 1e10)
    far = start
    out = []
    for _ in range(npoint):
        out.append(far)
        d = np.sum((xyz - xyz[far]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return np.array(out)


def test_square_distance(rng):
    src = rng.randn(2, 37, 3).astype(np.float32)
    dst = rng.randn(2, 19, 3).astype(np.float32)
    ref = np.sum((src[:, :, None] - dst[:, None]) ** 2, axis=-1)
    out = np.asarray(pointops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    out_exact = np.asarray(
        pointops.square_distance(jnp.asarray(src), jnp.asarray(dst), exact=True)
    )
    np.testing.assert_allclose(out_exact, ref, rtol=1e-6, atol=1e-6)


def test_index_points(rng):
    pts = rng.randn(2, 50, 4).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 7, 3))
    out = np.asarray(pointops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b][idx[b]])


def test_fps_matches_sequential_oracle(rng):
    xyz = rng.randn(3, 64, 3).astype(np.float32)
    idx = np.asarray(pointops.farthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(3):
        ref = fps_oracle(xyz[b], 16, start=0)
        np.testing.assert_array_equal(idx[b], ref)


def test_fps_random_start_uses_key(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    i1 = np.asarray(
        pointops.farthest_point_sample(jnp.asarray(xyz), 8, key=jax.random.key(0))
    )
    i2 = np.asarray(
        pointops.farthest_point_sample(jnp.asarray(xyz), 8, key=jax.random.key(1))
    )
    assert not np.array_equal(i1, i2)  # different starts -> different samples


def test_knn_values(rng):
    """kNN indices may tie-break differently; gathered distances must match."""
    q = rng.randn(2, 10, 3).astype(np.float32)
    p = rng.randn(2, 40, 3).astype(np.float32)
    idx = np.asarray(pointops.knn_indices(jnp.asarray(q), jnp.asarray(p), 5))
    d = np.sum((q[:, :, None] - p[:, None]) ** 2, axis=-1)
    ref_sorted = np.sort(d, axis=-1)[:, :, :5]
    got = np.take_along_axis(d, idx, axis=-1)
    got = np.sort(got, axis=-1)
    np.testing.assert_allclose(got, ref_sorted, rtol=1e-3, atol=1e-4)


def test_query_ball_point_semantics(rng):
    """Smallest-index in-radius points, padded with the first hit."""
    xyz = rng.rand(2, 30, 3).astype(np.float32)
    new_xyz = xyz[:, :5]
    r, k = 0.4, 8
    out = np.asarray(
        pointops.query_ball_point(r, k, jnp.asarray(xyz), jnp.asarray(new_xyz))
    )
    d = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, axis=-1)
    for b in range(2):
        for s in range(5):
            in_r = np.where(d[b, s] <= r ** 2)[0]
            expect = list(in_r[:k])
            if len(expect) < k:
                expect = expect + [expect[0]] * (k - len(expect))
            np.testing.assert_array_equal(out[b, s], expect)


def test_three_nn_interpolate(rng):
    xyz1 = rng.randn(2, 24, 3).astype(np.float32)
    xyz2 = rng.randn(2, 9, 3).astype(np.float32)
    feats = rng.randn(2, 9, 6).astype(np.float32)
    out = np.asarray(
        pointops.three_nn_interpolate(
            jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(feats)
        )
    )
    d = np.sum((xyz1[:, :, None] - xyz2[:, None]) ** 2, axis=-1)
    order = np.argsort(d, axis=-1)[:, :, :3]
    dsort = np.take_along_axis(d, order, axis=-1)
    recip = 1.0 / (dsort + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    ref = np.zeros_like(out)
    for b in range(2):
        ref[b] = (feats[b][order[b]] * w[b][..., None]).sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    # S == 1 tiles the single feature
    one = np.asarray(
        pointops.three_nn_interpolate(
            jnp.asarray(xyz1), jnp.asarray(xyz2[:, :1]), jnp.asarray(feats[:, :1])
        )
    )
    np.testing.assert_allclose(one, np.broadcast_to(feats[:, :1], one.shape))


def test_sample_and_group_shapes(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 8).astype(np.float32)
    new_xyz, new_points = pointops.sample_and_group(
        16, 0.0, 4, jnp.asarray(xyz), jnp.asarray(feats), knn=True
    )
    assert new_xyz.shape == (2, 16, 3)
    assert new_points.shape == (2, 16, 4, 11)
    # grouped xyz is centered: nearest neighbor of a sampled point is itself
    np.testing.assert_allclose(np.asarray(new_points[:, :, 0, :3]), 0.0, atol=1e-5)


def test_pc_normalize(rng):
    pc = rng.randn(50, 3).astype(np.float32) * 3 + 1
    out = np.asarray(pointops.pc_normalize(jnp.asarray(pc)))
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-6)
    assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-5

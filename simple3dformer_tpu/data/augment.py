"""Point-cloud batch augmentations.

Host (numpy) versions mirror /root/reference/provider.py semantics exactly
(random conventions included: per-sample uniform angles/scales, dropped points
replaced by the sample's first point, jitter clipping). Device (jnp) versions
are the TPU-first path: vectorized over the batch, driven by a per-step
jax.random key, and fused into the jitted train step so augmentation costs no
host round-trip (reference does it in numpy per batch, train_cls.py:109-113).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# numpy (host) versions — provider.py parity
# --------------------------------------------------------------------------


def normalize_data(batch: np.ndarray) -> np.ndarray:
    """Center each cloud and scale to the unit sphere (provider.py:3-19)."""
    out = np.zeros_like(batch)
    for b in range(batch.shape[0]):
        pc = batch[b]
        pc = pc - np.mean(pc, axis=0)
        m = np.max(np.sqrt(np.sum(pc ** 2, axis=1)))
        out[b] = pc / m
    return out


def shuffle_data(data: np.ndarray, labels: np.ndarray, rng=np.random):
    idx = np.arange(len(labels))
    rng.shuffle(idx)
    return data[idx], labels[idx], idx


def shuffle_points(batch: np.ndarray, rng=np.random) -> np.ndarray:
    idx = np.arange(batch.shape[1])
    rng.shuffle(idx)
    return batch[:, idx, :]


def _roty(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rotz(angle: float) -> np.ndarray:
    # reference layout (provider.py:79-81): [[c, s, 0], [-s, c, 0], [0, 0, 1]]
    # — applied as points @ R, this rotates by -angle; distributionally
    # identical for angle ~ U[0, 2pi) but kept exact for parity.
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def rotate_point_cloud(batch: np.ndarray, rng=np.random) -> np.ndarray:
    """Random rotation about the (up) Y axis, per sample (provider.py:46-63)."""
    out = np.zeros_like(batch)
    for b in range(batch.shape[0]):
        R = _roty(rng.uniform() * 2 * np.pi)
        out[b] = batch[b].reshape(-1, 3) @ R
    return out


def rotate_point_cloud_z(batch: np.ndarray, rng=np.random) -> np.ndarray:
    out = np.zeros_like(batch)
    for b in range(batch.shape[0]):
        R = _rotz(rng.uniform() * 2 * np.pi)
        out[b] = batch[b].reshape(-1, 3) @ R
    return out


def rotate_point_cloud_with_normal(batch: np.ndarray, rng=np.random) -> np.ndarray:
    """xyz + normal channels both rotated (provider.py:65-85)."""
    out = np.zeros_like(batch)
    for b in range(batch.shape[0]):
        R = _roty(rng.uniform() * 2 * np.pi)
        out[b, :, 0:3] = batch[b, :, 0:3] @ R
        out[b, :, 3:6] = batch[b, :, 3:6] @ R
    return out


def rotate_point_cloud_by_angle(batch: np.ndarray, angle: float) -> np.ndarray:
    out = np.zeros_like(batch)
    R = _roty(angle)
    for b in range(batch.shape[0]):
        out[b] = batch[b].reshape(-1, 3) @ R
    return out


def rotate_perturbation_point_cloud(
    batch: np.ndarray, angle_sigma=0.06, angle_clip=0.18, rng=np.random
) -> np.ndarray:
    """Small random rotations about all three axes (provider.py:176-198)."""
    out = np.zeros_like(batch)
    for b in range(batch.shape[0]):
        a = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
        Rx = np.array([[1, 0, 0],
                       [0, np.cos(a[0]), -np.sin(a[0])],
                       [0, np.sin(a[0]), np.cos(a[0])]])
        Ry = np.array([[np.cos(a[1]), 0, np.sin(a[1])],
                       [0, 1, 0],
                       [-np.sin(a[1]), 0, np.cos(a[1])]])
        Rz = np.array([[np.cos(a[2]), -np.sin(a[2]), 0],
                       [np.sin(a[2]), np.cos(a[2]), 0],
                       [0, 0, 1]])
        # reference applies pc @ (Rz Ry Rx) with NO transpose (provider.py:195-197)
        out[b] = batch[b].reshape(-1, 3) @ (Rz @ Ry @ Rx)
    return out


def jitter_point_cloud(batch, sigma=0.01, clip=0.05, rng=np.random):
    jitter = np.clip(sigma * rng.randn(*batch.shape), -clip, clip)
    return batch + jitter


def shift_point_cloud(batch, shift_range=0.1, rng=np.random):
    B = batch.shape[0]
    shifts = rng.uniform(-shift_range, shift_range, (B, 3))
    return batch + shifts[:, None, :]


def random_scale_point_cloud(batch, scale_low=0.8, scale_high=1.25, rng=np.random):
    B = batch.shape[0]
    scales = rng.uniform(scale_low, scale_high, B)
    return batch * scales[:, None, None]


def random_point_dropout(batch, max_dropout_ratio=0.875, rng=np.random):
    """Per sample: drop a random fraction of points, replacing them with the
    first point (provider.py:241-250)."""
    out = batch.copy()
    for b in range(batch.shape[0]):
        ratio = rng.random() * max_dropout_ratio
        drop = np.where(rng.random(batch.shape[1]) <= ratio)[0]
        if len(drop) > 0:
            out[b, drop, :] = out[b, 0, :]
    return out


# --------------------------------------------------------------------------
# jnp (device) versions — fused into the jitted train step
# --------------------------------------------------------------------------


def device_random_point_dropout(key, batch, max_dropout_ratio=0.875):
    kr, kd = jax.random.split(key)
    B, N = batch.shape[:2]
    ratio = jax.random.uniform(kr, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(kd, (B, N)) <= ratio
    first = batch[:, :1, :]
    return jnp.where(drop[..., None], first, batch)


def device_random_scale(key, xyz, scale_low=0.8, scale_high=1.25):
    B = xyz.shape[0]
    scales = jax.random.uniform(key, (B, 1, 1), minval=scale_low, maxval=scale_high)
    return xyz * scales


def device_shift(key, xyz, shift_range=0.1):
    B = xyz.shape[0]
    shifts = jax.random.uniform(
        key, (B, 1, 3), minval=-shift_range, maxval=shift_range
    )
    return xyz + shifts


def device_jitter(key, xyz, sigma=0.01, clip=0.05):
    noise = jnp.clip(sigma * jax.random.normal(key, xyz.shape), -clip, clip)
    return xyz + noise


def device_rotate_y(key, xyz):
    B = xyz.shape[0]
    ang = jax.random.uniform(key, (B,)) * 2 * jnp.pi
    c, s = jnp.cos(ang), jnp.sin(ang)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(B, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", xyz, R)


def device_cls_augment(key, points):
    """The train_cls.py recipe (dropout, scale xyz, shift xyz) on device.

    points [B, N, C>=3]; only xyz channels are scaled/shifted, mirroring
    provider usage at /root/reference/train_cls.py:110-112.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    points = device_random_point_dropout(k1, points)
    xyz = points[..., :3]
    xyz = device_random_scale(k2, xyz)
    xyz = device_shift(k3, xyz)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)

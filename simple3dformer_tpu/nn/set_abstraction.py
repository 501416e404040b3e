"""PointNet++-style set abstraction & feature propagation as flax modules.

Reference: /root/reference/data/pointnet_util.py:191-420. The shared "Conv2d
1x1 + BatchNorm + ReLU" MLPs are Dense layers over the channel axis here
(identical math; a 1x1 conv over [B,C,K,S] is a matmul over C), which XLA maps
straight onto the MXU with the [B*S*K, C] activation layout.

BatchNorm notes: torch BatchNorm momentum 0.1 == flax momentum 0.9; stats are
per-replica by default, mirroring the reference DDP's broadcast_buffers=False
(/root/reference/train_cls_voxel.py:158). The ``axis_name`` field plumbs
cross-replica stat syncing for shard_map/pmap execution contexts (under plain
jit+NamedSharding the compiler computes global batch stats already, since the
batch axis is a sharded dimension of one logical array).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointops
from .layers import dense


class BNReLUDense(nn.Module):
    """Dense -> BatchNorm -> ReLU (the reference's conv/bn/relu trio)."""

    features: int
    momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = dense(self.features, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="bn",
        )(x)
        return nn.relu(x)


class PosEmbedMLP(nn.Module):
    """Linear(3, d) -> ReLU -> Linear(d, d) relative-position encoder."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.features, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return dense(self.features, dtype=self.dtype, name="fc2")(x)


class PointNetSetAbstraction(nn.Module):
    """Sample+group then shared MLP + max-pool (pointnet_util.py:191-244)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    knn: bool = False
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, points, *, deterministic: bool = True):
        """xyz [B,N,3], points [B,N,D] -> new_xyz [B,S,3], feats [B,S,mlp[-1]]."""
        key = self.make_rng("sample") if self.has_rng("sample") else None
        if self.group_all:
            new_xyz, new_points = pointops.sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = pointops.sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                knn=self.knn, key=key,
            )
        # [B, S, K, C] -> MLP over C, max over K
        for i, width in enumerate(self.mlp):
            new_points = BNReLUDense(
                width, momentum=self.bn_momentum, axis_name=self.axis_name,
                dtype=self.dtype, name=f"mlp_{i}",
            )(new_points, deterministic=deterministic)
        return new_xyz, jnp.max(new_points, axis=2)


class PointNetSetAbstractionRelPos(nn.Module):
    """Set abstraction with per-layer relative-position MLPs
    (pointnet_util.py:246-303): each MLP layer adds pos_embed(new_xyz - knn_xyz)
    to its input before conv/bn/relu."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    knn: bool = False
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, points, *, deterministic: bool = True):
        key = self.make_rng("sample") if self.has_rng("sample") else None
        if self.group_all:
            new_xyz, new_points = pointops.sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = pointops.sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                knn=self.knn, key=key,
            )
        knn_idx = pointops.knn_indices(new_xyz, new_xyz, self.nsample)
        knn_xyz = pointops.index_points(new_xyz, knn_idx)  # [B,S,K,3]
        rel = new_xyz[:, :, None, :] - knn_xyz
        in_width = new_points.shape[-1]
        widths = [in_width] + list(self.mlp[:-1])
        for i, width in enumerate(self.mlp):
            pe = PosEmbedMLP(widths[i], dtype=self.dtype, name=f"pos_embed_{i}")(rel)
            new_points = BNReLUDense(
                width, momentum=self.bn_momentum, axis_name=self.axis_name,
                dtype=self.dtype, name=f"mlp_{i}",
            )(new_points + pe, deterministic=deterministic)
        return new_xyz, jnp.max(new_points, axis=2)


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale grouping variant (pointnet_util.py:308-366)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    knn: bool = False
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, points, *, deterministic: bool = True, seed_idx=None):
        key = self.make_rng("sample") if self.has_rng("sample") else None
        if seed_idx is None:
            seed_idx = pointops.farthest_point_sample(xyz, self.npoint, key=key)
        new_xyz = pointops.index_points(xyz, seed_idx)
        outs = []
        for i, radius in enumerate(self.radius_list):
            K = self.nsample_list[i]
            if self.knn:
                idx = pointops.knn_indices(new_xyz, xyz, K)
            else:
                idx = pointops.query_ball_point(radius, K, xyz, new_xyz)
            grouped_xyz = pointops.index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [pointops.index_points(points, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            for j, width in enumerate(self.mlp_list[i]):
                grouped = BNReLUDense(
                    width, momentum=self.bn_momentum, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"branch{i}_mlp{j}",
                )(grouped, deterministic=deterministic)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + pointwise MLP (pointnet_util.py:370-420).

    Channel-last convention: xyz1 [B,N,3], xyz2 [B,S,3], points1 [B,N,D1] or
    None, points2 [B,S,D2] -> [B,N,mlp[-1]] (or the concat width if mlp=[]).
    """

    mlp: Sequence[int] = ()
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, *, deterministic: bool = True):
        interpolated = pointops.three_nn_interpolate(xyz1, xyz2, points2)
        if points1 is not None:
            new_points = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            new_points = interpolated
        for i, width in enumerate(self.mlp):
            new_points = BNReLUDense(
                width, momentum=self.bn_momentum, axis_name=self.axis_name,
                dtype=self.dtype, name=f"mlp_{i}",
            )(new_points, deterministic=deterministic)
        return new_points

"""Hengshuang Point Transformer (cls + seg).

Reference: /root/reference/models/Hengshuang/model.py. Backbone: fc1 ->
VectorAttentionBlock, then nblocks x (TransitionDown -> VectorAttentionBlock)
halving points 4x and doubling channels each stage. Cls head mean-pools; Seg
is U-shaped with TransitionUps feeding 3-NN interpolation.

Config surface mirrors config/model/Hengshuang.yaml + config/cls.yaml:
num_point, input_dim, num_class, model.nblocks, model.nneighbor,
model.transformer_dim.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import MlpHead, dense
from ..nn.set_abstraction import PointNetFeaturePropagation, PointNetSetAbstraction
from ..nn.vector_attention import VectorAttentionBlock


class TransitionDown(nn.Module):
    """Set abstraction with kNN grouping (Hengshuang/model.py:7-13)."""

    k: int
    nneighbor: int
    channels: tuple  # (in, mid, out) — first entry is informational
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, points, *, deterministic: bool = True):
        sa = PointNetSetAbstraction(
            npoint=self.k,
            radius=0.0,
            nsample=self.nneighbor,
            mlp=list(self.channels[1:]),
            group_all=False,
            knn=True,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="sa",
        )
        return sa(xyz, points, deterministic=deterministic)


class LinearBNReLU(nn.Module):
    features: int
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = dense(self.features, dtype=self.dtype, name="fc")(x)
        x = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            name="bn",
        )(x)
        return nn.relu(x)


class TransitionUp(nn.Module):
    """Upsample coarse features onto the fine level and fuse
    (Hengshuang/model.py:16-46): feats1 = interp(fc1(coarse)); + fc2(fine)."""

    dim_out: int
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz1, points1, xyz2, points2, *, deterministic: bool = True):
        """xyz1/points1: coarse level; xyz2/points2: fine level (reference order)."""
        feats1 = LinearBNReLU(
            self.dim_out, self.bn_momentum, self.axis_name, self.dtype, name="fc1"
        )(points1, deterministic=deterministic)
        feats2 = LinearBNReLU(
            self.dim_out, self.bn_momentum, self.axis_name, self.dtype, name="fc2"
        )(points2, deterministic=deterministic)
        fp = PointNetFeaturePropagation(mlp=(), name="fp")
        up = fp(xyz2, xyz1, None, feats1, deterministic=deterministic)
        return up + feats2


class Backbone(nn.Module):
    num_point: int
    nblocks: int = 4
    nneighbor: int = 16
    input_dim: int = 3
    transformer_dim: int = 512
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x [B,N,input_dim] -> (points [B,N/4^nblocks,C], per-stage (xyz, feats))."""
        xyz = x[..., :3]
        h = dense(32, dtype=self.dtype, name="fc1_1")(x)
        h = nn.relu(h)
        h = dense(32, dtype=self.dtype, name="fc1_2")(h)
        points, _ = VectorAttentionBlock(
            d_model=self.transformer_dim, k=self.nneighbor, dtype=self.dtype,
            name="transformer1",
        )(xyz, h)

        xyz_and_feats = [(xyz, points)]
        for i in range(self.nblocks):
            channel = 32 * 2 ** (i + 1)
            xyz, points = TransitionDown(
                k=self.num_point // 4 ** (i + 1),
                nneighbor=self.nneighbor,
                channels=(channel // 2 + 3, channel, channel),
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"transition_downs_{i}",
            )(xyz, points, deterministic=deterministic)
            points, _ = VectorAttentionBlock(
                d_model=self.transformer_dim, k=self.nneighbor, dtype=self.dtype,
                name=f"transformers_{i}",
            )(xyz, points)
            xyz_and_feats.append((xyz, points))
        return points, xyz_and_feats


class PointTransformerCls(nn.Module):
    """Mean-pool + MLP head (Hengshuang/model.py:79-96)."""

    num_point: int
    num_class: int
    input_dim: int = 3
    nblocks: int = 4
    nneighbor: int = 16
    transformer_dim: int = 512
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @classmethod
    def from_config(cls, cfg, **kw):
        return cls(
            num_point=cfg.num_point,
            num_class=cfg.num_class,
            input_dim=cfg.input_dim,
            nblocks=cfg.model.nblocks,
            nneighbor=cfg.model.nneighbor,
            transformer_dim=cfg.model.transformer_dim,
            **kw,
        )

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        points, _ = Backbone(
            num_point=self.num_point,
            nblocks=self.nblocks,
            nneighbor=self.nneighbor,
            input_dim=self.input_dim,
            transformer_dim=self.transformer_dim,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic=deterministic)
        return MlpHead(widths=(256, 64), n_out=self.num_class, dtype=self.dtype,
                       name="fc2")(jnp.mean(points, axis=1))


class PointTransformerSeg(nn.Module):
    """U-shaped segmentation variant (Hengshuang/model.py:99-137)."""

    num_point: int
    num_class: int
    input_dim: int = 3
    nblocks: int = 4
    nneighbor: int = 16
    transformer_dim: int = 512
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    from_config = classmethod(PointTransformerCls.from_config.__func__)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        points, xyz_and_feats = Backbone(
            num_point=self.num_point,
            nblocks=self.nblocks,
            nneighbor=self.nneighbor,
            input_dim=self.input_dim,
            transformer_dim=self.transformer_dim,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic=deterministic)
        C = 32 * 2 ** self.nblocks
        xyz = xyz_and_feats[-1][0]
        h = MlpHead(widths=(512, 512), n_out=C, dtype=self.dtype, name="fc2")(points)
        points, _ = VectorAttentionBlock(
            d_model=self.transformer_dim, k=self.nneighbor, dtype=self.dtype,
            name="transformer2",
        )(xyz, h)

        for i in range(self.nblocks):
            channel = 32 * 2 ** (self.nblocks - i - 1)
            points = TransitionUp(
                dim_out=channel,
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"transition_ups_{i}",
            )(
                xyz, points,
                xyz_and_feats[-i - 2][0], xyz_and_feats[-i - 2][1],
                deterministic=deterministic,
            )
            xyz = xyz_and_feats[-i - 2][0]
            points, _ = VectorAttentionBlock(
                d_model=self.transformer_dim, k=self.nneighbor, dtype=self.dtype,
                name=f"up_transformers_{i}",
            )(xyz, points)
        return MlpHead(widths=(64, 64), n_out=self.num_class, dtype=self.dtype,
                       name="fc3")(points)

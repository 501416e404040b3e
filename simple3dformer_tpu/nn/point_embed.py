"""PCT-style neighbor-embedding point tokenizer.

Reference: /root/reference/models/3DViT/model.py:75-121 (Local_op, PointEmbed).
In the reference this module is constructed as the 3DViT patch_embed but is
dead in the forward pass (the models use fc1 + fc_pos_embed instead,
3DViT/model.py:227,303); it is provided here as a usable tokenizer since it is
part of the component inventory and useful in its own right: per-point MLP,
FPS + kNN grouping centered on the sampled point's feature, then a shared MLP
with max-pool over each neighborhood (Local_op).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import pointops
from .layers import dense


class ConvBNReLU1d(nn.Module):
    """1x1 Conv (Dense over channels) + BN + ReLU, bias-free like the reference."""

    features: int
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = dense(self.features, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=self.bn_momentum,
            axis_name=self.axis_name, name="bn",
        )(x)
        return nn.relu(x)


class LocalOp(nn.Module):
    """Shared 2-layer MLP + max over each kNN group (3DViT/model.py:75-94)."""

    out_channels: int
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # x: [B, S, K, D]
        x = ConvBNReLU1d(self.out_channels, self.bn_momentum, self.axis_name,
                         self.dtype, name="conv1")(x, deterministic=deterministic)
        x = ConvBNReLU1d(self.out_channels, self.bn_momentum, self.axis_name,
                         self.dtype, name="conv2")(x, deterministic=deterministic)
        return jnp.max(x, axis=2)  # [B, S, out]


class PointEmbed(nn.Module):
    """Per-point MLP -> sample_and_group (PCT centering) -> LocalOp."""

    embed_dim: int
    npoint: int = 1024
    nsample: int = 32
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x [B, N, C>=3] -> (new_xyz [B, S, 3], features [B, S, embed_dim//4])."""
        xyz = x[..., :3]
        h = ConvBNReLU1d(64, self.bn_momentum, self.axis_name, self.dtype,
                         name="conv1")(x, deterministic=deterministic)
        h = ConvBNReLU1d(64, self.bn_momentum, self.axis_name, self.dtype,
                         name="conv2")(h, deterministic=deterministic)
        key = self.make_rng("sample") if self.has_rng("sample") else None
        new_xyz, grouped = pointops.sample_and_group_with_center(
            min(self.npoint, x.shape[1]), self.nsample, xyz, h, key=key
        )
        feats = LocalOp(self.embed_dim // 4, self.bn_momentum, self.axis_name,
                        self.dtype, name="gather_local_0")(
            grouped, deterministic=deterministic
        )
        return new_xyz, feats

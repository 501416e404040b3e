"""Legacy voxel-to-image bridge models (V1 of the idea, kept for parity).

Reference: /root/reference/models/vit_3d_2d_pretrain.py:97-210
(FeatureVoxel_2DViT, FeatureVoxel_2DViT_2layerhead). The earliest experiment:
VoxNet-style 3D conv features -> FC to 196 -> reshape to a 14x14 "image" of 32
channels -> bilinear up-scaling decoder to a 224x224 3-channel image -> a
standard 2D ViT classifies the synthesized image. Superseded by the tokenizer
route (VoxelViT), but part of the reference's model inventory.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import dense
from ..nn.vit import TEACHER_BACKBONES, ViT2D
from ..nn.voxel_embed import _conv3d


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x2 (vit_3d_2d_pretrain.py:58-75)."""

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return x


class Up(nn.Module):
    """2x upsample then DoubleConv (vit_3d_2d_pretrain.py:78-95)."""

    out_channels: int
    bilinear: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, H, W, C = x.shape
        if self.bilinear:
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
            mid = C // 2
        else:
            x = nn.ConvTranspose(C, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name="deconv")(x)
            mid = None
        return DoubleConv(self.out_channels, mid_channels=mid, dtype=self.dtype,
                          name="conv")(x, deterministic=deterministic)


class FeatureVoxel2DViT(nn.Module):
    """VoxNet conv stack -> FC -> 14x14 map -> upsample to 224^2 RGB -> ViT."""

    n_classes: int = 10
    voxel_size: int = 32
    transformer_backbone: str = "deit_base_patch16_224"
    two_layer_head: bool = False  # FeatureVoxel_2DViT_2layerhead variant
    dtype: Optional[jnp.dtype] = None
    drop1: float = 0.2
    drop2: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x [B, V, V, V] -> [B, n_classes]."""
        assert x.shape[1] == self.voxel_size
        h = x[..., None]
        if self.voxel_size == 32:
            convs = [(32, 5, 2), (32, 3, 1)]
        elif self.voxel_size == 128:
            convs = [(8, 5, 2), (16, 3, 1), (32, 3, 1), (32, 3, 1)]
        else:
            raise ValueError("input_shape must be 32^3 or 128^3")
        # reference stack: first conv has no pool + dropout .2; every later
        # conv is followed by MaxPool3d(2) + dropout .3
        for i, (ch, k, s) in enumerate(convs):
            kern = self.param(
                f"conv3d_{i + 1}_kernel", nn.initializers.lecun_normal(),
                (k, k, k, h.shape[-1], ch),
            )
            bias = self.param(f"conv3d_{i + 1}_bias", nn.initializers.zeros, (ch,))
            h = nn.relu(_conv3d(h, kern, stride=s) + bias)
            if i > 0:
                h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2))
            h = nn.Dropout(self.drop1 if i == 0 else self.drop2)(
                h, deterministic=deterministic
            )
        B = h.shape[0]
        h = h.transpose(0, 4, 1, 2, 3).reshape(B, h.shape[-1], -1)  # [B, C, F]

        # feature connector: FC to 196 per channel + BatchNorm1d(32) + ReLU
        # (torch BN1d normalizes over the channel axis, here axis=1)
        h = dense(196, dtype=self.dtype, name="fc1")(h)
        h = nn.BatchNorm(use_running_average=deterministic, axis=1,
                         name="fc_bn")(h)
        h = nn.relu(h)
        h = h.reshape(B, h.shape[1], 14, 14).transpose(0, 2, 3, 1)  # [B,14,14,C]

        # up-scaling decoder 14 -> 224 with 3 output channels
        h = Up(16, bilinear=True, dtype=self.dtype, name="deconv1")(
            h, deterministic=deterministic)
        h = Up(8, bilinear=True, dtype=self.dtype, name="deconv2")(
            h, deterministic=deterministic)
        h = Up(4, bilinear=True, dtype=self.dtype, name="deconv3")(
            h, deterministic=deterministic)
        h = Up(3, bilinear=False, dtype=self.dtype, name="deconv4")(
            h, deterministic=deterministic)  # [B, 224, 224, 3]

        cfg = TEACHER_BACKBONES[self.transformer_backbone]
        vit = ViT2D(
            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"], patch_size=cfg["patch_size"],
            num_classes=1000, dtype=self.dtype, name="transformer",
        )
        feats = vit.encode(h, deterministic=deterministic)[:, 0]
        if self.two_layer_head:
            g = dense(256, dtype=self.dtype, name="head_fc1")(feats)
            g = nn.relu(g)
            g = nn.Dropout(0.3)(g, deterministic=deterministic)
            return dense(self.n_classes, dtype=self.dtype, name="head_fc2")(g)
        return dense(self.n_classes, dtype=self.dtype, name="head")(feats)

"""3D voxel tokenizers (reference: /root/reference/models/embed_layer_3d_modality.py).

TPU-first design note: every tokenizer whose conv has kernel == stride is
expressed as patchify-reshape + one big matmul — bitwise the same contraction
as the strided Conv3d, but shaped as a single [B*P^3, cell^3] x [cell^3, D]
MXU op instead of a convolution. When the voxel grid is not divisible by the
cell (ShapeNet 128^3 with cell 9), the trailing voxels are trimmed exactly as
a stride-9 conv would drop them.

Input layout is channels-last [B, X, Y, Z] occupancy (float); token outputs
are [B, ..., D]. Token ordering matches the reference's
``flatten(2).transpose(1, 2)`` row-major (px, py[, pz]) order.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import trunc_normal_init


def _patchify3d(x: jnp.ndarray, cell: int) -> tuple[jnp.ndarray, int]:
    """[B, X, Y, Z] -> ([B, p, p, p, cell^3], p) with conv-style trimming."""
    B, X, Y, Z = x.shape
    p = X // cell
    x = x[:, : p * cell, : p * cell, : p * cell]
    x = x.reshape(B, p, cell, p, cell, p, cell)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [B, px, py, pz, cx, cy, cz]
    return x.reshape(B, p, p, p, cell ** 3), p


class VoxelEmbed(nn.Module):
    """Conv3d(k=s=cell) then mean over the z patch axis -> [B, p, p, D].

    Reference: embed_layer_3d_modality.py:147-177 (the second, live,
    definition of the duplicated class; both are identical).
    """

    voxel_size: int = 128
    cell_size: int = 16
    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None

    @property
    def num_patches(self) -> int:
        return self.patch_size ** 2

    @nn.compact
    def __call__(self, x):
        assert x.shape[1] == self.voxel_size, (
            f"Input voxel size {x.shape[1:4]} != model {self.voxel_size}"
        )
        patches, p = _patchify3d(x, self.cell_size)
        kernel = self.param(
            "kernel", trunc_normal_init, (self.cell_size ** 3 * self.in_chans, self.embed_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        dt = self.dtype or x.dtype
        tok = patches.astype(dt) @ kernel.astype(dt) + bias.astype(dt)
        return jnp.mean(tok, axis=3)  # mean over pz -> [B, px, py, D]


class VoxelEmbedNoAverage(nn.Module):
    """Conv3d(k=s=cell), z kept -> [B, p, p, p, D] (p^3 tokens).

    Reference: embed_layer_3d_modality.py:42-70 (VoxelEmbed_no_average).
    """

    voxel_size: int = 128
    cell_size: int = 16
    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None

    @property
    def num_patches(self) -> int:
        return self.patch_size ** 3

    @nn.compact
    def __call__(self, x):
        assert x.shape[1] == self.voxel_size, (
            f"Input voxel size {x.shape[1:4]} != model {self.voxel_size}"
        )
        patches, p = _patchify3d(x, self.cell_size)
        kernel = self.param(
            "kernel", trunc_normal_init, (self.cell_size ** 3 * self.in_chans, self.embed_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        dt = self.dtype or x.dtype
        return patches.astype(dt) @ kernel.astype(dt) + bias.astype(dt)


class VoxelNaiveProjection(nn.Module):
    """clamp(sum_z(x), 0, 1) then Conv2d(k=s=cell) -> [B, p, p, D].

    Reference: embed_layer_3d_modality.py:179-209. The z-sum-and-clamp is the
    "shadow" projection of the occupancy grid; fused here with the 2D
    patchify-matmul so the whole tokenizer is one reduction + one contraction.
    """

    voxel_size: int = 128
    cell_size: int = 16
    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None

    @property
    def num_patches(self) -> int:
        return self.patch_size ** 2

    @nn.compact
    def __call__(self, x):
        assert x.shape[1] == self.voxel_size, (
            f"Input voxel size {x.shape[1:4]} != model {self.voxel_size}"
        )
        img = jnp.clip(jnp.sum(x, axis=3), 0.0, 1.0)  # [B, X, Y]
        B, X, Y = img.shape
        c = self.cell_size
        p = X // c
        img = img[:, : p * c, : p * c]
        img = img.reshape(B, p, c, p, c).transpose(0, 1, 3, 2, 4).reshape(B, p, p, c * c)
        kernel = self.param(
            "kernel", trunc_normal_init, (c * c * self.in_chans, self.embed_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        dt = self.dtype or x.dtype
        return img.astype(dt) @ kernel.astype(dt) + bias.astype(dt)


def _conv3d(x, kernel, stride=1):
    """channels-last 3D conv, VALID padding. x: [B,X,Y,Z,C], kernel: [k,k,k,Cin,Cout]."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,) * 3,
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class VoxelEmbedHybrid(nn.Module):
    """VoxNet-style conv stack then 1x1x1 projection, z kept.

    Reference: embed_layer_3d_modality.py:72-144 (VoxelEmbed_Hybrid and
    _no_average share the same compute graph; only the declared num_patches
    differs, and the reference's Hybrid value of 36 mismatches its true 216
    token output — a latent bug we do not replicate: num_patches here reflects
    the real token count). 128^3 inputs are trilinearly resized to 32^3 first.
    """

    voxel_size: int = 128
    patch_size: int = 1
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None
    drop1: float = 0.2
    drop2: float = 0.3

    @property
    def num_patches(self) -> int:
        return 6 ** 3  # 32^3 -> conv5s2:14 -> conv3:12 -> pool2:6

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert x.shape[1] == self.voxel_size
        x = x[..., None]  # [B,X,Y,Z,1]
        if self.voxel_size == 128:
            x = jax.image.resize(
                x, (x.shape[0], 32, 32, 32, 1), method="trilinear"
            )
        k1 = self.param("conv1_kernel", nn.initializers.lecun_normal(), (5, 5, 5, 1, 32))
        b1 = self.param("conv1_bias", nn.initializers.zeros, (32,))
        x = nn.relu(_conv3d(x, k1, stride=2) + b1)
        x = nn.Dropout(self.drop1)(x, deterministic=deterministic)
        k2 = self.param("conv2_kernel", nn.initializers.lecun_normal(), (3, 3, 3, 32, 32))
        b2 = self.param("conv2_bias", nn.initializers.zeros, (32,))
        x = nn.relu(_conv3d(x, k2) + b2)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.Dropout(self.drop2)(x, deterministic=deterministic)
        kp = self.param(
            "proj_kernel",
            nn.initializers.lecun_normal(),
            (self.patch_size,) * 3 + (32, self.embed_dim),
        )
        bp = self.param("proj_bias", nn.initializers.zeros, (self.embed_dim,))
        return _conv3d(x, kp, stride=self.patch_size) + bp


# Registry mirroring VALID_EMBED_LAYER (/root/reference/train_cls_voxel.py:46-53).
def make_embed_layer(
    name: str,
    voxel_size: int,
    cell_size: int | None = None,
    patch_size: int | None = None,
    embed_dim: int = 768,
    dtype=None,
):
    defaults = {
        "VoxelEmbed": (VoxelEmbed, 16, 8),
        "VoxelEmbed_no_zdim": (VoxelNaiveProjection, 16, 8),
        "VoxelEmbed_no_average": (VoxelEmbedNoAverage, 16, 8),
        "VoxelEmbed_14": (VoxelEmbed, 9, 14),
        "VoxelEmbed_no_average_14": (VoxelEmbedNoAverage, 9, 14),
        "VoxelEmbed_no_zdim_14": (VoxelNaiveProjection, 9, 14),
        "VoxelEmbed_Hybrid": (VoxelEmbedHybrid, None, 1),
    }
    if name not in defaults:
        raise ValueError(f"Unknown type of 3D data embedding: {name}")
    cls, d_cell, d_patch = defaults[name]
    patch_size = patch_size if patch_size is not None else d_patch
    if cls is VoxelEmbedHybrid:
        return cls(voxel_size=voxel_size, patch_size=patch_size, embed_dim=embed_dim, dtype=dtype)
    cell_size = cell_size if cell_size is not None else d_cell
    return cls(
        voxel_size=voxel_size,
        cell_size=cell_size,
        patch_size=patch_size,
        embed_dim=embed_dim,
        dtype=dtype,
    )

"""DeiT/ViT backbone, rebuilt natively (the reference leans on timm for this).

Covers what /root/reference/models/DeIT.py + timm's VisionTransformer supply:
patch embedding, cls token, learned pos embed, 12 pre-norm blocks, final norm,
classifier head. The 16x16/stride-16 patch conv is expressed as
patchify-reshape + one matmul — the exact same math, but laid out as a single
large MXU contraction instead of a convolution.

Backbone config dicts mirror the reference's tables *including the quirk* that
deit_base is instantiated with num_heads=3 in the 3D models
(/root/reference/models/vit_3d_2d_pretrain.py:298-306, models/3DViT/model.py:167-175)
while the true DeiT-base teacher uses 12 heads (/root/reference/models/DeIT.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import Block, dense, trunc_normal_init

# Config dicts used by the 3D models (reference parity, num_heads quirk intact).
BACKBONES = {
    "deit_tiny_patch16_224": dict(patch_size=16, embed_dim=192, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
    "deit_small_patch16_224": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0, qkv_bias=True),
    "deit_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
    "deit_base_distilled_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
    "vit_base_patch16_224_21k": dict(patch_size=16, embed_dim=768, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
    "vit_large_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
}

# True DeiT head counts, used for the LwF teacher (/root/reference/models/DeIT.py:67-153).
TEACHER_BACKBONES = {
    "deit_tiny_patch16_224": dict(patch_size=16, embed_dim=192, depth=12, num_heads=3, mlp_ratio=4.0, qkv_bias=True),
    "deit_small_patch16_224": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0, qkv_bias=True),
    "deit_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0, qkv_bias=True),
}

# The reference's complete 2D factory surface (/root/reference/models/DeIT.py:67-186):
# 8 functions = {tiny, small, base} x {plain, distilled} at 224 px, plus
# base {plain, distilled} at 384 px. True head counts (these are the real 2D
# models, not the quirky 3D config dicts above).
DEIT_FACTORY = {
    "deit_tiny_patch16_224": dict(embed_dim=192, num_heads=3, img_size=224, distilled=False),
    "deit_small_patch16_224": dict(embed_dim=384, num_heads=6, img_size=224, distilled=False),
    "deit_base_patch16_224": dict(embed_dim=768, num_heads=12, img_size=224, distilled=False),
    "deit_tiny_distilled_patch16_224": dict(embed_dim=192, num_heads=3, img_size=224, distilled=True),
    "deit_small_distilled_patch16_224": dict(embed_dim=384, num_heads=6, img_size=224, distilled=True),
    "deit_base_distilled_patch16_224": dict(embed_dim=768, num_heads=12, img_size=224, distilled=True),
    "deit_base_patch16_384": dict(embed_dim=768, num_heads=12, img_size=384, distilled=False),
    "deit_base_distilled_patch16_384": dict(embed_dim=768, num_heads=12, img_size=384, distilled=True),
}


def deit_factory(name: str, num_classes: int = 1000, dtype=None,
                 scan_blocks: bool = False) -> "ViT2D":
    """Build any of the reference's 8 DeiT models (models/DeIT.py:67-186)."""
    cfg = DEIT_FACTORY[name]
    return ViT2D(
        embed_dim=cfg["embed_dim"],
        depth=12,
        num_heads=cfg["num_heads"],
        mlp_ratio=4.0,
        qkv_bias=True,
        patch_size=16,
        num_classes=num_classes,
        img_size=cfg["img_size"],
        distilled=cfg["distilled"],
        scan_blocks=scan_blocks,
        dtype=dtype,
    )

EMBED_DIM = {name: cfg["embed_dim"] for name, cfg in BACKBONES.items()}


class _BlockStep(nn.Module):
    """One transformer block shaped for nn.scan: (carry, _) -> (carry, None)."""

    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    deterministic: bool
    dtype: Optional[jnp.dtype]
    seg_len: Optional[int] = None

    @nn.compact
    def __call__(self, x, _):
        x = Block(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop=self.drop,
            attn_drop=self.attn_drop,
            drop_path=self.drop_path,
            dtype=self.dtype,
            name="block",
        )(x, deterministic=self.deterministic, seg_len=self.seg_len)
        return x, None


class ViTCore(nn.Module):
    """The shared block stack + final LayerNorm (timm `blocks` + `norm`).

    ``scan_blocks=True`` stacks the depth-identical blocks along a leading
    layer axis and runs them with nn.scan — the compiled program contains ONE
    block body instead of `depth` unrolled copies (12x smaller HLO, much
    faster XLA compiles; useful where program size is capped). Param tree:
    core/scan/block/... with a leading [depth] dim. The default is unrolled
    (core/blocks_i/...): at this framework's tiny sequence lengths the
    unrolled program runs ~1.6x faster (XLA fuses across block boundaries);
    measured 9.8k vs 6.2k samples/sec/chip on the flagship config.
    """

    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    scan_blocks: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 seg_len: Optional[int] = None):
        # seg_len packs several length-seg_len sequences per row with
        # block-diagonal attention (see nn.layers.Attention) — exact math.
        # DropPath would drop a whole packed row (= seg-many sequences), so
        # packing is only valid at drop_path 0; callers gate on that.
        if seg_len is not None and self.drop_path > 0.0:
            raise ValueError("seg_len packing requires drop_path == 0 "
                             "(stochastic depth is per-sample)")
        if self.scan_blocks:
            scanned = nn.scan(
                _BlockStep,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
            )(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                deterministic=deterministic,
                dtype=self.dtype,
                seg_len=seg_len,
                name="scan",
            )
            x, _ = scanned(x, None)
        else:
            for i in range(self.depth):
                x = Block(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop,
                    attn_drop=self.attn_drop,
                    drop_path=self.drop_path,
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )(x, deterministic=deterministic, seg_len=seg_len)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class PatchEmbed2D(nn.Module):
    """Image -> 196 tokens. Conv(k=s=16) as patchify + matmul (MXU-shaped).

    Input is channels-last [B, H, W, C]. Token order matches torch's
    flatten(2).transpose(1, 2): row-major over the (gh, gw) patch grid.
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        P = self.patch_size
        gh, gw = H // P, W // P
        kernel = self.param(
            "kernel", trunc_normal_init, (P * P * C, self.embed_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        x = x.reshape(B, gh, P, gw, P, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * C)
        dt = self.dtype or x.dtype
        return x.astype(dt) @ kernel.astype(dt) + bias.astype(dt)


class ViT2D(nn.Module):
    """Full 2D DeiT classifier: the LwF teacher and the frozen 2D pathway.

    Mirrors timm VisionTransformer.forward as the reference uses it
    (/root/reference/models/vit_3d_2d_pretrain.py:435-451): patch embed,
    prepend cls token, add pos embed, blocks, norm, head on the cls token.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    num_classes: int = 1000
    img_size: int = 224
    distilled: bool = False  # DeiT distilled variants (models/DeIT.py:23-64)
    scan_blocks: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        n_extra = 2 if self.distilled else 1
        n_patches = (self.img_size // self.patch_size) ** 2
        self.patch_embed = PatchEmbed2D(
            patch_size=self.patch_size, embed_dim=self.embed_dim, dtype=self.dtype
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, self.embed_dim)
        )
        if self.distilled:
            self.dist_token = self.param(
                "dist_token", trunc_normal_init, (1, 1, self.embed_dim)
            )
            self.head_dist = dense(self.num_classes, dtype=self.dtype,
                                   name="head_dist")
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, n_patches + n_extra, self.embed_dim)
        )
        self.core = ViTCore(
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            name="core",
        )
        self.head = dense(self.num_classes, dtype=self.dtype, name="head")

    def encode(self, x, *, deterministic: bool = True):
        tokens = self.patch_embed(x)
        B, _, D = tokens.shape
        cls = jnp.broadcast_to(self.cls_token.astype(tokens.dtype), (B, 1, D))
        if self.distilled:
            dist = jnp.broadcast_to(self.dist_token.astype(tokens.dtype), (B, 1, D))
            tokens = jnp.concatenate([cls, dist, tokens], axis=1)
        else:
            tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self.pos_embed.astype(tokens.dtype)
        return self.core(tokens, deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True):
        feats = self.encode(x, deterministic=deterministic)
        if self.distilled:
            # inference-mode DeiT: mean of cls head and distillation head
            return (self.head(feats[:, 0]) + self.head_dist(feats[:, 1])) / 2.0
        return self.head(feats[:, 0])


def make_teacher(backbone: str = "deit_base_patch16_224", dtype=None,
                 scan_blocks: bool = False) -> ViT2D:
    """Frozen 2D teacher for LwF (/root/reference/train_cls_voxel.py:180)."""
    cfg = TEACHER_BACKBONES[backbone]
    return ViT2D(
        embed_dim=cfg["embed_dim"],
        depth=cfg["depth"],
        num_heads=cfg["num_heads"],
        mlp_ratio=cfg["mlp_ratio"],
        qkv_bias=cfg["qkv_bias"],
        patch_size=cfg["patch_size"],
        scan_blocks=scan_blocks,
        dtype=dtype,
    )

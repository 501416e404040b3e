"""3DViT family — point clouds through a frozen-config DeiT backbone.

Reference: /root/reference/models/3DViT{,_0_layer,_1_layer,_LWF}/model.py.
One unified module covers every variant; they differ only in the stem width,
the TransitionDown pyramid, and whether the frozen 2D image pathway (LwF)
exists:

  variant        stem   transition-downs (npoint, channel)   2D pathway
  3DViT          D/4    (N, D/2), (N/4, D)                   no   [model.py:242]
  3DViT_LWF      D/4    (N/4, D/2), (N/16, D)                yes  [LWF/model.py:231]
  3DViT_1_layer  D/2    (N/4, D)                             yes  [1_layer/model.py:231]
  3DViT_0_layer  D      —                                    yes  [0_layer/model.py:283]
  3DViT_s3dis    — alias of 3DViT: the reference's semseg config names a
                 models/3DViT_s3dis module that does not exist in the repo
                 (latent import gap); the intended geometry is the 3DViT one.

Decode mirrors the reference: strip cls token, TransitionUp per level back to
full resolution; cls task mean-pools after decode (3DViT/model.py:325), seg
keeps per-point features. The LwF variants freeze the 2D head and 2D patch
embed but NOT pos_embed (1_layer/model.py:283-289 — unlike the voxel model).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import AMSoftmaxLayer, dense
from ..nn.vit import BACKBONES, PatchEmbed2D, ViTCore
from .hengshuang import TransitionDown, TransitionUp


def variant_spec(variant: str, D: int, N: int):
    if variant in ("3DViT", "3DViT_s3dis"):
        return dict(stem=D // 4, tds=[(N, D // 2), (N // 4, D)], images=False)
    if variant == "3DViT_LWF":
        return dict(stem=D // 4, tds=[(N // 4, D // 2), (N // 16, D)], images=True)
    if variant == "3DViT_1_layer":
        return dict(stem=D // 2, tds=[(N // 4, D)], images=True)
    if variant == "3DViT_0_layer":
        return dict(stem=D, tds=[], images=True)
    raise ValueError(f"Unknown 3DViT variant {variant!r}")


class StemMLP(nn.Module):
    """Linear -> ReLU -> Linear (fc1 / fc_pos_embed of the reference)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.features, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return dense(self.features, dtype=self.dtype, name="fc2")(x)


class PointViT(nn.Module):
    """PointTransformerCls / PointTransformerSeg of the 3DViT family."""

    variant: str
    task: str  # 'cls' | 'seg'
    num_point: int
    num_class: int
    input_dim: int = 3
    nneighbor: int = 16
    transformer_backbone: str = "deit_tiny_patch16_224"
    head: str = "default"
    img_size: int = 224
    scan_blocks: bool = False  # see nn.vit.ViTCore
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @classmethod
    def from_config(cls, cfg, task: str, **kw):
        return cls(
            variant=cfg.model.name,
            task=task,
            num_point=cfg.num_point,
            num_class=cfg.num_class,
            input_dim=cfg.input_dim,
            nneighbor=cfg.model.nneighbor,
            transformer_backbone=cfg.model.transformer_backbone,
            head=cfg.model.get("head", "default"),
            **kw,
        )

    def setup(self):
        bb = BACKBONES[self.transformer_backbone]
        D = bb["embed_dim"]
        spec = variant_spec(self.variant, D, self.num_point)
        self.spec = spec
        self.embed_dim = D

        self.fc1 = StemMLP(spec["stem"], dtype=self.dtype)
        self.fc_pos_embed = StemMLP(spec["stem"], dtype=self.dtype)

        channels = [spec["stem"]] + [c for _, c in spec["tds"]]
        self.transition_downs = [
            TransitionDown(
                k=npoint,
                nneighbor=self.nneighbor,
                channels=(channels[i] + 3, c, c),
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
            for i, (npoint, c) in enumerate(spec["tds"])
        ]
        self.transition_ups = [
            TransitionUp(
                dim_out=channels[len(spec["tds"]) - 1 - i],
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )
            for i in range(len(spec["tds"]))
        ]

        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, D)
        )
        self.core = ViTCore(
            depth=bb["depth"],
            num_heads=bb["num_heads"],
            mlp_ratio=bb["mlp_ratio"],
            qkv_bias=bb["qkv_bias"],
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            name="core",
        )

        if self.head == "AMSoftmax":
            self.new_head = AMSoftmaxLayer(self.num_class, dtype=self.dtype)
        else:
            self.new_head = dense(self.num_class, dtype=self.dtype, name="new_head")

        if spec["images"]:
            n2d = (self.img_size // bb["patch_size"]) ** 2
            self.patch_embed = PatchEmbed2D(
                patch_size=bb["patch_size"], embed_dim=D, dtype=self.dtype
            )
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02), (1, n2d + 1, D)
            )
            self.head_2d = dense(1000, dtype=self.dtype, name="head")

    def forward_features(self, x, *, deterministic: bool = True):
        xyz = x[..., :3]
        f = self.fc1(x) + self.fc_pos_embed(xyz)

        levels = [(xyz, f)]
        for td in self.transition_downs:
            xyz, f = td(levels[-1][0], levels[-1][1], deterministic=deterministic)
            levels.append((xyz, f))

        tokens = levels[-1][1]
        cls = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (tokens.shape[0], 1, tokens.shape[-1])
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = self.core(tokens, deterministic=deterministic)
        h = tokens[:, 1:]

        for i, tu in enumerate(self.transition_ups):
            coarse_xyz = levels[-1 - i][0]
            fine_xyz, fine_f = levels[-2 - i]
            h = tu(coarse_xyz, h, fine_xyz, fine_f, deterministic=deterministic)
        return h  # [B, N, stem] (or [B, N, D] for 0_layer)

    def forward_images(self, x, *, deterministic: bool = True):
        if not self.spec["images"]:
            raise ValueError(f"{self.variant} has no 2D image pathway")
        tokens = self.patch_embed(x)
        cls = jnp.broadcast_to(
            self.cls_token.astype(tokens.dtype), (tokens.shape[0], 1, tokens.shape[-1])
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self.pos_embed.astype(tokens.dtype)
        tokens = self.core(tokens, deterministic=deterministic)
        return self.head_2d(tokens[:, 0])

    def __call__(self, x, *, deterministic: bool = True):
        h = self.forward_features(x, deterministic=deterministic)
        if self.task == "cls":
            h = jnp.mean(h, axis=1)
        return self.new_head(h)

    def init_all(self, x, images=None):
        out = self(x)
        if self.spec["images"] and images is not None:
            return out, self.forward_images(images)
        return out


# LwF variants freeze the 2D head + patch embed only (1_layer/model.py:283-289).
FROZEN_2D_PREFIXES_POINT = ("head", "patch_embed")


def frozen_mask_point(params, pretrained: bool):
    import jax

    if not pretrained:
        return jax.tree_util.tree_map(lambda _: True, params)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return path[0] not in FROZEN_2D_PREFIXES_POINT

    return walk(params, ())

"""Execute the REFERENCE's own torch model code on this host (CPU).

Purpose: accuracy-parity evidence. The trajectory harness
(scripts/trajectory_parity.py) compares our production train loop against
hand-written torch mirrors; this bridge goes one step further and runs the
reference's ACTUAL model classes (imported read-only, by file path, from
/root/reference — never copied, never edited) so that "our framework behaves
like the reference" can be measured against the reference's own code, not a
re-implementation of it.

What it provides:
  * install_timm_shim(): the reference imports a handful of timm symbols
    (`timm` is not installed here). The shim implements the timm-0.3.2-era
    semantics those symbols had — VisionTransformer (pre-norm blocks, erf
    GELU, qkv-packed attention), PatchEmbed (tuple .patch_size — the
    reference's `patch_embed.patch_size != 14` checks rely on tuple-vs-int
    inequality), trunc_normal_, to_2tuple, DropPath, register_model, _cfg.
    The shim is faithful to timm's published semantics; it is OUR code, so
    parity statements read "reference model-assembly/tokenizer/routing code
    + spec-faithful backbone" (the tokenizers in embed_layer_3d_modality.py
    and every forward_features route are pure reference code).
  * load_reference_module(name): import reference modules with fake parent
    packages so the broken `data/__init__.py` (unresolvable pc_util /
    scipy.misc imports, SURVEY §7.3) is never executed.
  * export_voxelvit_state_dict(params, ...): map OUR flax VoxelViT parameter
    tree onto the reference Feature3D_ViT2D_V2's state-dict names (the exact
    inverse of utils/torch_convert.torch_to_jax_tree plus the 3D-side
    leaves), so both frameworks can start from IDENTICAL weights.

Used by scripts/accuracy_parity.py and tests/test_reference_parity.py.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# timm shim (timm 0.3.2 semantics for the symbols the reference imports)
# --------------------------------------------------------------------------

def _build_timm_modules():
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            self.num_heads = num_heads
            head_dim = dim // num_heads
            self.scale = qk_scale or head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(
                B, N, 3, self.num_heads, C // self.num_heads
            ).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                     act_layer=nn.GELU, norm_layer=nn.LayerNorm):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                                  qk_scale=qk_scale, attn_drop=attn_drop,
                                  proj_drop=drop)
            self.drop_path = DropPath(drop_path) if drop_path > 0 else nn.Identity()
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, hidden_features=int(dim * mlp_ratio),
                           act_layer=act_layer, drop=drop)

        def forward(self, x):
            x = x + self.drop_path(self.attn(self.norm1(x)))
            x = x + self.drop_path(self.mlp(self.norm2(x)))
            return x

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)  # tuple, as in timm 0.3.2
            self.img_size = img_size
            self.patch_size = patch_size
            self.num_patches = (img_size[1] // patch_size[1]) * (
                img_size[0] // patch_size[0])
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class VisionTransformer(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     num_classes=1000, embed_dim=768, depth=12, num_heads=12,
                     mlp_ratio=4.0, qkv_bias=False, qk_scale=None,
                     drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
                     hybrid_backbone=None, norm_layer=nn.LayerNorm):
            super().__init__()
            self.num_classes = num_classes
            self.num_features = self.embed_dim = embed_dim
            self.patch_embed = PatchEmbed(img_size=img_size,
                                          patch_size=patch_size,
                                          in_chans=in_chans,
                                          embed_dim=embed_dim)
            num_patches = self.patch_embed.num_patches
            self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.pos_embed = nn.Parameter(
                torch.zeros(1, num_patches + 1, embed_dim))
            self.pos_drop = nn.Dropout(p=drop_rate)
            dpr = [x.item() for x in torch.linspace(0, drop_path_rate, depth)]
            self.blocks = nn.ModuleList([
                Block(dim=embed_dim, num_heads=num_heads, mlp_ratio=mlp_ratio,
                      qkv_bias=qkv_bias, qk_scale=qk_scale, drop=drop_rate,
                      attn_drop=attn_drop_rate, drop_path=dpr[i],
                      norm_layer=norm_layer)
                for i in range(depth)
            ])
            self.norm = norm_layer(embed_dim)
            self.head = (nn.Linear(embed_dim, num_classes)
                         if num_classes > 0 else nn.Identity())
            trunc_normal_(self.pos_embed, std=0.02)
            trunc_normal_(self.cls_token, std=0.02)
            self.apply(self._init_weights)

        def _init_weights(self, m):
            if isinstance(m, nn.Linear):
                trunc_normal_(m.weight, std=0.02)
                if m.bias is not None:
                    nn.init.constant_(m.bias, 0)
            elif isinstance(m, nn.LayerNorm):
                nn.init.constant_(m.bias, 0)
                nn.init.constant_(m.weight, 1.0)

        def forward_features(self, x):
            B = x.shape[0]
            x = self.patch_embed(x)
            cls_tokens = self.cls_token.expand(B, -1, -1)
            x = torch.cat((cls_tokens, x), dim=1)
            x = self.pos_drop(x + self.pos_embed)
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)[:, 0]

        def forward(self, x):
            return self.head(self.forward_features(x))

    def _cfg(url="", **kwargs):
        cfg = {"url": url, "num_classes": 1000, "input_size": (3, 224, 224),
               "pool_size": None, "crop_pct": 0.9, "interpolation": "bicubic",
               "mean": (0.485, 0.456, 0.406), "std": (0.229, 0.224, 0.225),
               "first_conv": "patch_embed.proj", "classifier": "head"}
        cfg.update(kwargs)
        return cfg

    def register_model(fn):
        return fn

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vt = types.ModuleType("timm.models.vision_transformer")
    data = types.ModuleType("timm.data")

    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = to_2tuple
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.PatchEmbed = PatchEmbed
    registry.register_model = register_model
    vt.VisionTransformer = VisionTransformer
    vt.PatchEmbed = PatchEmbed
    vt.Block = Block
    vt.Attention = Attention
    vt.Mlp = Mlp
    vt._cfg = _cfg
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm.models = timm_models
    timm.data = data
    timm_models.layers = layers
    timm_models.registry = registry
    timm_models.vision_transformer = vt
    return {"timm": timm, "timm.models": timm_models,
            "timm.models.layers": layers, "timm.models.registry": registry,
            "timm.models.vision_transformer": vt, "timm.data": data}


def install_timm_shim():
    """Register the shim in sys.modules (idempotent; no-op if real timm exists)."""
    if "timm" in sys.modules and not getattr(sys.modules["timm"], "_s3f_shim", False):
        return
    if "timm" not in sys.modules:
        mods = _build_timm_modules()
        mods["timm"]._s3f_shim = True
        sys.modules.update(mods)


# --------------------------------------------------------------------------
# reference module loading (by path; broken package inits never executed)
# --------------------------------------------------------------------------

def _fake_pkg(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m
    return m


def load_reference_module(dotted: str):
    """Import e.g. 'models.vit_3d_2d_pretrain' or 'data.pointnet_util' from
    /root/reference. Fake parent packages are registered so that the
    reference's broken `data/__init__.py` (pc_util / scipy.misc, SURVEY §7.3)
    never runs; `models/__init__.py` is empty but is bypassed the same way
    for uniformity."""
    install_timm_shim()
    if not hasattr(np, "int"):  # numpy>=1.24 removed the alias the 2022 code uses
        np.int = int  # noqa: NPY001
    _fake_pkg("models", f"{REF_ROOT}/models")
    _fake_pkg("data", f"{REF_ROOT}/data")
    return importlib.import_module(dotted)


# --------------------------------------------------------------------------
# our params -> reference state-dict export
# --------------------------------------------------------------------------

def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def export_backbone_state_dict(params: dict) -> dict:
    """Map our ViT param subtree (cls_token/pos_embed/patch_embed/core/head)
    onto timm state-dict names — the inverse of torch_convert.torch_to_jax_tree."""
    sd = {}
    if "cls_token" in params:
        sd["cls_token"] = _t(params["cls_token"])
    if "pos_embed" in params:
        sd["pos_embed"] = _t(params["pos_embed"])
    if "patch_embed" in params:
        k = np.asarray(params["patch_embed"]["kernel"])  # [(P P C), D]
        D = k.shape[-1]
        pe_sq = k.shape[0]
        # infer P from (P*P*C) with C=3
        P = int(round(np.sqrt(pe_sq / 3)))
        w = k.reshape(P, P, 3, D).transpose(3, 2, 0, 1)  # -> [D, C, P, P]
        sd["patch_embed.proj.weight"] = _t(w)
        sd["patch_embed.proj.bias"] = _t(params["patch_embed"]["bias"])
    core = params.get("core", {})
    for name, sub in core.items():
        if name == "norm":
            sd["norm.weight"] = _t(sub["scale"])
            sd["norm.bias"] = _t(sub["bias"])
        elif name.startswith("blocks_"):
            i = int(name.split("_")[1])
            for ln in ("norm1", "norm2"):
                sd[f"blocks.{i}.{ln}.weight"] = _t(sub[ln]["scale"])
                sd[f"blocks.{i}.{ln}.bias"] = _t(sub[ln]["bias"])
            for grp, lyrs in (("attn", ("qkv", "proj")), ("mlp", ("fc1", "fc2"))):
                for lyr in lyrs:
                    sd[f"blocks.{i}.{grp}.{lyr}.weight"] = _t(
                        np.asarray(sub[grp][lyr]["kernel"]).T)
                    sd[f"blocks.{i}.{grp}.{lyr}.bias"] = _t(sub[grp][lyr]["bias"])
    if "head" in params:
        sd["head.weight"] = _t(np.asarray(params["head"]["kernel"]).T)
        sd["head.bias"] = _t(params["head"]["bias"])
    return sd


def export_voxelvit_state_dict(params: dict, cell_size: int) -> dict:
    """Our VoxelViT tree -> reference Feature3D_ViT2D_V2 state-dict names.

    Covers the default/no_embed routes' parameters (VoxelEmbed conv, voxel
    pos embed, voxel head) on top of the shared backbone. group_embed's
    stage-1 encoder is NOT mapped: the reference's nn.TransformerEncoderLayer
    misuse (batch-first tensors into a seq-first module) attends across the
    batch — a bug we deliberately do not replicate (models/voxel_vit.py
    docstring), so its weights have no meaningful correspondence.
    """
    sd = export_backbone_state_dict(params)
    ve = params["voxel_embed"]
    k = np.asarray(ve["kernel"])  # [(cell^3 * C_in), D], C_in == 1
    D = k.shape[-1]
    w = k.T.reshape(D, 1, cell_size, cell_size, cell_size)
    sd["voxel_embed.proj.conv3d_1.weight"] = _t(w)
    sd["voxel_embed.proj.conv3d_1.bias"] = _t(ve["bias"])
    sd["voxel_pos_embed"] = _t(params["voxel_pos_embed"])
    sd["voxel_head.weight"] = _t(np.asarray(params["voxel_head"]["kernel"]).T)
    sd["voxel_head.bias"] = _t(params["voxel_head"]["bias"])
    return sd

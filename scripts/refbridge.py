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

import contextlib
import importlib
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


@contextlib.contextmanager
def pinned_fps_start():
    """Pin the reference's farthest_point_sample start index to 0.

    The reference FPS starts from torch.randint(0, N, (B,))
    (data/pointnet_util.py:65); our ops.pointops.farthest_point_sample
    starts from index 0 when no RNG key is passed (the eval-mode path).
    Parity fixtures must pin this RNG (SURVEY §7.3), so within this context
    torch.randint returns zeros — both frameworks then select identical
    FPS trajectories (identical distance updates + first-index argmax
    tie-breaks on both sides)."""
    import torch

    orig = torch.randint

    def _zeros(low, high=None, size=None, **kw):
        if high is None or size is None:  # positional (high, size) form
            size = high if size is None else size
        dtype = kw.get("dtype", torch.long)
        return torch.zeros(size, dtype=dtype)

    torch.randint = _zeros
    try:
        yield
    finally:
        torch.randint = orig


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
    pos embed, voxel head) on top of the shared backbone, plus — when the
    tree carries them — the group_embed route's stage-1 encoder (our
    PostNormEncoderLayer maps 1:1 onto torch nn.TransformerEncoderLayer:
    packed qkv == in_proj with the same [q;k;v]*[head, head_dim] feature
    order, post-LN + ReLU FF ordering identical), group_pos_embed and
    group_cls_token. The weight correspondence is exact even though the
    reference FEEDS the encoder batch-first (the axis bug,
    vit_3d_2d_pretrain.py:381,479): the weights don't know about axes —
    our VoxelViT(group_axes="reference_bug") reproduces the reference's
    attention axes for parity tests, and the as-shipped "pillar" mode
    quantifies the bug-fix deviation from the same weights
    (scripts/accuracy_parity.py --route group_embed).
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
    if "group_embed" in params:
        ge = params["group_embed"]
        sd["group_embed.self_attn.in_proj_weight"] = _t(
            np.asarray(ge["qkv"]["kernel"]).T)
        sd["group_embed.self_attn.in_proj_bias"] = _t(ge["qkv"]["bias"])
        _linear(sd, "group_embed.self_attn.out_proj", ge["out_proj"])
        _linear(sd, "group_embed.linear1", ge["linear1"])
        _linear(sd, "group_embed.linear2", ge["linear2"])
        for ln in ("norm1", "norm2"):
            sd[f"group_embed.{ln}.weight"] = _t(ge[ln]["scale"])
            sd[f"group_embed.{ln}.bias"] = _t(ge[ln]["bias"])
        sd["group_pos_embed"] = _t(params["group_pos_embed"])
        sd["group_cls_token"] = _t(params["group_cls_token"])
    return sd


# --------------------------------------------------------------------------
# point-model exports (Hengshuang / 3DViT families)
# --------------------------------------------------------------------------

def _linear(sd, name, sub):
    sd[f"{name}.weight"] = _t(np.asarray(sub["kernel"]).T)
    if "bias" in sub:
        sd[f"{name}.bias"] = _t(sub["bias"])


def _mlp2(sd, name, sub):
    """Our MLP2 {fc1,fc2} -> torch nn.Sequential(Linear, ReLU, Linear)."""
    _linear(sd, f"{name}.0", sub["fc1"])
    _linear(sd, f"{name}.2", sub["fc2"])


def _mlp_head(sd, name, sub):
    """Our MlpHead {fc1..fcK} -> torch Sequential(Linear, ReLU, ...) at 0,2,4.."""
    for i in range(len(sub)):
        _linear(sd, f"{name}.{2 * i}", sub[f"fc{i + 1}"])


def _vab(sd, name, sub):
    """Our VectorAttentionBlock -> reference Hengshuang TransformerBlock
    (models/Hengshuang/transformer.py:7-26)."""
    for lyr in ("fc1", "fc2", "w_qs", "w_ks", "w_vs"):
        _linear(sd, f"{name}.{lyr}", sub[lyr])
    _mlp2(sd, f"{name}.fc_delta", sub["fc_delta"])
    _mlp2(sd, f"{name}.fc_gamma", sub["fc_gamma"])


def _bn(sd, name, sub, stats=None):
    import torch

    scale = np.asarray(sub["scale"])
    sd[f"{name}.weight"] = _t(scale)
    sd[f"{name}.bias"] = _t(sub["bias"])
    if stats is not None:
        sd[f"{name}.running_mean"] = _t(stats["mean"])
        sd[f"{name}.running_var"] = _t(stats["var"])
    else:
        sd[f"{name}.running_mean"] = torch.zeros(scale.shape[0])
        sd[f"{name}.running_var"] = torch.ones(scale.shape[0])
    sd[f"{name}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _sa(sd, name, sub, stats=None):
    """Our PointNetSetAbstraction {mlp_i: {conv, bn}} -> reference
    PointNetSetAbstraction mlp_convs/mlp_bns (pointnet_util.py:191-218);
    our channel-last Dense kernel [in,out] -> Conv2d 1x1 weight [out,in,1,1]."""
    import torch

    n = sum(1 for k in sub if k.startswith("mlp_"))
    last = 0
    for i in range(n):
        conv = sub[f"mlp_{i}"]["conv"]
        k = np.asarray(conv["kernel"])
        sd[f"{name}.mlp_convs.{i}.weight"] = _t(k.T[:, :, None, None])
        sd[f"{name}.mlp_convs.{i}.bias"] = _t(conv["bias"])
        _bn(sd, f"{name}.mlp_bns.{i}", sub[f"mlp_{i}"]["bn"],
            stats[f"mlp_{i}"]["bn"] if stats else None)
        last = k.shape[-1]
    # The reference SA constructs a `last_pos_embed` MLP it never calls
    # (pointnet_util.py:212-216 — dead in forward, like the commented-out
    # pos_embeds list). We rightly create no such params; zero-fill the names
    # so load_state_dict(strict) can still assert 1:1 on the live surface.
    sd[f"{name}.last_pos_embed.0.weight"] = torch.zeros(last, 3)
    sd[f"{name}.last_pos_embed.0.bias"] = torch.zeros(last)
    sd[f"{name}.last_pos_embed.2.weight"] = torch.zeros(last, last)
    sd[f"{name}.last_pos_embed.2.bias"] = torch.zeros(last)


def _linear_bn_relu(sd, name, sub, stats=None):
    """Our LinearBNReLU {fc,bn} -> reference Sequential(Linear, Swap, BN1d,
    Swap, ReLU) at indices 0 (Linear) and 2 (BN) — Hengshuang/model.py:26-39."""
    _linear(sd, f"{name}.0", sub["fc"])
    _bn(sd, f"{name}.2", sub["bn"], stats["bn"] if stats else None)


def export_hengshuang_state_dict(params, nblocks, batch_stats=None,
                                 seg=False) -> dict:
    """Our models/hengshuang.py param tree -> reference
    models/Hengshuang/model.py PointTransformerCls/Seg state-dict names."""
    sd = {}
    bb = params["backbone"]
    bbs = (batch_stats or {}).get("backbone")
    _linear(sd, "backbone.fc1.0", bb["fc1_1"])
    _linear(sd, "backbone.fc1.2", bb["fc1_2"])
    _vab(sd, "backbone.transformer1", bb["transformer1"])
    for i in range(nblocks):
        _sa(sd, f"backbone.transition_downs.{i}.sa",
            bb[f"transition_downs_{i}"]["sa"],
            bbs[f"transition_downs_{i}"]["sa"] if bbs else None)
        _vab(sd, f"backbone.transformers.{i}", bb[f"transformers_{i}"])
    _mlp_head(sd, "fc2", params["fc2"])
    if seg:
        _vab(sd, "transformer2", params["transformer2"])
        for i in range(nblocks):
            tu = params[f"transition_ups_{i}"]
            tus = (batch_stats or {}).get(f"transition_ups_{i}")
            _linear_bn_relu(sd, f"transition_ups.{i}.fc1", tu["fc1"],
                            tus["fc1"] if tus else None)
            _linear_bn_relu(sd, f"transition_ups.{i}.fc2", tu["fc2"],
                            tus["fc2"] if tus else None)
            _vab(sd, f"transformers.{i}", params[f"up_transformers_{i}"])
        _mlp_head(sd, "fc3", params["fc3"])
    return sd


def _dead_bn(sd, name, c):
    """Zero-fill a torch BatchNorm's state-dict entries for a module that is
    dead in the reference forward (values are never read)."""
    import torch

    sd[f"{name}.weight"] = torch.zeros(c)
    sd[f"{name}.bias"] = torch.zeros(c)
    sd[f"{name}.running_mean"] = torch.zeros(c)
    sd[f"{name}.running_var"] = torch.ones(c)
    sd[f"{name}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _dead_pointembed(sd, name, d_points, embed_dim):
    """The plain 3DViT replaces patch_embed with PointEmbed
    (models/3DViT/model.py:227) but its forward never calls it (:303-304 use
    fc1/fc_pos_embed instead — SURVEY §2.2). Zero-fill its state-dict names so
    load_state_dict(strict) can assert 1:1 on the live surface."""
    import torch

    q = embed_dim // 4
    sd[f"{name}.conv1.weight"] = torch.zeros(64, d_points, 1)
    sd[f"{name}.conv2.weight"] = torch.zeros(64, 64, 1)
    _dead_bn(sd, f"{name}.bn1", 64)
    _dead_bn(sd, f"{name}.bn2", 64)
    for j, cin in (("0", 128), ("1", 256)):
        sd[f"{name}.gather_local_{j}.conv1.weight"] = torch.zeros(q, cin, 1)
        sd[f"{name}.gather_local_{j}.conv2.weight"] = torch.zeros(q, q, 1)
        _dead_bn(sd, f"{name}.gather_local_{j}.bn1", q)
        _dead_bn(sd, f"{name}.gather_local_{j}.bn2", q)


def export_pointvit_state_dict(params, input_dim, batch_stats=None) -> dict:
    """Our models/point_vit.PointViT tree -> the reference 3DViT-family
    state-dict names (models/3DViT{,_0_layer,_1_layer,_LWF}/model.py).

    Images variants (0_layer/1_layer/LWF) map 1:1: the 2D patch_embed /
    pos_embed / head are live on the reference's forward_images path and on
    ours. The plain 3DViT has no image pathway: there the point head is the
    reference's replaced `head` (3DViT/model.py:233-236) and the leftover 2D
    pos_embed + dead PointEmbed patch_embed are zero-filled (never read)."""
    import torch

    images = "head" in params  # our head_2d is named 'head' (images variants)
    bb = {k: params[k] for k in ("cls_token", "pos_embed", "patch_embed",
                                 "core", "head") if k in params}
    sd = export_backbone_state_dict(bb)
    for stem in ("fc1", "fc_pos_embed"):
        _linear(sd, f"{stem}.0", params[stem]["fc1"])
        _linear(sd, f"{stem}.2", params[stem]["fc2"])
    i = 0
    while f"transition_downs_{i}" in params:
        bs = (batch_stats or {}).get(f"transition_downs_{i}")
        _sa(sd, f"transition_downs.{i}.sa", params[f"transition_downs_{i}"]["sa"],
            bs["sa"] if bs else None)
        i += 1
    i = 0
    while f"transition_ups_{i}" in params:
        tu = params[f"transition_ups_{i}"]
        tus = (batch_stats or {}).get(f"transition_ups_{i}")
        _linear_bn_relu(sd, f"transition_ups.{i}.fc1", tu["fc1"],
                        tus["fc1"] if tus else None)
        _linear_bn_relu(sd, f"transition_ups.{i}.fc2", tu["fc2"],
                        tus["fc2"] if tus else None)
        i += 1
    _linear(sd, "new_head" if images else "head", params["new_head"])
    if not images:
        D = np.asarray(params["cls_token"]).shape[-1]
        sd["pos_embed"] = torch.zeros(1, 197, D)  # dead: point path never adds it
        _dead_pointembed(sd, "patch_embed", input_dim, D)
    return sd


def export_vip3d_state_dict(params, layers, transitions, embed_dims,
                            cell_size, peg=False, qkv_bias=False) -> dict:
    """Our models/vip3d.VisionPermutator3D tree -> reference
    models/vip_3d.py state-dict names. Stage s, block b live at
    network.{ni}.{bj} where ni skips over interleaved Downsample entries and
    bj accounts for the PEG PosCNN inserted after block 0 (vip_3d.py:146-149).
    The reference's dead mlp_z (constructed at :52, never called — the z-mix
    reuses mlp_w at :76) is zero-filled so strict loading can assert 1:1."""
    import torch

    sd = {}
    ve = params["embed_layer"]
    k = np.asarray(ve["kernel"])
    D = k.shape[-1]
    sd["patch_embed.proj.conv3d_1.weight"] = _t(
        k.T.reshape(D, 1, cell_size, cell_size, cell_size))
    sd["patch_embed.proj.conv3d_1.bias"] = _t(ve["bias"])
    ni = 0
    for i, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            bj = b + (1 if peg and b >= 1 else 0)
            blk = params[f"stage{i}_block{b}"]
            base = f"network.{ni}.{bj}"
            for ln in ("norm1", "norm2"):
                sd[f"{base}.{ln}.weight"] = _t(blk[ln]["scale"])
                sd[f"{base}.{ln}.bias"] = _t(blk[ln]["bias"])
            attn = blk["attn"]
            for lyr in ("mlp_h", "mlp_w", "mlp_c", "proj"):
                _linear(sd, f"{base}.attn.{lyr}", attn[lyr])
            _linear(sd, f"{base}.attn.reweight.fc1", attn["reweight"]["fc1"])
            _linear(sd, f"{base}.attn.reweight.fc2", attn["reweight"]["fc2"])
            _linear(sd, f"{base}.mlp.fc1", blk["mlp"]["fc1"])
            _linear(sd, f"{base}.mlp.fc2", blk["mlp"]["fc2"])
            C = np.asarray(attn["mlp_c"]["kernel"]).shape[-1]
            sd[f"{base}.attn.mlp_z.weight"] = torch.zeros(C, C)
            if qkv_bias:
                sd[f"{base}.attn.mlp_z.bias"] = torch.zeros(C)
        if peg:
            pk = np.asarray(params[f"stage{i}_peg"]["kernel"])  # [3,3,3,1,C]
            sd[f"network.{ni}.1.proj.0.weight"] = _t(pk.transpose(4, 3, 0, 1, 2))
            sd[f"network.{ni}.1.proj.0.bias"] = _t(params[f"stage{i}_peg"]["bias"])
        ni += 1
        if i < len(layers) - 1 and (
                transitions[i] or embed_dims[i] != embed_dims[i + 1]):
            p = 2 if transitions[i] else 1
            dk = np.asarray(params[f"downsample{i}"]["proj"]["kernel"])
            w = dk.reshape(p, p, p, embed_dims[i], embed_dims[i + 1])
            sd[f"network.{ni}.proj.weight"] = _t(w.transpose(4, 3, 0, 1, 2))
            ni += 1
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    _linear(sd, "head", params["head"])
    return sd


def make_point_cfg(num_point, num_class, input_dim, nblocks=4, nneighbor=16,
                   transformer_dim=512, **model_kw):
    """Build the cfg namespace the reference point models read
    (cfg.num_point/num_class/input_dim + cfg.model.*)."""
    model = types.SimpleNamespace(nblocks=nblocks, nneighbor=nneighbor,
                                  transformer_dim=transformer_dim, **model_kw)
    return types.SimpleNamespace(num_point=num_point, num_class=num_class,
                                 input_dim=input_dim, model=model)

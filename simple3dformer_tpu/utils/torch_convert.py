"""DeiT torch-checkpoint -> JAX parameter conversion.

The reference downloads FB DeiT .pth checkpoints by URL and loads them into
timm VisionTransformer modules (/root/reference/models/vit_3d_2d_pretrain.py:399-432,
models/DeIT.py:67-153). This environment is zero-egress, so conversion reads a
local .pth (torch CPU is available) and maps the timm layout onto our trees:

  torch (timm)                          ours (flax)
  patch_embed.proj.weight [D,C,P,P]  -> patch_embed/kernel [(P*P*C), D]
  patch_embed.proj.bias              -> patch_embed/bias
  cls_token / pos_embed              -> cls_token / pos_embed
  blocks.N.norm{1,2}.{weight,bias}   -> core/blocks_N/norm{1,2}/{scale,bias}
  blocks.N.attn.qkv.{weight,bias}    -> core/blocks_N/attn/qkv/{kernel.T,bias}
  blocks.N.attn.proj.*               -> core/blocks_N/attn/proj/*
  blocks.N.mlp.fc{1,2}.*             -> core/blocks_N/mlp/fc{1,2}/*
  norm.{weight,bias}                 -> core/norm/{scale,bias}
  head.{weight,bias}                 -> head/{kernel.T,bias}

Like the reference's partial load ("except pos_embed and last layer" filter at
vit_3d_2d_pretrain.py:411-413), keys absent from the target tree are skipped.
"""

from __future__ import annotations

import os
import re
import warnings

import numpy as np

CKPT_DIR_ENV = "DEIT_CKPT_DIR"
DEFAULT_CKPT_DIR = "./weights"


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def fit_21k_state_dict(sd: dict) -> dict:
    """Normalize ViT-21k checkpoints to the timm layout.

    Mirrors the reference's fit_dict (vit_3d_2d_pretrain.py:16-36): strip the
    'transformer.' prefix, rename 'pwff' -> 'mlp', and concatenate separate
    proj_q/proj_k/proj_v weights into the packed qkv.
    """
    out = {}
    for k, v in sd.items():
        if "pwff" in k:
            k = k.replace("pwff", "mlp")
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        out[k] = v

    qkv_blocks = sorted({
        int(re.match(r"blocks\.(\d+)\.attn\.proj_q\.weight", k).group(1))
        for k in out if re.match(r"blocks\.(\d+)\.attn\.proj_q\.weight", k)
    })
    for i in qkv_blocks:
        for suffix in ("weight", "bias"):
            parts = [
                out.pop(f"blocks.{i}.attn.proj_{w}.{suffix}")
                for w in ("q", "k", "v")
            ]
            out[f"blocks.{i}.attn.qkv.{suffix}"] = np.concatenate(parts, axis=0)
    return out


def interpolate_pos_embed(pos: np.ndarray, n_extra_src: int,
                          n_patches_tgt: int, n_extra_tgt: int) -> np.ndarray:
    """Resize a [1, N, D] position embedding to a new patch-grid size.

    The timm recipe (resize_pos_embed) used when loading a 224-px checkpoint
    into a 384-px model (models/DeIT.py:157-186 load 384 checkpoints natively;
    this enables cross-resolution loading): split off the cls/dist tokens,
    bicubic-resize the square grid, re-concatenate. Done with torch's
    F.interpolate (align_corners=False) — conversion already requires torch,
    and this keeps bit-identical parity with timm's own resampling.
    """
    import torch
    import torch.nn.functional as F

    extra, grid = pos[:, :n_extra_src], pos[:, n_extra_src:]
    gs_src = int(round(np.sqrt(grid.shape[1])))
    gs_tgt = int(round(np.sqrt(n_patches_tgt)))
    assert gs_src * gs_src == grid.shape[1], "non-square source patch grid"
    assert gs_tgt * gs_tgt == n_patches_tgt, "non-square target patch grid"
    if gs_src != gs_tgt:
        g = torch.from_numpy(
            grid.reshape(1, gs_src, gs_src, -1).transpose(0, 3, 1, 2)
        )
        g = F.interpolate(g, size=(gs_tgt, gs_tgt), mode="bicubic",
                          align_corners=False)
        grid = g.permute(0, 2, 3, 1).reshape(1, gs_tgt * gs_tgt, -1).numpy()
    if n_extra_tgt <= n_extra_src:
        extra = extra[:, :n_extra_tgt]
    else:  # plain ckpt -> distilled model: seed dist slot from the cls slot
        pad = np.repeat(extra[:, -1:], n_extra_tgt - n_extra_src, axis=1)
        extra = np.concatenate([extra, pad], axis=1)
    return np.concatenate([extra, grid], axis=1).astype(pos.dtype)


def torch_to_jax_tree(sd: dict, scan_blocks: bool = False) -> dict:
    """Convert a timm-VisionTransformer state dict to our nested param dict.

    ``scan_blocks=True`` stacks the per-block
    weights along a leading [depth] axis under core/scan/block/...;
    False emits per-block core/blocks_i/... entries.
    """
    out: dict = {}

    def put(path: list[str], value: np.ndarray):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, v in sd.items():
        if key == "cls_token":
            put(["cls_token"], v.astype(np.float32))
        elif key == "pos_embed":
            put(["pos_embed"], v.astype(np.float32))
        elif key == "patch_embed.proj.weight":
            D = v.shape[0]
            # [D, C, P, P] -> [P, P, C, D] -> [(P P C), D]
            k = np.transpose(v, (2, 3, 1, 0)).reshape(-1, D)
            put(["patch_embed", "kernel"], k.astype(np.float32))
        elif key == "patch_embed.proj.bias":
            put(["patch_embed", "bias"], v.astype(np.float32))
        elif key in ("norm.weight", "norm.bias"):
            put(["core", "norm", "scale" if key.endswith("weight") else "bias"],
                v.astype(np.float32))
        elif key in ("head.weight", "head.bias"):
            if key.endswith("weight"):
                put(["head", "kernel"], v.T.astype(np.float32))
            else:
                put(["head", "bias"], v.astype(np.float32))
        elif key == "dist_token":
            put(["dist_token"], v.astype(np.float32))
        elif key in ("head_dist.weight", "head_dist.bias"):
            if key.endswith("weight"):
                put(["head_dist", "kernel"], v.T.astype(np.float32))
            else:
                put(["head_dist", "bias"], v.astype(np.float32))
        else:
            m = re.match(r"blocks\.(\d+)\.(.+)", key)
            if not m:
                continue
            i, rest = int(m.group(1)), m.group(2)
            base = ["core", f"blocks_{i}"]
            if rest.startswith("norm"):
                which, kind = rest.split(".")
                put(base + [which, "scale" if kind == "weight" else "bias"],
                    v.astype(np.float32))
            elif rest.startswith("attn.") or rest.startswith("mlp."):
                _, layer, kind = rest.split(".")
                group = "attn" if rest.startswith("attn.") else "mlp"
                if kind == "weight":
                    put(base + [group, layer, "kernel"], v.T.astype(np.float32))
                else:
                    put(base + [group, layer, "bias"], v.astype(np.float32))

    if scan_blocks and "core" in out:
        core = out["core"]
        block_names = sorted(
            (k for k in core if k.startswith("blocks_")),
            key=lambda s: int(s.split("_")[1]),
        )
        if block_names:
            def stack(trees):
                if isinstance(trees[0], dict):
                    return {k: stack([t[k] for t in trees]) for k in trees[0]}
                return np.stack(trees)

            stacked = stack([core.pop(b) for b in block_names])
            core["scan"] = {"block": stacked}
    return out


def merge_into(params: dict, loaded: dict, prefix: str = "") -> tuple[dict, list]:
    """Recursively copy loaded leaves whose path+shape match params."""
    merged = {}
    applied = []
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if k in loaded:
            lv = loaded[k]
            if isinstance(v, dict) and isinstance(lv, dict):
                sub, subapplied = merge_into(v, lv, path)
                merged[k] = sub
                applied.extend(subapplied)
                continue
            if not isinstance(v, dict) and np.shape(lv) == np.shape(v):
                import jax.numpy as jnp

                merged[k] = jnp.asarray(lv, dtype=v.dtype)
                applied.append(path)
                continue
        merged[k] = v
    return merged, applied


# ---------------------------------------------------------------------------
# Reference-trained checkpoint import (theirs -> ours), all model families.
#
# The reference saves two checkpoint schemes (SURVEY §5.4):
#   * DDP scripts: bare state_dict, possibly with DDP 'module.' prefixes
#     (/root/reference/train_cls_voxel.py:230,333 — epoch_best.pth)
#   * Hydra scripts: {'epoch', metrics, 'model_state_dict',
#     'optimizer_state_dict'} (/root/reference/train_partseg.py:224-237 —
#     best_model.pth)
# load_reference_checkpoint() unwraps either; the reference_*_to_jax_tree()
# converters below are the exact inverses of the test-side exporters in
# scripts/refbridge.py (which map OUR trees onto the reference's state-dict
# names — round-trip identity is pinned in tests/test_reference_import.py),
# so a reference-trained artifact loads into this framework's param /
# batch_stats trees via merge_into().
# ---------------------------------------------------------------------------


def load_reference_checkpoint(path: str) -> tuple[dict, dict]:
    """Load a reference checkpoint file -> (numpy state dict, metadata).

    Handles both reference schemes and strips DDP 'module.' prefixes.
    Metadata carries whatever non-tensor fields the hydra scheme stored
    (epoch, best metrics) — empty for the bare-state-dict scheme.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta: dict = {}
    if isinstance(obj, dict) and "model_state_dict" in obj:
        meta = {k: v for k, v in obj.items()
                if k not in ("model_state_dict", "optimizer_state_dict")}
        obj = obj["model_state_dict"]
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return sd, meta


def _inv_linear(sd: dict, name: str) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _inv_mlp2(sd: dict, name: str) -> dict:
    """torch Sequential(Linear, ReLU, Linear) -> our MLP2 {fc1, fc2}."""
    return {"fc1": _inv_linear(sd, f"{name}.0"),
            "fc2": _inv_linear(sd, f"{name}.2")}


def _inv_mlp_head(sd: dict, name: str) -> dict:
    """torch Sequential(Linear, ReLU, ...) at 0,2,4.. -> our {fc1..fcK}."""
    out, i = {}, 0
    while f"{name}.{2 * i}.weight" in sd:
        out[f"fc{i + 1}"] = _inv_linear(sd, f"{name}.{2 * i}")
        i += 1
    return out


def _inv_norm(sd: dict, name: str) -> dict:
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _inv_bn(sd: dict, name: str) -> tuple[dict, dict]:
    """torch BatchNorm entries -> (our params {scale,bias}, stats {mean,var})."""
    return (_inv_norm(sd, name),
            {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])})


def _inv_vab(sd: dict, name: str) -> dict:
    """torch Hengshuang TransformerBlock -> our VectorAttentionBlock."""
    out = {lyr: _inv_linear(sd, f"{name}.{lyr}")
           for lyr in ("fc1", "fc2", "w_qs", "w_ks", "w_vs")}
    out["fc_delta"] = _inv_mlp2(sd, f"{name}.fc_delta")
    out["fc_gamma"] = _inv_mlp2(sd, f"{name}.fc_gamma")
    return out


def _inv_sa(sd: dict, name: str) -> tuple[dict, dict]:
    """Reference PointNetSetAbstraction mlp_convs/mlp_bns (Conv2d 1x1 + BN)
    -> our {mlp_i: {conv, bn}} params + stats. The reference's dead
    last_pos_embed entries (never read in its forward) are ignored."""
    params, stats, i = {}, {}, 0
    while f"{name}.mlp_convs.{i}.weight" in sd:
        w = np.asarray(sd[f"{name}.mlp_convs.{i}.weight"])  # [out,in,1,1]
        conv = {"kernel": w[:, :, 0, 0].T,
                "bias": np.asarray(sd[f"{name}.mlp_convs.{i}.bias"])}
        bn_p, bn_s = _inv_bn(sd, f"{name}.mlp_bns.{i}")
        params[f"mlp_{i}"] = {"conv": conv, "bn": bn_p}
        stats[f"mlp_{i}"] = {"bn": bn_s}
        i += 1
    return params, stats


def _inv_linear_bn_relu(sd: dict, name: str) -> tuple[dict, dict]:
    """Reference Sequential(Linear, Swap, BN1d, Swap, ReLU) -> our
    LinearBNReLU {fc, bn} params + stats."""
    bn_p, bn_s = _inv_bn(sd, f"{name}.2")
    return ({"fc": _inv_linear(sd, f"{name}.0"), "bn": bn_p},
            {"bn": bn_s})


def reference_voxelvit_to_jax_tree(sd: dict, scan_blocks: bool = False) -> dict:
    """Feature3D_ViT2D_V2 state dict -> our VoxelViT param tree (inverse of
    scripts/refbridge.export_voxelvit_state_dict). Covers the shared
    backbone, the single-conv tokenizers (VoxelEmbed / _no_average /
    NaiveProjection: proj.conv3d_1 or proj.conv2d_1), voxel pos embed +
    head, and the group_embed route's stage-1 encoder + params."""
    out = torch_to_jax_tree(sd, scan_blocks=scan_blocks)
    for conv in ("conv3d_1", "conv2d_1"):
        key = f"voxel_embed.proj.{conv}.weight"
        if key in sd:
            w = np.asarray(sd[key])  # [D, Cin, c, c(, c)]
            out["voxel_embed"] = {
                "kernel": w.reshape(w.shape[0], -1).T,
                "bias": np.asarray(sd[f"voxel_embed.proj.{conv}.bias"]),
            }
    if "voxel_pos_embed" in sd:
        out["voxel_pos_embed"] = np.asarray(sd["voxel_pos_embed"])
    if "voxel_head.weight" in sd:
        out["voxel_head"] = _inv_linear(sd, "voxel_head")
    if "group_embed.self_attn.in_proj_weight" in sd:
        out["group_embed"] = {
            "qkv": {
                "kernel": np.asarray(
                    sd["group_embed.self_attn.in_proj_weight"]).T,
                "bias": np.asarray(sd["group_embed.self_attn.in_proj_bias"]),
            },
            "out_proj": _inv_linear(sd, "group_embed.self_attn.out_proj"),
            "linear1": _inv_linear(sd, "group_embed.linear1"),
            "linear2": _inv_linear(sd, "group_embed.linear2"),
            "norm1": _inv_norm(sd, "group_embed.norm1"),
            "norm2": _inv_norm(sd, "group_embed.norm2"),
        }
        out["group_pos_embed"] = np.asarray(sd["group_pos_embed"])
        out["group_cls_token"] = np.asarray(sd["group_cls_token"])
    return out


def reference_hengshuang_to_jax_tree(sd: dict) -> tuple[dict, dict]:
    """Reference Hengshuang PointTransformerCls/Seg state dict -> our
    (params, batch_stats) trees (inverse of refbridge.export_hengshuang_
    state_dict). The seg decoder is detected from the 'transformer2.'
    keys."""
    bb_p: dict = {"fc1_1": _inv_linear(sd, "backbone.fc1.0"),
                  "fc1_2": _inv_linear(sd, "backbone.fc1.2"),
                  "transformer1": _inv_vab(sd, "backbone.transformer1")}
    bb_s: dict = {}
    i = 0
    while f"backbone.transition_downs.{i}.sa.mlp_convs.0.weight" in sd:
        sa_p, sa_s = _inv_sa(sd, f"backbone.transition_downs.{i}.sa")
        bb_p[f"transition_downs_{i}"] = {"sa": sa_p}
        bb_s[f"transition_downs_{i}"] = {"sa": sa_s}
        bb_p[f"transformers_{i}"] = _inv_vab(sd, f"backbone.transformers.{i}")
        i += 1
    params = {"backbone": bb_p, "fc2": _inv_mlp_head(sd, "fc2")}
    stats = {"backbone": bb_s}
    if "transformer2.fc1.weight" in sd:  # seg decoder
        params["transformer2"] = _inv_vab(sd, "transformer2")
        j = 0
        while f"transition_ups.{j}.fc1.0.weight" in sd:
            fc1_p, fc1_s = _inv_linear_bn_relu(sd, f"transition_ups.{j}.fc1")
            fc2_p, fc2_s = _inv_linear_bn_relu(sd, f"transition_ups.{j}.fc2")
            params[f"transition_ups_{j}"] = {"fc1": fc1_p, "fc2": fc2_p}
            stats[f"transition_ups_{j}"] = {"fc1": fc1_s, "fc2": fc2_s}
            params[f"up_transformers_{j}"] = _inv_vab(sd, f"transformers.{j}")
            j += 1
        params["fc3"] = _inv_mlp_head(sd, "fc3")
    return params, stats


def reference_pointvit_to_jax_tree(sd: dict,
                                   scan_blocks: bool = False
                                   ) -> tuple[dict, dict]:
    """Reference 3DViT-family state dict -> our PointViT (params,
    batch_stats) trees (inverse of refbridge.export_pointvit_state_dict).

    Images variants (0_layer/1_layer/LWF — detected from 'new_head.' keys)
    keep the live 2D pathway (cls/pos/patch_embed/head); the plain 3DViT's
    point head is the reference's replaced `head`
    (/root/reference/models/3DViT/model.py:233-236) and its dead 2D
    pos_embed / PointEmbed patch_embed entries are dropped (our plain
    variant rightly has no such params)."""
    images = "new_head.weight" in sd
    params = torch_to_jax_tree(sd, scan_blocks=scan_blocks)
    if not images:
        params.pop("pos_embed", None)  # dead in the reference's point path
        params["new_head"] = params.pop("head")
    else:
        params["new_head"] = _inv_linear(sd, "new_head")
    for stem in ("fc1", "fc_pos_embed"):
        params[stem] = _inv_mlp2(sd, stem)
    stats: dict = {}
    i = 0
    while f"transition_downs.{i}.sa.mlp_convs.0.weight" in sd:
        sa_p, sa_s = _inv_sa(sd, f"transition_downs.{i}.sa")
        params[f"transition_downs_{i}"] = {"sa": sa_p}
        stats[f"transition_downs_{i}"] = {"sa": sa_s}
        i += 1
    j = 0
    while f"transition_ups.{j}.fc1.0.weight" in sd:
        fc1_p, fc1_s = _inv_linear_bn_relu(sd, f"transition_ups.{j}.fc1")
        fc2_p, fc2_s = _inv_linear_bn_relu(sd, f"transition_ups.{j}.fc2")
        params[f"transition_ups_{j}"] = {"fc1": fc1_p, "fc2": fc2_p}
        stats[f"transition_ups_{j}"] = {"fc1": fc1_s, "fc2": fc2_s}
        j += 1
    return params, stats


def reference_vip3d_to_jax_tree(sd: dict, params_template: dict) -> dict:
    """Reference VisionPermutator3D state dict -> our param tree (inverse of
    refbridge.export_vip3d_state_dict). The stage/block/downsample/PEG
    geometry is derived from OUR params_template (an initialized
    VisionPermutator3D tree of the matching config), since the reference
    flattens it into positional network.{ni}.{bj} indices; the reference's
    dead mlp_z entries are ignored."""
    out: dict = {}
    if "patch_embed.proj.conv3d_1.weight" in sd:
        w = np.asarray(sd["patch_embed.proj.conv3d_1.weight"])
        out["embed_layer"] = {
            "kernel": w.reshape(w.shape[0], -1).T,
            "bias": np.asarray(sd["patch_embed.proj.conv3d_1.bias"]),
        }
    n_stages = 1 + max(int(k.split("_")[0][5:]) for k in params_template
                       if k.startswith("stage"))
    layers = [sum(1 for k in params_template
                  if k.startswith(f"stage{i}_block")) for i in range(n_stages)]
    peg = "stage0_peg" in params_template
    ni = 0
    for i in range(n_stages):
        for b in range(layers[i]):
            bj = b + (1 if peg and b >= 1 else 0)
            base = f"network.{ni}.{bj}"
            blk = {
                "norm1": _inv_norm(sd, f"{base}.norm1"),
                "norm2": _inv_norm(sd, f"{base}.norm2"),
                "attn": {
                    **{lyr: _inv_linear(sd, f"{base}.attn.{lyr}")
                       for lyr in ("mlp_h", "mlp_w", "mlp_c", "proj")},
                    "reweight": {
                        "fc1": _inv_linear(sd, f"{base}.attn.reweight.fc1"),
                        "fc2": _inv_linear(sd, f"{base}.attn.reweight.fc2"),
                    },
                },
                "mlp": {"fc1": _inv_linear(sd, f"{base}.mlp.fc1"),
                        "fc2": _inv_linear(sd, f"{base}.mlp.fc2")},
            }
            out[f"stage{i}_block{b}"] = blk
        if peg:
            pw = np.asarray(sd[f"network.{ni}.1.proj.0.weight"])  # [C,1,3,3,3]
            out[f"stage{i}_peg"] = {
                "kernel": pw.transpose(2, 3, 4, 1, 0),
                "bias": np.asarray(sd[f"network.{ni}.1.proj.0.bias"]),
            }
        ni += 1
        if f"downsample{i}" in params_template:
            ref_k = np.asarray(sd[f"network.{ni}.proj.weight"])  # [Co,Ci,p,p,p]
            co, ci, p = ref_k.shape[0], ref_k.shape[1], ref_k.shape[2]
            out[f"downsample{i}"] = {"proj": {
                "kernel": ref_k.transpose(2, 3, 4, 1, 0).reshape(
                    p ** 3 * ci, co),
            }}
            ni += 1
    out["norm"] = _inv_norm(sd, "norm")
    out["head"] = _inv_linear(sd, "head")
    return out


def import_reference_state(params: dict, loaded: dict,
                           require_full: bool = True) -> dict:
    """merge_into() with a coverage check: every leaf of our tree must be
    filled from the reference checkpoint when require_full (the importer
    promises a complete load, not a partial one)."""
    import jax

    merged, applied = merge_into(dict(params), loaded)
    if require_full:
        n = len(jax.tree_util.tree_leaves(params))
        assert len(applied) == n, (
            f"incomplete reference import: {len(applied)}/{n} leaves "
            f"matched — first unmatched paths: "
            f"{sorted(set(_leaf_paths(params)) - set(applied))[:6]}")
    return merged


def _leaf_paths(tree: dict, prefix: str = "") -> list:
    out = []
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, path))
        else:
            out.append(path)
    return out


def find_checkpoint(backbone: str) -> str | None:
    d = os.environ.get(CKPT_DIR_ENV, DEFAULT_CKPT_DIR)
    for name in (f"{backbone}.pth", f"{backbone}.pt"):
        path = os.path.join(d, name)
        if os.path.exists(path):
            return path
    return None


def maybe_load_deit(params: dict, backbone: str):
    """Load 2D-pretrained weights into a model tree if a local .pth exists.

    Zero-egress-safe: if no checkpoint file is found, returns params unchanged
    with a warning (training then starts from random init, i.e. the
    reference's --pretrained=False path).
    """
    path = find_checkpoint(backbone)
    if path is None:
        warnings.warn(
            f"No local checkpoint for {backbone} (set ${CKPT_DIR_ENV}); "
            "continuing with random init."
        )
        return params
    scan_blocks = "scan" in params.get("core", {})  # auto-detect core layout
    sd = load_torch_state_dict(path)
    if any("proj_q" in k or k.startswith("transformer.") for k in sd):
        sd = fit_21k_state_dict(sd)  # ViT-21k layout (fit_dict parity)
    loaded = torch_to_jax_tree(sd, scan_blocks=scan_blocks)
    # Cross-resolution load (e.g. 224-px ckpt into a 384-px ViT2D): resample
    # the pos-embed grid so the leaf shape matches and merge applies it. The
    # 3D models intentionally drop pos_embed (reference's "except pos_embed"
    # filter) — their target shape never matches, so this never triggers there.
    if "pos_embed" in loaded and "pos_embed" in params:
        src, tgt = loaded["pos_embed"], params["pos_embed"]
        if np.shape(src) != np.shape(tgt) and np.shape(src)[-1] == np.shape(tgt)[-1]:
            n_extra_src = 2 if "dist_token" in loaded else 1
            n_extra_tgt = 2 if "dist_token" in params else 1
            n_patches_tgt = np.shape(tgt)[1] - n_extra_tgt
            loaded["pos_embed"] = interpolate_pos_embed(
                np.asarray(src), n_extra_src, n_patches_tgt, n_extra_tgt
            )
    merged, applied = merge_into(dict(params), loaded)
    print(f"loaded {len(applied)} tensors from {path}")
    return merged

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

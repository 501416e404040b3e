"""DeiT .pth -> JAX conversion: logits parity with a torch-oracle ViT.

Builds a tiny random timm-layout state dict, runs a hand-written torch ViT
forward as the oracle, converts the same weights into our ViT2D, and compares
logits — this is the converter check SURVEY §7.2 step 2 calls for, with a
generated checkpoint standing in for the real (non-downloadable) DeiT one.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple3dformer_tpu.nn.vit import ViT2D
from simple3dformer_tpu.utils.torch_convert import merge_into, torch_to_jax_tree

DEPTH, D, H, P, IMG = 2, 32, 4, 8, 32
N_CLS = 11


def make_torch_sd(rng, distilled=False):
    def t(*shape, scale=0.05):
        return torch.from_numpy((rng.randn(*shape) * scale).astype(np.float32))

    n_extra = 2 if distilled else 1
    sd = {
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, (IMG // P) ** 2 + n_extra, D),
        "patch_embed.proj.weight": t(D, 3, P, P),
        "patch_embed.proj.bias": t(D),
        "norm.weight": torch.ones(D) + t(D),
        "norm.bias": t(D),
        "head.weight": t(N_CLS, D),
        "head.bias": t(N_CLS),
    }
    if distilled:
        sd["dist_token"] = t(1, 1, D)
        sd["head_dist.weight"] = t(N_CLS, D)
        sd["head_dist.bias"] = t(N_CLS)
    for i in range(DEPTH):
        sd[f"blocks.{i}.norm1.weight"] = torch.ones(D) + t(D)
        sd[f"blocks.{i}.norm1.bias"] = t(D)
        sd[f"blocks.{i}.attn.qkv.weight"] = t(3 * D, D)
        sd[f"blocks.{i}.attn.qkv.bias"] = t(3 * D)
        sd[f"blocks.{i}.attn.proj.weight"] = t(D, D)
        sd[f"blocks.{i}.attn.proj.bias"] = t(D)
        sd[f"blocks.{i}.norm2.weight"] = torch.ones(D) + t(D)
        sd[f"blocks.{i}.norm2.bias"] = t(D)
        sd[f"blocks.{i}.mlp.fc1.weight"] = t(4 * D, D)
        sd[f"blocks.{i}.mlp.fc1.bias"] = t(4 * D)
        sd[f"blocks.{i}.mlp.fc2.weight"] = t(D, 4 * D)
        sd[f"blocks.{i}.mlp.fc2.bias"] = t(D)
    return sd


def torch_vit_forward(sd, x, distilled=False):
    """timm-layout ViT forward in torch (the oracle)."""
    B = x.shape[0]
    patches = F.conv2d(x, sd["patch_embed.proj.weight"],
                       sd["patch_embed.proj.bias"], stride=P)
    tokens = patches.flatten(2).transpose(1, 2)  # [B, N, D]
    cls = sd["cls_token"].expand(B, -1, -1)
    if distilled:
        dist = sd["dist_token"].expand(B, -1, -1)
        h = torch.cat([cls, dist, tokens], dim=1) + sd["pos_embed"]
    else:
        h = torch.cat([cls, tokens], dim=1) + sd["pos_embed"]
    for i in range(DEPTH):
        ln = F.layer_norm(h, (D,), sd[f"blocks.{i}.norm1.weight"],
                          sd[f"blocks.{i}.norm1.bias"], eps=1e-6)
        qkv = ln @ sd[f"blocks.{i}.attn.qkv.weight"].T + sd[f"blocks.{i}.attn.qkv.bias"]
        q, k, v = qkv.reshape(B, -1, 3, H, D // H).permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * (D // H) ** -0.5
        o = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, -1, D)
        o = o @ sd[f"blocks.{i}.attn.proj.weight"].T + sd[f"blocks.{i}.attn.proj.bias"]
        h = h + o
        ln = F.layer_norm(h, (D,), sd[f"blocks.{i}.norm2.weight"],
                          sd[f"blocks.{i}.norm2.bias"], eps=1e-6)
        m = F.gelu(ln @ sd[f"blocks.{i}.mlp.fc1.weight"].T + sd[f"blocks.{i}.mlp.fc1.bias"])
        m = m @ sd[f"blocks.{i}.mlp.fc2.weight"].T + sd[f"blocks.{i}.mlp.fc2.bias"]
        h = h + m
    h = F.layer_norm(h, (D,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    logits = h[:, 0] @ sd["head.weight"].T + sd["head.bias"]
    if distilled:  # DeiT eval: mean of the cls and distillation heads
        logits_dist = h[:, 1] @ sd["head_dist.weight"].T + sd["head_dist.bias"]
        return (logits + logits_dist) / 2.0
    return logits


def test_converted_vit_matches_torch(rng):
    sd = make_torch_sd(rng)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    ref = torch_vit_forward(sd, torch.from_numpy(x)).detach().numpy()

    model = ViT2D(embed_dim=D, depth=DEPTH, num_heads=H, patch_size=P,
                  num_classes=N_CLS, img_size=IMG)
    params = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    loaded = torch_to_jax_tree({k: v.numpy() for k, v in sd.items()})
    merged, applied = merge_into(dict(params), loaded)
    # every parameter in the model must be covered by the conversion
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert len(applied) == n_leaves

    out = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_converted_distilled_vit_matches_torch(rng):
    """DeiT distilled variant: dist token + mean-of-heads eval forward
    (/root/reference/models/DeIT.py:23-64)."""
    sd = make_torch_sd(rng, distilled=True)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    ref = torch_vit_forward(sd, torch.from_numpy(x), distilled=True).numpy()

    model = ViT2D(embed_dim=D, depth=DEPTH, num_heads=H, patch_size=P,
                  num_classes=N_CLS, img_size=IMG, distilled=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    loaded = torch_to_jax_tree({k: v.numpy() for k, v in sd.items()})
    merged, applied = merge_into(dict(params), loaded)
    assert len(applied) == len(jax.tree_util.tree_leaves(params))

    out = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_pth_roundtrip_via_maybe_load_deit(rng, tmp_path, monkeypatch):
    """Full pretrained path: torch.save a {'model': sd} checkpoint to disk,
    load through maybe_load_deit (file discovery + torch.load + conversion +
    merge), and match the torch oracle logits — the end-to-end equivalent of
    the reference's URL download + load_state_dict
    (vit_3d_2d_pretrain.py:399-432)."""
    from simple3dformer_tpu.utils.torch_convert import maybe_load_deit

    sd = make_torch_sd(rng)
    torch.save({"model": sd}, tmp_path / "deit_test_backbone.pth")
    monkeypatch.setenv("DEIT_CKPT_DIR", str(tmp_path))

    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    ref = torch_vit_forward(sd, torch.from_numpy(x)).numpy()

    model = ViT2D(embed_dim=D, depth=DEPTH, num_heads=H, patch_size=P,
                  num_classes=N_CLS, img_size=IMG)
    params = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    merged = maybe_load_deit(dict(params), "deit_test_backbone")
    out = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_fit_21k_full_model_matches_torch(rng):
    """ViT-21k checkpoint layout (transformer. prefix, pwff MLP, split
    proj_q/k/v) through fit_21k_state_dict -> identical logits. Mirrors the
    reference's fit_dict path (vit_3d_2d_pretrain.py:16-36)."""
    from simple3dformer_tpu.utils.torch_convert import fit_21k_state_dict

    sd = make_torch_sd(rng)
    sd21k = {}
    for k, v in sd.items():
        m = __import__("re").match(r"blocks\.(\d+)\.attn\.qkv\.(weight|bias)", k)
        if m:
            i, kind = m.group(1), m.group(2)
            q, kk, vv = v.chunk(3, dim=0)
            sd21k[f"transformer.blocks.{i}.attn.proj_q.{kind}"] = q
            sd21k[f"transformer.blocks.{i}.attn.proj_k.{kind}"] = kk
            sd21k[f"transformer.blocks.{i}.attn.proj_v.{kind}"] = vv
        else:
            sd21k["transformer." + k.replace(".mlp.", ".pwff.")] = v

    fixed = fit_21k_state_dict({k: v.numpy() for k, v in sd21k.items()})
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    ref = torch_vit_forward(sd, torch.from_numpy(x)).numpy()

    model = ViT2D(embed_dim=D, depth=DEPTH, num_heads=H, patch_size=P,
                  num_classes=N_CLS, img_size=IMG)
    params = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    merged, applied = merge_into(dict(params), torch_to_jax_tree(fixed))
    assert len(applied) == len(jax.tree_util.tree_leaves(params))
    out = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_pos_embed_interpolation_cross_resolution(rng, tmp_path, monkeypatch):
    """Loading a small-grid checkpoint into a double-resolution model resizes
    the pos-embed grid (timm resize_pos_embed recipe) and covers every leaf."""
    from simple3dformer_tpu.utils.torch_convert import (
        interpolate_pos_embed,
        maybe_load_deit,
    )

    sd = make_torch_sd(rng)
    torch.save(sd, tmp_path / "deit_lowres.pth")
    monkeypatch.setenv("DEIT_CKPT_DIR", str(tmp_path))

    img2 = 2 * IMG  # 4x4 patch grid -> 8x8
    model = ViT2D(embed_dim=D, depth=DEPTH, num_heads=H, patch_size=P,
                  num_classes=N_CLS, img_size=img2)
    params = model.init(jax.random.key(0), jnp.zeros((1, img2, img2, 3)))["params"]
    merged = maybe_load_deit(dict(params), "deit_lowres")

    # independent oracle for the grid resample: torch bicubic on the raw grid
    pos = sd["pos_embed"].numpy()
    gs, gt = IMG // P, img2 // P
    g = torch.from_numpy(pos[:, 1:].reshape(1, gs, gs, D).transpose(0, 3, 1, 2))
    g = F.interpolate(g, size=(gt, gt), mode="bicubic", align_corners=False)
    want_grid = g.permute(0, 2, 3, 1).reshape(1, gt * gt, D).numpy()

    got = np.asarray(merged["pos_embed"])
    np.testing.assert_allclose(got[:, :1], pos[:, :1], rtol=0, atol=0)  # cls kept
    np.testing.assert_allclose(got[:, 1:], want_grid, rtol=1e-6, atol=1e-7)

    # extra-token reconciliation: plain ckpt -> distilled model pads from cls
    out = interpolate_pos_embed(pos, 1, gt * gt, 2)
    assert out.shape == (1, gt * gt + 2, D)
    np.testing.assert_array_equal(out[:, 1], pos[:, 0])


def test_deit_factory_surface():
    """All 8 reference factory functions (models/DeIT.py:67-186) build with
    the right widths, grids, and distillation heads."""
    from simple3dformer_tpu.nn.vit import DEIT_FACTORY, deit_factory

    assert len(DEIT_FACTORY) == 8
    m = deit_factory("deit_base_distilled_patch16_384", num_classes=7)
    params = m.init(jax.random.key(0), jnp.zeros((1, 384, 384, 3)))["params"]
    assert params["pos_embed"].shape == (1, (384 // 16) ** 2 + 2, 768)
    assert "dist_token" in params and "head_dist" in params

    m = deit_factory("deit_tiny_distilled_patch16_224", num_classes=7)
    params = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))["params"]
    assert params["pos_embed"].shape == (1, 196 + 2, 192)

    m = deit_factory("deit_base_patch16_384", num_classes=7)
    params = m.init(jax.random.key(0), jnp.zeros((1, 384, 384, 3)))["params"]
    assert params["pos_embed"].shape == (1, 576 + 1, 768)
    assert "dist_token" not in params

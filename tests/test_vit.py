"""ViT block parity vs a hand-written torch oracle + VoxelViT shape checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from simple3dformer_tpu.nn.layers import Attention, Block, Mlp
from simple3dformer_tpu.nn.vit import ViT2D, ViTCore
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed, VoxelEmbedNoAverage
from simple3dformer_tpu.models.voxel_vit import VoxelViT, frozen_mask


def torch_attention(x, qkv_w, qkv_b, proj_w, proj_b, heads):
    """timm-style attention oracle in torch."""
    B, N, C = x.shape
    qkv = x @ qkv_w.T + qkv_b  # [B,N,3C]
    qkv = qkv.reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B,H,N,D]
    attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return out @ proj_w.T + proj_b


def test_attention_matches_torch(rng):
    B, N, C, H = 2, 17, 32, 4
    x = rng.randn(B, N, C).astype(np.float32)
    mod = Attention(num_heads=H)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]

    qkv_w = np.asarray(params["qkv"]["kernel"]).T  # torch is [out,in]
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_w = np.asarray(params["proj"]["kernel"]).T
    proj_b = np.asarray(params["proj"]["bias"])

    ref = torch_attention(
        torch.from_numpy(x),
        torch.from_numpy(qkv_w), torch.from_numpy(qkv_b),
        torch.from_numpy(proj_w), torch.from_numpy(proj_b),
        H,
    ).numpy()
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_block_matches_torch(rng):
    """Full pre-norm block vs torch oracle (LN -> attn -> +x; LN -> MLP -> +x)."""
    B, N, C, H = 2, 9, 16, 2
    x = rng.randn(B, N, C).astype(np.float32)
    mod = Block(num_heads=H, mlp_ratio=4.0)
    params = mod.init(jax.random.key(1), jnp.asarray(x))["params"]

    xt = torch.from_numpy(x)

    def ln(v, scale, bias):
        return F.layer_norm(
            v, (v.shape[-1],),
            torch.from_numpy(np.asarray(scale)),
            torch.from_numpy(np.asarray(bias)), eps=1e-6,
        )

    h = ln(xt, params["norm1"]["scale"], params["norm1"]["bias"])
    h = torch_attention(
        h,
        torch.from_numpy(np.asarray(params["attn"]["qkv"]["kernel"]).T),
        torch.from_numpy(np.asarray(params["attn"]["qkv"]["bias"])),
        torch.from_numpy(np.asarray(params["attn"]["proj"]["kernel"]).T),
        torch.from_numpy(np.asarray(params["attn"]["proj"]["bias"])),
        H,
    )
    xt = xt + h
    h = ln(xt, params["norm2"]["scale"], params["norm2"]["bias"])
    h = h @ torch.from_numpy(np.asarray(params["mlp"]["fc1"]["kernel"])) + \
        torch.from_numpy(np.asarray(params["mlp"]["fc1"]["bias"]))
    h = F.gelu(h)
    h = h @ torch.from_numpy(np.asarray(params["mlp"]["fc2"]["kernel"])) + \
        torch.from_numpy(np.asarray(params["mlp"]["fc2"]["bias"]))
    ref = (xt + h).numpy()

    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_vit2d_shapes():
    model = ViT2D(embed_dim=64, depth=2, num_heads=4)
    x = jnp.zeros((2, 224, 224, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1000)


@pytest.mark.parametrize(
    "mode,embed_cls",
    [
        ("default", VoxelEmbed),
        ("no_embed", VoxelEmbed),
        ("group_embed", VoxelEmbedNoAverage),
        ("weight_sharing", VoxelEmbedNoAverage),
    ],
)
def test_voxel_vit_modes(mode, embed_cls):
    emb = embed_cls(voxel_size=30, cell_size=6, patch_size=5, embed_dim=192)
    model = VoxelViT(
        voxel_embed=emb,
        n_classes=40,
        transformer_backbone="deit_tiny_patch16_224",
        pos_embedding=mode,
    )
    x = jnp.zeros((2, 30, 30, 30))
    img = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.key(0), x, img, method=model.init_all)
    out = model.apply(variables, x)
    assert out.shape == (2, 40)

    # frozen 2D pathway exists and produces ImageNet logits
    logits = model.apply(variables, img, method=model.forward_images)
    assert logits.shape == (2, 1000)

    mask = frozen_mask(variables["params"], pretrained=True)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    frozen = {jax.tree_util.keystr(p) for p, v in flat if not v}
    assert any("head" in f for f in frozen)
    assert any("patch_embed" in f for f in frozen)
    assert any("pos_embed" in f and "voxel" not in f for f in frozen)
    # 3D side trainable
    assert all("voxel" not in f for f in frozen)


def test_group_embed_empty_pillar_grads_finite():
    """Regression: a batch containing an all-empty pillar must yield finite
    gradients in pillar mode at full depth.

    With the reference's zeros-init group embeds
    (vit_3d_2d_pretrain.py:382-383), an empty pillar's sequence is exactly
    zero through the whole stack; every LayerNorm backward at those
    zero-variance rows scales the cotangent by 1/sqrt(eps)=1e3 (~3.3e3x per
    block measured), overflowing f32 to NaN by block 1 of 12 — the first
    optimizer step then wipes the params (round-5 flat-OA incident). Pillar
    mode now trunc_normal-inits the group embeds, which the stage-1 post-LN
    re-normalizes to unit-variance rows; reference_bug mode keeps zeros (its
    batch-mixing blends empty pillars, so it never degenerates).
    """
    import optax

    emb = VoxelEmbedNoAverage(voxel_size=16, cell_size=4, patch_size=4,
                              embed_dim=192)
    for axes in ("pillar", "reference_bug"):
        model = VoxelViT(
            voxel_embed=emb, n_classes=8,
            transformer_backbone="deit_tiny_patch16_224",
            pos_embedding="group_embed", group_axes=axes, group_pack=1)
        # sample 0: one occupied cell only (15 of 16 pillars empty);
        # sample 1: fully occupied (keeps the batch non-degenerate overall)
        x = jnp.zeros((2, 16, 16, 16)).at[0, 0, 0, 0].set(1.0).at[1].set(1.0)
        img = jnp.zeros((1, 224, 224, 3))
        variables = jax.jit(
            lambda k, a, b, m=model: m.init(k, a, b, method=m.init_all)
        )(jax.random.key(0), x, img)
        y = jnp.array([0, 1])

        def loss_fn(params, m=model):
            out = m.apply({"params": params}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        bad = [
            jax.tree_util.keystr(p)
            for p, g in jax.tree_util.tree_leaves_with_path(grads)
            if not bool(jnp.all(jnp.isfinite(g)))
        ]
        assert not bad, f"non-finite grads in {axes} mode: {bad[:6]}"

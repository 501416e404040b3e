"""Parity against the REFERENCE'S OWN model code (imported from
/root/reference via scripts/refbridge — never copied).

Forward parity: our flax VoxelViT and the reference Feature3D_ViT2D_V2
(vit_3d_2d_pretrain.py:275-526, with the timm symbols it imports provided by
refbridge's timm-0.3.2-semantics shim) produce the same logits from the same
weights, on both the voxel route and the frozen-2D image route. Residual
tolerance is dominated by tanh-GELU (flax nn.gelu) vs erf-GELU (timm):
measured max|diff| ~4e-5 (voxel) / ~9e-5 (image) at unit-scale logits over
a 12-deep backbone.

Accuracy parity: scaled-down version of scripts/accuracy_parity.py — both
frameworks train from identical weights on identical batches and converge
to the same test accuracy. Full-depth measured runs live in BASELINE.md.
"""

import importlib.util
import pathlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn import vit as vit_mod
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed

_SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, _SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


refbridge = _load("refbridge")

V, CELL, P = 16, 4, 4


def _build_pair(backbone, n_classes, seed=0):
    """Our VoxelViT + the reference model loaded with OUR init weights."""
    ref_vit = refbridge.load_reference_module("models.vit_3d_2d_pretrain")
    ref_emb = refbridge.load_reference_module("models.embed_layer_3d_modality")
    D = vit_mod.BACKBONES[backbone]["embed_dim"]
    model = VoxelViT(
        voxel_embed=VoxelEmbed(voxel_size=V, cell_size=CELL, patch_size=P,
                               embed_dim=D),
        n_classes=n_classes, transformer_backbone=backbone,
        pos_embedding="default")
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(seed), jnp.zeros((2, V, V, V)),
      jnp.zeros((1, 224, 224, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    torch.manual_seed(seed)
    ref_model = ref_vit.Feature3D_ViT2D_V2(
        n_classes=n_classes,
        embed_layer=ref_emb.VoxelEmbed(voxel_size=V, cell_size=CELL,
                                       patch_size=P, embed_dim=D),
        transformer_backbone=backbone, pretrained=False,
        pos_embedding="default")
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_voxelvit_state_dict(params_np, cell_size=CELL),
        strict=False)
    # 1:1 state-dict correspondence — nothing of ours is unmapped, nothing
    # of the reference's is left at its own init
    assert not missing and not unexpected, (missing, unexpected)
    ref_model.eval()
    return model, variables, ref_model


def test_voxelvit_forward_matches_reference_code(rng):
    model, variables, ref_model = _build_pair("deit_tiny_patch16_224", 7)
    x = (rng.rand(2, V, V, V) > 0.7).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x[:, None])).numpy()
    ours = np.asarray(model.apply({"params": variables["params"]},
                                  jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_forward_images_matches_reference_code(rng):
    model, variables, ref_model = _build_pair("deit_tiny_patch16_224", 7)
    img = rng.randn(2, 224, 224, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = ref_model.forward_images(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply({"params": variables["params"]},
                                  jnp.asarray(img),
                                  method=model.forward_images))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_reference_no_embed_route_is_broken_as_documented():
    """The reference's no_embed route never creates voxel_pos_embed when the
    2D grid is the standard 196 patches (vit_3d_2d_pretrain.py:376-378 guard
    vs :461 read) — our implementation honors the declared intent instead
    (models/voxel_vit.py docstring). Pin the latent breakage so the deviation
    stays justified."""
    ref_vit = refbridge.load_reference_module("models.vit_3d_2d_pretrain")
    ref_emb = refbridge.load_reference_module("models.embed_layer_3d_modality")
    torch.manual_seed(0)
    m = ref_vit.Feature3D_ViT2D_V2(
        n_classes=3,
        embed_layer=ref_emb.VoxelEmbed(voxel_size=V, cell_size=CELL,
                                       patch_size=P, embed_dim=192),
        transformer_backbone="deit_tiny_patch16_224", pretrained=False,
        pos_embedding="no_embed")
    with pytest.raises(AttributeError):
        with torch.no_grad():
            m(torch.zeros(1, 1, V, V, V))


@pytest.mark.slow
def test_accuracy_parity_voxel_small(monkeypatch):
    """Scaled-down scripts/accuracy_parity.run_voxel: a 2-deep backbone is
    registered under a test-only name in BOTH frameworks' config dicts (the
    production entries are all depth 12 — full-depth numbers live in
    BASELINE.md), then both sides train from identical weights on identical
    batches and must converge to the same test accuracy."""
    ap = _load("accuracy_parity")
    ref_vit = refbridge.load_reference_module("models.vit_3d_2d_pretrain")
    name = "accparity_tiny"
    tiny = dict(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                mlp_ratio=4.0, qkv_bias=True)
    monkeypatch.setitem(vit_mod.BACKBONES, name, tiny)
    import functools

    ref_cfg = dict(tiny)
    # the reference's config dicts all use eps=1e-6 (vit_3d_2d_pretrain.py:287)
    ref_cfg["norm_layer"] = functools.partial(torch.nn.LayerNorm, eps=1e-6)
    monkeypatch.setitem(
        ref_vit.Feature3D_ViT2D_V2._Feature3D_ViT2D_V2__valid_model,
        name, ref_cfg)
    monkeypatch.setitem(
        ref_vit.Feature3D_ViT2D_V2._Feature3D_ViT2D_V2__valid_model_pretrain_dict_url,
        name, "unused://")

    r = ap.run_voxel(epochs=4, batch=16, n_train=512, n_test=512,
                     backbone=name, lr=1e-3)
    assert r["best_jax"] > 0.4 and r["best_ref"] > 0.4, r
    assert r["gap_pts"] <= 1.5, r

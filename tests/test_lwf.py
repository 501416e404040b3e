"""LwF distillation: dual-batch train step + full CLI drive."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple3dformer_tpu.cli import train_partseg_lwf
from simple3dformer_tpu.data.pipeline import DeviceResidentDataset
from simple3dformer_tpu.models.voxel_vit import VoxelViT, frozen_mask
from simple3dformer_tpu.nn.vit import ViT2D
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed
from simple3dformer_tpu.train.loop import create_train_state
from simple3dformer_tpu.train.lwf import make_scanned_lwf_train_steps, normalize_images
from simple3dformer_tpu.train.optim import make_optimizer

pytestmark = pytest.mark.heavy  # see pyproject markers: quick loop excludes these


def test_normalize_images():
    img = np.full((1, 2, 2, 3), 255, np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    np.testing.assert_allclose(
        out[0, 0, 0], (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )


def test_lwf_step_voxel_model(rng):
    """Voxel LwF (train_cls_voxel.py --lwf path): joint loss decreases and the
    frozen 2D head receives zero updates."""
    emb = VoxelEmbed(voxel_size=12, cell_size=4, patch_size=3, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=5,
                     transformer_backbone="deit_tiny_patch16_224", img_size=32)
    teacher = ViT2D(embed_dim=64, depth=1, num_heads=2, img_size=32)

    x0 = jnp.zeros((2, 12, 12, 12))
    img0 = jnp.zeros((2, 32, 32, 3))
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(0), x0, img0)
    t_vars = jax.jit(teacher.init)(jax.random.key(1), img0)

    params = variables["params"]
    head_before = np.asarray(params["head"]["kernel"]).copy()
    voxel_head_before = np.asarray(params["voxel_head"]["kernel"]).copy()
    tx = make_optimizer("Adam", trainable_mask=frozen_mask(params, True))
    state = create_train_state(params, tx)

    task_ds = DeviceResidentDataset({
        "x": (rng.rand(16, 12, 12, 12) > 0.8).astype(np.uint8),
        "y": rng.randint(0, 5, size=(16,)).astype(np.int32),
    })
    image_ds = DeviceResidentDataset({
        "images": (rng.rand(16, 32, 32, 3) * 255).astype(np.uint8),
    })
    run = make_scanned_lwf_train_steps(
        model, teacher, t_vars["params"], tx, task_ds, image_ds
    )
    idx = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)
    state, metrics = run(state, idx, idx, 1e-3, jax.random.key(2))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert metrics["task_loss"].shape == (4,)
    # frozen 2D head unchanged
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["kernel"]), head_before
    )
    # trainable 3D side moved
    assert not np.allclose(
        np.asarray(state.params["voxel_head"]["kernel"]), voxel_head_before
    )


def test_load_images_shared_contract():
    """train.lwf.load_images is the one image-loading contract both LwF CLIs
    use (the voxel --lwf CLI used to fake a config object to reuse the hydra
    loader, and that shim broke once when image_canvas was added)."""
    from simple3dformer_tpu.train import lwf

    imgs = lwf.load_images("/nonexistent", synthetic=16, seed=9)
    assert imgs.shape == (256, lwf.IMAGE_CANVAS, lwf.IMAGE_CANVAS, 3)
    assert imgs.dtype == np.uint8
    # canvas override flows through (the knob that broke the old shim)
    small = lwf.load_images("/nonexistent", synthetic=16, seed=9, canvas=64)
    assert small.shape == (256, 64, 64, 3)
    # deterministic in the seed
    np.testing.assert_array_equal(
        imgs, lwf.load_images("/nonexistent", synthetic=16, seed=9))

    # hydra adapter passes its keys through to the same function
    class Cfg(dict):
        synthetic = 8
        seed = 3
        imagenet_data_path = "/nonexistent"

    Cfg_inst = Cfg(image_canvas=32)
    via_cfg = train_partseg_lwf.load_images(Cfg_inst)
    np.testing.assert_array_equal(
        via_cfg, lwf.load_images("/nonexistent", synthetic=8, seed=3,
                                 canvas=32))


def test_train_partseg_lwf_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    iou = train_partseg_lwf.main([
        "model=3DViT_1_layer", "model.transformer_backbone=deit_tiny_patch16_224",
        "model.pretrained=false", "synthetic=16", "batch_size=4", "epoch=1",
        "num_point=32", "model.nneighbor=4", "M=4",
    ])
    assert 0.0 <= iou <= 1.0

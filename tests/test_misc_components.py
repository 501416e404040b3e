"""PointEmbed, legacy voxel model, voxel affine augmentation, whole-scene eval."""

import io

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.data import binvox, voxel_augment
from simple3dformer_tpu.models.legacy_voxel import FeatureVoxel2DViT
from simple3dformer_tpu.nn.point_embed import PointEmbed


def test_point_embed_shapes(rng):
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    mod = PointEmbed(embed_dim=64, npoint=16, nsample=8)
    variables = jax.jit(mod.init)(jax.random.key(0), x)
    new_xyz, feats = mod.apply(variables, x)
    assert new_xyz.shape == (2, 16, 3)
    assert feats.shape == (2, 16, 16)  # embed_dim // 4


def test_legacy_voxel_model(rng):
    model = FeatureVoxel2DViT(n_classes=10, voxel_size=32,
                              transformer_backbone="deit_tiny_patch16_224")
    x = jnp.asarray((rng.rand(2, 32, 32, 32) > 0.7).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)

    model2 = FeatureVoxel2DViT(n_classes=10, voxel_size=32, two_layer_head=True,
                               transformer_backbone="deit_tiny_patch16_224")
    v2 = jax.jit(model2.init)(jax.random.key(0), x)
    assert model2.apply(v2, x).shape == (2, 10)


def test_rotvec_to_matrix():
    R = voxel_augment.rotvec_to_matrix(np.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(
        voxel_augment.rotvec_to_matrix(np.zeros(3)), np.eye(3)
    )


def test_affine_voxel_augmentation(rng):
    data = np.zeros((16, 16, 16), dtype=bool)
    data[4:12, 4:12, 4:12] = True  # solid centered cube
    v = binvox.Voxels(data, [16, 16, 16], [0.0, 0.0, 0.0], 1.0, "xyz")
    buf = io.BytesIO()
    binvox.write(v, buf)
    buf.seek(0)
    aug = voxel_augment.add_affine_transformation_to_voxel(
        buf, rng=np.random.RandomState(9)
    )
    assert aug.data.shape == (16, 16, 16)
    n_orig, n_aug = data.sum(), aug.data.sum()
    # volume roughly preserved (rotation+jitter may merge/split voxels)
    assert 0.5 * n_orig < n_aug < 2.0 * n_orig


def test_s3dis_whole_scene(tmp_path, rng):
    from simple3dformer_tpu.data.datasets import S3DISWholeScene

    for name in ["Area_5_office_1.npy", "Area_1_office_2.npy"]:
        pts = np.zeros((5000, 7))
        pts[:, 0:2] = rng.rand(5000, 2) * 3  # 3m x 3m room
        pts[:, 2] = rng.rand(5000) * 2
        pts[:, 3:6] = rng.randint(0, 255, size=(5000, 3))
        pts[:, 6] = rng.randint(0, 13, size=5000)
        np.save(tmp_path / name, pts)

    ds = S3DISWholeScene(str(tmp_path), block_points=512, split="test",
                         test_area=5, rng=np.random.RandomState(0))
    assert len(ds) == 1  # only the Area_5 room
    data, labels, weight, idx = ds[0]
    assert data.shape[1:] == (512, 9)
    assert labels.shape == weight.shape == idx.shape == data.shape[:2]
    # every point of the room appears at least once
    assert len(np.unique(idx)) == 5000
    assert ds.labelweights.shape == (13,)


def test_run_dir_provenance(tmp_path):
    """run_dir writes resolved_config.json + a copy of the chosen model's
    source (the reference's Hydra provenance trick, train_cls.py:67)."""
    import json
    import os

    from simple3dformer_tpu.cli._common import run_dir
    from simple3dformer_tpu.core.config import Config

    cfg = Config.from_dict({
        "out_dir": str(tmp_path / "runs"),
        "model": {"name": "3DViT", "transformer_backbone": "deit_tiny",
                  "pretrained": False},
    })
    d = run_dir(cfg, "cls")
    payload = json.load(open(os.path.join(d, "resolved_config.json")))
    assert payload["config"]["model"]["name"] == "3DViT"
    assert isinstance(payload["argv"], list)
    assert os.path.exists(os.path.join(d, "point_vit.py"))

    cfg2 = cfg.copy()
    cfg2.model.name = "Hengshuang"
    d2 = run_dir(cfg2, "cls")
    assert os.path.exists(os.path.join(d2, "hengshuang.py"))

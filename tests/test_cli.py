"""End-to-end CLI drives on the virtual CPU mesh (synthetic data, tiny dims)."""

import numpy as np
import pytest

from simple3dformer_tpu.cli import (
    train_cls,
    train_cls_scanobjectnn,
    train_cls_voxel,
    train_partseg,
    train_pure_mlp,
    train_s3dis_semseg,
)


def test_train_cls_voxel_cli(tmp_path):
    acc = train_cls_voxel.main([
        "--dataset", "ModelNet40", "--synthetic", "64", "--batchSize", "8",
        "--epochs", "2", "--transformer-name", "deit_tiny_patch16_224",
        "--embed-layer", "VoxelEmbed", "--cell-size", "6", "--patch-size", "5",
        "--lr", "1e-3", "--outf", str(tmp_path),
    ])
    assert 0.0 <= acc <= 1.0


def test_train_cls_cli_hengshuang(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    acc = train_cls.main([
        "model=Hengshuang", "synthetic=48", "batch_size=8", "epoch=2",
        "num_point=32", "model.nneighbor=4", "model.nblocks=1",
        "model.transformer_dim=16",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_cls_scanobjectnn_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    acc = train_cls_scanobjectnn.main([
        "model=Hengshuang", "synthetic=48", "batch_size=8", "epoch=1",
        "num_point=32", "model.nneighbor=4", "model.nblocks=1",
        "model.transformer_dim=16",
    ])
    assert 0.0 <= acc <= 1.0


def test_train_partseg_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    iou = train_partseg.main([
        "model=3DViT_1_layer", "model.transformer_backbone=deit_tiny_patch16_224",
        "synthetic=24", "batch_size=4", "epoch=1", "num_point=32",
        "model.nneighbor=4",
    ])
    assert 0.0 <= iou <= 1.0


def test_train_s3dis_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    miou = train_s3dis_semseg.main([
        "model=3DViT_s3dis", "model.transformer_backbone=deit_tiny_patch16_224",
        "synthetic=16", "batch_size=4", "epoch=1", "num_point=64",
        "model.nneighbor=4",
    ])
    assert 0.0 <= miou <= 1.0


def test_train_pure_mlp_cli(tmp_path):
    acc = train_pure_mlp.main([
        "--dataset", "ModelNet40", "--synthetic", "32", "--batchSize", "8",
        "--epochs", "1", "--model-name", "vip3d_s7",
        "--embed-layer", "VoxelEmbed_m40_vip_s7", "--outf", str(tmp_path),
    ])
    assert 0.0 <= acc <= 1.0


def test_train_cls_voxel_cli_lwf(tmp_path):
    """The --lwf branch (teacher + joint loss + image canvas) must run
    end-to-end; regression for the _ImgCfg.get breakage (2026-08-17)."""
    acc = train_cls_voxel.main([
        "--dataset", "ModelNet40", "--synthetic", "32", "--batchSize", "8",
        "--epochs", "1", "--transformer-name", "deit_tiny_patch16_224",
        "--embed-layer", "VoxelEmbed", "--cell-size", "6", "--patch-size", "5",
        "--lr", "1e-3", "--lwf", "--outf", str(tmp_path),
    ])
    assert 0.0 <= acc <= 1.0


def test_train_cls_voxel_cli_real_tree(tmp_path):
    """The non-synthetic branch: a real on-disk ModelNet binvox tree loaded
    through dataset.materialize (native bulk ingest with numpy fallback)."""
    import os

    import numpy as np

    from simple3dformer_tpu.data import binvox

    rng = np.random.RandomState(0)
    root = tmp_path / "mn10"
    for cls_name, n_tr, n_te in [("bathtub", 10, 4), ("chair", 10, 4)]:
        for split, n in (("train", n_tr), ("test", n_te)):
            d = root / cls_name / split
            os.makedirs(d)
            for i in range(n):
                v = binvox.Voxels(rng.rand(30, 30, 30) > 0.8, [30] * 3,
                                  [0.0] * 3, 1.0, "xyz")
                with open(d / f"{cls_name}_{i:04d}.binvox", "wb") as f:
                    binvox.write(v, f)
    acc = train_cls_voxel.main([
        "--dataset", "ModelNet10", "--data-root", str(root),
        "--batchSize", "4", "--epochs", "1", "--reweighted",
        "--transformer-name", "deit_tiny_patch16_224",
        "--embed-layer", "VoxelEmbed", "--cell-size", "6", "--patch-size", "5",
        "--lr", "1e-3", "--outf", str(tmp_path / "out"),
    ])
    assert 0.0 <= acc <= 1.0

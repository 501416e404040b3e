"""Visualization CLIs: rollout math + end-to-end png output."""

import os

import numpy as np

from simple3dformer_tpu.cli import visualize_attention_map_voxel, visualize_point_cloud
from simple3dformer_tpu.utils.attention_rollout import rollout


def test_rollout_math(rng):
    L, H, N = 3, 2, 10  # 9 patch tokens + cls -> grid 3
    att = np.abs(rng.rand(L, H, N, N)).astype(np.float32)
    att = att / att.sum(-1, keepdims=True)
    mask, joint, grid = rollout(att)
    assert grid == 3
    assert mask.shape == (3, 3)
    # joint attentions stay row-stochastic
    np.testing.assert_allclose(joint[-1].sum(-1), 1.0, rtol=1e-5)


def test_visualize_attention_cli(tmp_path):
    results = visualize_attention_map_voxel.main([
        "--dataset", "ModelNet40", "--synthetic", "4", "--n-samples", "2",
        "--transformer-name", "deit_tiny_patch16_224",
        "--cell-size", "6", "--patch-size", "5",
        "--outf", str(tmp_path),
    ])
    assert len(results) == 2
    for out_dir, mask in results:
        assert os.path.exists(os.path.join(out_dir, "attn_final.png"))
        assert os.path.exists(os.path.join(out_dir, "attn_voxels_3d.png"))
        assert mask.shape == (5, 5)


def test_visualize_point_cloud_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    outs = visualize_point_cloud.main([
        "model=3DViT_1_layer", "model.transformer_backbone=deit_tiny_patch16_224",
        "synthetic=8", "num_point=32", "model.nneighbor=4", "n_samples=2",
        f"vis_dir={tmp_path}/seg_vis",
    ])
    assert len(outs) == 2
    assert all(os.path.exists(p) for p in outs)

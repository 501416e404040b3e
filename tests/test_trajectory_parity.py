"""Training-trajectory parity vs full torch mirrors (VERDICT round-2 #1).

The harness (scripts/trajectory_parity.py) trains the production jax loop and
a hand-written torch mirror from identical weights/data/batches/Adam config.
Tolerances here carry ~25-100x margin over the measured deltas (recorded in
BASELINE.md round-3):

* VoxelViT (pure-LayerNorm transformer): continuous loss landscape, so the
  two executors track to f32 noise for the whole exactness window —
  measured max |dloss| 1.0e-5 over 40 steps; asserted < 1e-3.
* Hengshuang (FPS/kNN/BatchNorm): the discrete sampling ops make the
  landscape piecewise — the first FP-noise-induced index flip (observed
  around step ~25-40) ends bit-level tracking by construction. Exactness is
  asserted over the first 10 steps (measured 4e-4; asserted < 1e-2), then
  the *trend* must match: windowed mean losses within 10% (measured 1.6%)
  and final train accuracies within 0.15 (measured 0.002).
"""

import importlib.util
import pathlib

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "trajectory_parity",
    pathlib.Path(__file__).resolve().parent.parent / "scripts" /
    "trajectory_parity.py",
)
tp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tp)


@pytest.mark.slow
def test_voxel_vit_trajectory_tracks_torch():
    r = tp.run_voxel(steps=60)
    d = np.abs(r["jax_loss"][:40] - r["torch_loss"][:40])
    assert d.max() < 1e-3, f"exactness window diverged: max |dloss|={d.max()}"
    mj, mt = r["jax_loss"][-50:].mean(), r["torch_loss"][-50:].mean()
    assert abs(mj - mt) / mt < 0.02, f"trend gap {mj} vs {mt}"
    aj, at = r["jax_acc"][-50:].mean(), r["torch_acc"][-50:].mean()
    assert abs(aj - at) < 0.1, f"train-acc gap {aj} vs {at}"
    # both actually learned (not matching-by-saturation at chance level)
    assert aj > 0.8 and at > 0.8


@pytest.mark.slow
def test_hengshuang_trajectory_tracks_torch():
    # 150 steps: past the mid-descent region where the post-index-flip
    # trajectories have their largest absolute spread (BASELINE.md round-3
    # table), into the converged regime where both settle on the same optimum.
    r = tp.run_hengshuang(steps=150)
    d = np.abs(r["jax_loss"][:10] - r["torch_loss"][:10])
    assert d.max() < 1e-2, f"exactness window diverged: max |dloss|={d.max()}"
    mj, mt = r["jax_loss"][-50:].mean(), r["torch_loss"][-50:].mean()
    # near-zero losses make relative gaps meaningless; assert both converged
    # and the absolute gap is small (measured 0.004; 20x margin)
    assert mj < 0.15 and mt < 0.15, f"failed to converge: {mj} vs {mt}"
    assert abs(mj - mt) < 0.08, f"trend gap {mj} vs {mt}"
    aj, at = r["jax_acc"][-50:].mean(), r["torch_acc"][-50:].mean()
    assert abs(aj - at) < 0.15, f"train-acc gap {aj} vs {at}"
    assert aj > 0.8 and at > 0.8


@pytest.mark.slow
def test_partseg_trajectory_tracks_torch():
    """3DViT_1_layer part segmentation (one-hot category concat via the
    partseg CLI's prepare_fn + per-point CE): like Hengshuang, the FPS/kNN/BN
    ops make the landscape piecewise — bit-level tracking holds for the first
    ~15 steps (measured 3e-7 at step 9), then the trend must match (measured
    last-50-window gap 0.66%, final accs 0.976 vs 0.977 at 150 steps)."""
    r = tp.run_partseg(steps=150)
    d = np.abs(r["jax_loss"][:10] - r["torch_loss"][:10])
    assert d.max() < 1e-3, f"exactness window diverged: max |dloss|={d.max()}"
    mj, mt = r["jax_loss"][-50:].mean(), r["torch_loss"][-50:].mean()
    assert mj < 0.15 and mt < 0.15, f"failed to converge: {mj} vs {mt}"
    assert abs(mj - mt) < 0.05, f"trend gap {mj} vs {mt}"
    aj, at = r["jax_acc"][-50:].mean(), r["torch_acc"][-50:].mean()
    assert abs(aj - at) < 0.1, f"train-acc gap {aj} vs {at}"
    # both learned the category-conditioned labeling (chance = 0.5): the
    # one-hot channels were actually consumed through prepare_fn
    assert aj > 0.9 and at > 0.9


@pytest.mark.slow
def test_lwf_trajectory_tracks_torch():
    """The LwF two-term loss (task CE + lambda * distillation CE against a
    frozen teacher's argmax labels) tracks the torch mirror per term —
    evidence the reference's central mechanism trains identically, teacher
    labels included (a single disagreeing argmax label would move lwf_loss
    by ~1/batch ~ 6e-2, 3 orders above the tolerance)."""
    r = tp.run_lwf(steps=60)
    d = np.abs(r["jax_loss"][:40] - r["torch_loss"][:40])
    assert d.max() < 1e-3, f"exactness window diverged: max |dloss|={d.max()}"
    d_task = np.abs(r["jax_task"][:40] - r["torch_task"][:40]).max()
    d_lwf = np.abs(r["jax_lwf"][:40] - r["torch_lwf"][:40]).max()
    assert d_task < 1e-3, f"task-loss term diverged: {d_task}"
    assert d_lwf < 1e-3, f"lwf-loss term diverged: {d_lwf}"
    mj, mt = r["jax_loss"][-20:].mean(), r["torch_loss"][-20:].mean()
    assert abs(mj - mt) / mt < 0.02, f"trend gap {mj} vs {mt}"
    assert r["torch_acc"][-20:].mean() > 0.8  # the task is actually learned


@pytest.mark.slow
def test_vip3d_trajectory_tracks_torch():
    """ViP-3D (permute-MLP mixes + softmax reweight gate + transition
    downsample): continuous landscape like VoxelViT, so the torch mirror
    must track to f32 noise (measured 2e-6 over 50 steps)."""
    r = tp.run_vip3d(steps=60)
    d = np.abs(r["jax_loss"][:40] - r["torch_loss"][:40])
    assert d.max() < 1e-3, f"exactness window diverged: max |dloss|={d.max()}"
    mj, mt = r["jax_loss"][-20:].mean(), r["torch_loss"][-20:].mean()
    assert abs(mj - mt) / mt < 0.02, f"trend gap {mj} vs {mt}"
    aj, at = r["jax_acc"][-20:].mean(), r["torch_acc"][-20:].mean()
    assert abs(aj - at) < 0.1 and aj > 0.7

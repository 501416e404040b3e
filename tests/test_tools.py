"""Offline tooling: renderer + S3DIS collector end-to-end on tiny inputs."""

import io
import os

import numpy as np

from simple3dformer_tpu.data import binvox
from simple3dformer_tpu.tools import collect_s3dis, save_render


def _write_binvox(path, grid):
    v = binvox.Voxels(grid, list(grid.shape), [0.0, 0.0, 0.0], 1.0, "xyz")
    with open(path, "wb") as f:
        binvox.write(v, f)


def test_render_tree(tmp_path, rng):
    model_dir = tmp_path / "02691156" / "model_a" / "models"
    model_dir.mkdir(parents=True)
    grid = rng.rand(16, 16, 16) > 0.8
    _write_binvox(str(model_dir / "model.solid.binvox"), grid)

    outs = save_render.generate_fixed_view_rendering(
        str(tmp_path), out_root=str(tmp_path / ".tmp")
    )
    assert len(outs) == 1
    assert outs[0].endswith(os.path.join("02691156", "model_a.png"))
    assert os.path.getsize(outs[0]) > 1000


def test_collect_s3dis(tmp_path, rng):
    anno = tmp_path / "Area_1" / "office_1" / "Annotations"
    anno.mkdir(parents=True)
    for name in ["chair_1.txt", "wall_3.txt", "staris_1.txt"]:  # typo on purpose
        pts = np.hstack([rng.rand(20, 3) * 5, rng.randint(0, 255, (20, 3))])
        np.savetxt(anno / name, pts)

    outs = collect_s3dis.collect_dataset(str(tmp_path), str(tmp_path / "out"))
    assert len(outs) == 1
    data = np.load(outs[0])
    assert data.shape == (60, 7)
    assert data[:, :3].min() >= 0  # shifted to origin
    labels = set(data[:, 6].astype(int))
    # chair=8, wall=2, staris->clutter=12
    assert labels == {8, 2, 12}

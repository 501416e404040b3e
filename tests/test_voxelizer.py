"""Native C++ voxelizer: geometry correctness + OFF/OBJ -> binvox e2e."""

import numpy as np
import pytest

from simple3dformer_tpu.data import binvox
from simple3dformer_tpu.tools import voxelize as vx

CUBE_VERTS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.float32)
CUBE_TRIS = np.array([
    [0, 2, 1], [0, 3, 2],  # bottom
    [4, 5, 6], [4, 6, 7],  # top
    [0, 1, 5], [0, 5, 4],
    [1, 2, 6], [1, 6, 5],
    [2, 3, 7], [2, 7, 6],
    [3, 0, 4], [3, 4, 7],
], dtype=np.int32)


@pytest.fixture(scope="module")
def lib():
    vx.build_library()
    return True


def test_cube_solid_fills_grid(lib):
    grid = vx.voxelize(CUBE_VERTS, CUBE_TRIS, dim=8, solid=True)
    assert grid.all()  # unit cube spans the full normalized grid


def test_cube_surface_is_hollow(lib):
    grid = vx.voxelize(CUBE_VERTS, CUBE_TRIS, dim=8, solid=False)
    assert grid[0].all() and grid[-1].all()  # faces occupied
    assert not grid[4, 4, 4]  # interior empty


def test_small_cube_centered(lib):
    """A cube half the bounding extent of the scene stays centered."""
    verts = np.vstack([CUBE_VERTS * 0.5 + 0.25, [[0, 0, 0]], [[1, 1, 1]]]).astype(
        np.float32
    )  # two far corners define the bounding cube
    grid = vx.voxelize(verts, CUBE_TRIS, dim=16, solid=True)
    occ = np.argwhere(grid)
    # roughly the middle half of the grid (corners contribute nothing)
    assert occ.min() >= 3 and occ.max() <= 12
    assert grid[8, 8, 8]


def test_triangle_rasterization_touches_diagonal(lib):
    verts = np.array([[0, 0, 0], [1, 1, 1], [1, 0, 1]], dtype=np.float32)
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    grid = vx.voxelize(verts, tris, dim=8, solid=False)
    assert grid[0, 0, 0] and grid[7, 7, 7]  # endpoints covered
    assert grid.sum() >= 8


def test_off_obj_to_binvox(tmp_path, lib):
    off = tmp_path / "cube.off"
    lines = ["OFF", "8 12 0"]
    lines += [" ".join(map(str, v)) for v in CUBE_VERTS.tolist()]
    lines += ["3 " + " ".join(map(str, t)) for t in CUBE_TRIS.tolist()]
    off.write_text("\n".join(lines) + "\n")
    out = vx.mesh_to_binvox(str(off), dim=8)
    with open(out, "rb") as f:
        model = binvox.read_as_3d_array(f)
    assert model.data.all()

    obj = tmp_path / "cube.obj"
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in CUBE_VERTS.tolist()]
    lines += [f"f {t[0]+1} {t[1]+1} {t[2]+1}" for t in CUBE_TRIS.tolist()]
    obj.write_text("\n".join(lines) + "\n")
    out = vx.mesh_to_binvox(str(obj), dim=8)
    with open(out, "rb") as f:
        model2 = binvox.read_as_3d_array(f)
    np.testing.assert_array_equal(model2.data, model.data)


def test_fix_off_header():
    fixed = vx.fix_off_header("OFF8 12 0\nrest")
    assert fixed.startswith("OFF\n8 12 0\n")
    assert vx.fix_off_header("OFF\n8 12 0\nrest") == "OFF\n8 12 0\nrest"

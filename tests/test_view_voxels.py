"""viewvox-rebuild renderer: hollowing, projections, slices, CLI."""

import numpy as np
import pytest

from simple3dformer_tpu.data import binvox
from simple3dformer_tpu.tools import view_voxels


@pytest.fixture(scope="module")
def solid_cube():
    g = np.zeros((16, 16, 16), np.uint8)
    g[4:12, 4:12, 4:12] = 1
    return g


def _coverage(img):
    """Fraction of non-background (non-white) pixels."""
    return float((img != 255).any(-1).mean())


def test_hollow_matches_numpy_oracle(solid_cube):
    got = view_voxels.hollow(solid_cube)
    g = solid_cube.astype(bool)
    padded = np.pad(g, 1)
    interior = np.ones_like(g)
    for ax, sh in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
        interior &= np.roll(padded, sh, axis=ax)[1:-1, 1:-1, 1:-1]
    want = (g & ~interior).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # an 8^3 solid block keeps exactly its 8^3 - 6^3 shell
    assert got.sum() == 8 ** 3 - 6 ** 3


def test_render_orthographic_and_perspective(solid_cube):
    for persp in (False, True):
        img = view_voxels.render(solid_cube, width=96, height=80,
                                 perspective=persp)
        assert img.shape == (80, 96, 3) and img.dtype == np.uint8
        cov = _coverage(img)
        assert 0.05 < cov < 0.9, f"persp={persp}: coverage {cov}"
    # deterministic
    a = view_voxels.render(solid_cube, width=64, height=64)
    b = view_voxels.render(solid_cube, width=64, height=64)
    np.testing.assert_array_equal(a, b)


def test_render_axis_views_see_object(solid_cube):
    for view, (azim, elev) in view_voxels._AXIS_VIEWS.items():
        img = view_voxels.render(solid_cube, width=48, height=48,
                                 azim=azim, elev=elev)
        assert _coverage(img) > 0.05, f"view {view} missed the object"


def test_alt_colors_and_shading(solid_cube):
    img = view_voxels.render(solid_cube, width=96, height=96,
                             alt_colors=True)
    fg = img[(img != 255).any(-1)]
    # checkerboard + per-face shading -> several distinct foreground colours
    assert len(np.unique(fg, axis=0)) >= 3


def test_slice_mode(solid_cube):
    full = view_voxels.render(solid_cube, width=64, height=64, elev=80.0)
    sl = view_voxels.render(solid_cube, width=64, height=64, elev=80.0,
                            slice_axis=2, slice_index=6, keep_internal=True)
    assert 0 < _coverage(sl) <= _coverage(full) + 1e-9
    # a slice outside the grid is rejected
    with pytest.raises(ValueError):
        view_voxels.render(solid_cube, slice_axis=2, slice_index=99)
    # neighbours widen (or keep) the visible set, never shrink it
    sl2 = view_voxels.render(solid_cube, width=64, height=64, elev=80.0,
                             slice_axis=2, slice_index=6, neighbours=2,
                             keep_internal=True)
    assert _coverage(sl2) >= _coverage(sl)


def test_cli_end_to_end(tmp_path, solid_cube):
    p = tmp_path / "cube.binvox"
    v = binvox.Voxels(solid_cube.astype(bool), [16, 16, 16], [0.0] * 3, 1.0,
                      "xyz")
    with open(p, "wb") as f:
        binvox.write(v, f)
    out = view_voxels.main([str(p), "-o", str(tmp_path / "cube.png"),
                            "--width", "64", "--height", "64",
                            "--view", "z", "--alt-colors"])
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0
    out2 = view_voxels.main([str(p), "-o", str(tmp_path / "s.png"),
                             "--slice", "z:8", "--neighbours", "1", "--ki",
                             "--perspective", "--width", "32",
                             "--height", "32"])
    assert os.path.exists(out2)

"""Native C++ binvox ingest vs the numpy codec: bit-exactness + bulk paths.

Files are generated at the raw-format level (hand-built header + RLE
payload) so both decoders are tested against the format itself, including
non-cubic dims where the x-z-y file-order transpose is easy to get wrong.
"""

import io
import os

import numpy as np
import pytest

from simple3dformer_tpu.data import binvox, datasets, native_ingest
from simple3dformer_tpu.data.classmaps import CLASSES_ModelNet10


def _raw_binvox_bytes(flat: np.ndarray, dims) -> bytes:
    """Hand-rolled binvox file: dims header + RLE pairs over flat (file
    order), runs capped at 255 like the real format."""
    out = bytearray()
    out += b"#binvox 1\n"
    out += ("dim " + " ".join(str(d) for d in dims) + "\n").encode()
    out += b"translate 0 0 0\nscale 1.0\ndata\n"
    flat = flat.astype(np.uint8)
    i = 0
    while i < flat.size:
        v = int(flat[i])
        run = 1
        while i + run < flat.size and flat[i + run] == v and run < 255:
            run += 1
        out += bytes((v, run))
        i += run
    return bytes(out)


@pytest.fixture(scope="module")
def native_ok():
    if not native_ingest.available():
        pytest.skip("native ingest toolchain unavailable")
    return True


@pytest.mark.parametrize("dims", [(16, 16, 16), (6, 4, 5), (1, 7, 3)])
@pytest.mark.parametrize("fix_coords", [True, False])
def test_decode_matches_numpy_codec(native_ok, rng, dims, fix_coords):
    flat = (rng.rand(int(np.prod(dims))) > 0.6)
    raw = _raw_binvox_bytes(flat, dims)
    want = binvox.read_as_3d_array(io.BytesIO(raw), fix_coords=fix_coords)
    got = native_ingest.decode_bytes(raw, dims, fix_coords=fix_coords)
    assert got.shape == want.data.shape
    np.testing.assert_array_equal(got.astype(bool), want.data)


def test_decode_long_runs(native_ok):
    # all-one grid: max-length 255 runs + remainder
    dims = (8, 9, 10)
    flat = np.ones(int(np.prod(dims)), np.uint8)
    raw = _raw_binvox_bytes(flat, dims)
    got = native_ingest.decode_bytes(raw, dims)
    assert got.shape == (8, 10, 9)  # transpose(0, 2, 1) of header dims
    assert got.min() == 1 and got.max() == 1


def test_read_dims_and_materialize_bulk(native_ok, tmp_path, rng):
    dims = (12, 10, 11)
    paths, wants = [], []
    for i in range(23):
        flat = rng.rand(int(np.prod(dims))) > (0.2 + 0.03 * i)
        raw = _raw_binvox_bytes(flat, dims)
        p = tmp_path / f"g{i:03d}.binvox"
        p.write_bytes(raw)
        paths.append(str(p))
        wants.append(
            binvox.read_as_3d_array(io.BytesIO(raw)).data.astype(np.uint8))
    assert native_ingest.read_dims(paths[0]) == dims
    for threads in (1, 4):
        got = native_ingest.materialize(paths, threads=threads)
        np.testing.assert_array_equal(got, np.stack(wants))


def test_materialize_error_paths(native_ok, tmp_path, rng):
    dims = (4, 4, 4)
    good = tmp_path / "good.binvox"
    good.write_bytes(_raw_binvox_bytes(rng.rand(64) > 0.5, dims))
    with pytest.raises(IOError, match="dims"):
        native_ingest.materialize([str(good)], dims=(5, 4, 4))
    with pytest.raises(IOError):
        native_ingest.materialize([str(tmp_path / "missing.binvox")],
                                  dims=dims)
    bad = tmp_path / "bad.binvox"
    bad.write_bytes(b"#binvox 1\ndim 4 4 4\ndata\n" + bytes([1, 70]))
    with pytest.raises(IOError, match="payload"):
        native_ingest.materialize([str(good), str(bad)], dims=dims)
    trunc = tmp_path / "trunc.binvox"
    trunc.write_bytes(b"not a binvox")
    with pytest.raises(IOError, match="header"):
        native_ingest.materialize([str(trunc)], dims=dims)


def test_numpy_fallback_matches(tmp_path, rng, monkeypatch):
    """With the native lib forced off, materialize produces the same
    arrays through the pure-numpy codec."""
    dims = (8, 8, 8)
    paths = []
    for i in range(4):
        raw = _raw_binvox_bytes(rng.rand(512) > 0.5, dims)
        p = tmp_path / f"f{i}.binvox"
        p.write_bytes(raw)
        paths.append(str(p))
    native = (native_ingest.materialize(paths)
              if native_ingest.available() else None)
    monkeypatch.setattr(native_ingest, "_lib", None)
    monkeypatch.setattr(native_ingest, "_lib_error", "forced off (test)")
    fallback = native_ingest.materialize(paths)
    assert not native_ingest.available()
    if native is not None:
        np.testing.assert_array_equal(native, fallback)
    want = []
    for p in paths:
        with open(p, "rb") as f:
            want.append(binvox.read_as_3d_array(f).data.astype(np.uint8))
    np.testing.assert_array_equal(fallback, np.stack(want))


def _modelnet_tree(tmp_path, rng):
    for cls_name, n in [("bathtub", 3), ("chair", 2)]:
        for i in range(n):
            d = tmp_path / cls_name / "train"
            os.makedirs(d, exist_ok=True)
            (d / f"{cls_name}_{i:04d}.binvox").write_bytes(
                _raw_binvox_bytes(rng.rand(16 ** 3) > 0.8, (16, 16, 16)))


def test_dataset_materialize_equals_getitem_loop(tmp_path, rng):
    _modelnet_tree(tmp_path, rng)
    ds = datasets.ModelNetVoxelDataset(str(tmp_path), CLASSES_ModelNet10,
                                       "train")
    x, y = ds.materialize()
    assert x.dtype == np.uint8 and y.dtype == np.int32
    assert x.shape == (5, 16, 16, 16)
    for i in range(len(ds)):
        s = ds[i]
        np.testing.assert_array_equal(x[i], s["voxel"].astype(np.uint8))
        assert y[i] == s["cls_idx"]
    # subset selection keeps (path, label) pairing
    xs, ys = ds.materialize(indices=[3, 1])
    np.testing.assert_array_equal(xs[0], x[3])
    np.testing.assert_array_equal(xs[1], x[1])
    assert ys[0] == y[3] and ys[1] == y[1]

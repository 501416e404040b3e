"""Native (C++) binvox ingest: multithreaded bulk decode of dataset splits.

Rebuilds the host-side hot loop of the reference's data path — per-sample
binvox RLE decode inside DataLoader workers
(/root/reference/data/modelnet40.py:35 -> utils/binvox_rw.py:117-151) —
as a thread-pooled C++ library that decodes an entire file list into one
contiguous ``[n, *grid]`` uint8 array. This framework stages datasets to
TPU HBM once (data/pipeline.DeviceResidentDataset), so decode is a startup
cost; this library turns the ShapeNetV2-scale startup (~52k files of 128^3)
from minutes of single-threaded numpy into seconds.

Built on demand with g++ (same pattern as tools/voxelize.py); every result
is bit-identical to data/binvox.read_as_3d_array (tests enforce it on
non-cubic grids, both axis orders). Fallback to the numpy codec when the
toolchain is unavailable or ``S3F_NATIVE_INGEST=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent
_LIB_PATH = _SRC_DIR / "libingest.so"

_ERRORS = {
    -1: "open/read failed",
    -2: "malformed binvox header",
    -3: "grid dims do not match the expected dims",
    -4: "RLE payload does not cover the grid exactly",
    -5: "odd RLE payload byte count",
}

_lib = None
_lib_error: str | None = None


def _build() -> None:
    src = _SRC_DIR / "ingest.cpp"
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
         "-o", str(_LIB_PATH), str(src)],
        check=True, capture_output=True,
    )


def _load():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    if os.environ.get("S3F_NATIVE_INGEST", "1") == "0":
        _lib_error = "disabled via S3F_NATIVE_INGEST=0"
        return None
    try:
        src = _SRC_DIR / "ingest.cpp"
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < src.stat().st_mtime):
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.s3f_decode_binvox.restype = ctypes.c_int
        lib.s3f_decode_binvox.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.s3f_read_dims.restype = ctypes.c_int
        lib.s3f_read_dims.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.s3f_materialize.restype = ctypes.c_int
        lib.s3f_materialize.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure -> fallback
        _lib_error = f"native ingest unavailable ({e}); using numpy codec"
    return _lib


def available() -> bool:
    """True when the native library is (or can be) loaded."""
    return _load() is not None


def _out_shape(dims, fix_coords: bool):
    # binvox file order is [d0][d1][d2]; fix_coords applies transpose(0,2,1)
    d0, d1, d2 = dims
    return (d0, d2, d1) if fix_coords else (d0, d1, d2)


def read_dims(path: str) -> tuple[int, int, int]:
    """Header-only dims of a binvox file (shape discovery for materialize)."""
    lib = _load()
    if lib is None:
        from .. import binvox

        with open(path, "rb") as f:
            dims, _, _ = binvox.read_header(f)
        return tuple(dims)
    out = np.zeros(3, np.int64)
    rc = lib.s3f_read_dims(os.fsencode(path),
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"{path}: {_ERRORS.get(rc, rc)}")
    return tuple(int(v) for v in out)


def decode_bytes(file_bytes: bytes, dims, fix_coords: bool = True) -> np.ndarray:
    """Decode one in-memory binvox file to a dense uint8 grid (0/1)."""
    lib = _load()
    dims = tuple(int(d) for d in dims)
    if lib is None:
        import io

        from .. import binvox

        v = binvox.read_as_3d_array(io.BytesIO(file_bytes), fix_coords)
        return v.data.astype(np.uint8)
    out = np.empty(_out_shape(dims, fix_coords), np.uint8)
    rc = lib.s3f_decode_binvox(
        file_bytes, len(file_bytes), out.ctypes.data_as(ctypes.c_void_p),
        dims[0], dims[1], dims[2], int(fix_coords))
    if rc != 0:
        raise IOError(f"binvox decode failed: {_ERRORS.get(rc, rc)}")
    return out


def materialize(paths, dims=None, fix_coords: bool = True,
                threads: int | None = None) -> np.ndarray:
    """Bulk-decode ``paths`` into one ``[n, *grid]`` uint8 array (0/1).

    ``dims``: expected header dims of every file (a mismatch raises). When
    None, discovered from the first file's header. ``threads`` defaults to
    ``os.cpu_count()``. Matches a loop of binvox.read_as_3d_array exactly.
    """
    paths = list(paths)
    if not paths:
        raise ValueError("materialize: empty path list")
    if dims is None:
        dims = read_dims(paths[0])
    dims = tuple(int(d) for d in dims)
    shape = _out_shape(dims, fix_coords)
    lib = _load()
    if lib is None:
        from .. import binvox

        out = np.empty((len(paths),) + shape, np.uint8)
        for i, p in enumerate(paths):
            with open(p, "rb") as f:
                v = binvox.read_as_3d_array(f, fix_coords)
            if tuple(v.dims) != dims:
                raise IOError(f"{p}: {_ERRORS[-3]}")
            out[i] = v.data
        return out
    out = np.empty((len(paths),) + shape, np.uint8)
    enc = [os.fsencode(p) for p in paths]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    err_index = ctypes.c_int64(-1)
    nthreads = threads if threads is not None else (os.cpu_count() or 1)
    rc = lib.s3f_materialize(
        arr, len(enc), out.ctypes.data_as(ctypes.c_void_p),
        dims[0], dims[1], dims[2], int(fix_coords), int(nthreads),
        ctypes.byref(err_index))
    if rc != 0:
        bad = paths[err_index.value] if 0 <= err_index.value < len(paths) \
            else "<unknown>"
        raise IOError(f"{bad}: {_ERRORS.get(rc, rc)}")
    return out

"""Host-ingest A/B: numpy binvox codec vs the native C++ bulk materializer.

Generates synthetic binvox trees at the two production grid sizes
(ModelNet 30^3, ShapeNetV2 128^3 solid — RLE-friendly solid blobs, like
real data) and times three decode paths over the same file list:

  numpy      loop of data/binvox.read_as_3d_array (the fallback path; also
             what the reference's DataLoader does per sample, binvox_rw.py)
  native x1  data/native_ingest.materialize(threads=1)
  native xN  threads=os.cpu_count()

This is a HOST benchmark (startup materialization before HBM staging);
run on the TPU host for the recorded numbers. On a 1-core host xN == x1.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple3dformer_tpu.data import binvox, native_ingest  # noqa: E402


def solid_blob(dim, rng):
    """Solid ellipsoid occupancy — long RLE runs like real solid binvox."""
    c = rng.uniform(0.35, 0.65, 3) * dim
    r = rng.uniform(0.2, 0.45, 3) * dim
    g = np.stack(np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1)
    return (((g - c) / r) ** 2).sum(-1) <= 1.0


def write_tree(root, n, dim, rng):
    paths = []
    for i in range(n):
        v = binvox.Voxels(solid_blob(dim, rng), [dim] * 3, [0.0] * 3, 1.0,
                          "xyz")
        p = os.path.join(root, f"m{i:04d}.binvox")
        with open(p, "wb") as f:
            binvox.write(v, f)
        paths.append(p)
    return paths


def t_numpy(paths):
    t0 = time.perf_counter()
    out = []
    for p in paths:
        with open(p, "rb") as f:
            out.append(binvox.read_as_3d_array(f).data)
    arr = np.stack(out).astype(np.uint8)
    return time.perf_counter() - t0, arr


def t_native(paths, threads):
    t0 = time.perf_counter()
    arr = native_ingest.materialize(paths, threads=threads)
    return time.perf_counter() - t0, arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n30", type=int, default=2000)
    ap.add_argument("--n128", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    rng = np.random.RandomState(9)
    ncpu = os.cpu_count() or 1
    print(f"native available: {native_ingest.available()} | cores: {ncpu}")

    for dim, n in ((30, args.n30), (128, args.n128)):
        with tempfile.TemporaryDirectory() as root:
            paths = write_tree(root, n, dim, rng)
            mb = sum(os.path.getsize(p) for p in paths) / 1e6
            dense_mb = n * dim ** 3 / 1e6
            print(f"\n[{dim}^3 x {n}] files {mb:.1f} MB on disk, "
                  f"{dense_mb:.0f} MB dense")
            ref = None
            for name, fn in (("numpy", lambda: t_numpy(paths)),
                             ("native x1", lambda: t_native(paths, 1)),
                             (f"native x{ncpu}",
                              lambda: t_native(paths, ncpu))):
                best, arr = min((fn() for _ in range(args.reps)),
                                key=lambda r: r[0])
                if ref is None:
                    ref = arr
                    base = best
                else:
                    assert np.array_equal(arr.astype(bool), ref.astype(bool))
                print(f"  {name:12s} {best * 1e3:8.1f} ms "
                      f"({n / best:7.0f} files/sec, "
                      f"{dense_mb / best:6.0f} MB/s dense) "
                      f"x{base / best:.2f} vs numpy")


if __name__ == "__main__":
    main()

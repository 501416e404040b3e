"""Micro-benchmark: Pallas kernels vs lax reference ops on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernels.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.kernels.fps import fps_pallas
from simple3dformer_tpu.kernels.knn import knn_pallas
from simple3dformer_tpu.ops import pointops


def _sync(out):
    """True device sync: fetch one element (block_until_ready can return
    early on the tunneled axon backend)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.RandomState(9)
    print("devices:", jax.devices())

    for B, N, k in [(32, 1024, 16), (8, 4096, 16)]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))

        def lax_knn_fn(x):
            old = pointops.USE_PALLAS_KNN
            pointops.USE_PALLAS_KNN = False
            try:
                return pointops.knn_indices(x, x, k)
            finally:
                pointops.USE_PALLAS_KNN = old

        lax_knn = jax.jit(lax_knn_fn)
        pal_knn = jax.jit(lambda x: knn_pallas(x, x, k)[0])
        t_lax = timeit(lax_knn, xyz)
        t_pal = timeit(pal_knn, xyz)
        # agreement check (distance values, tie-robust)
        d = pointops.square_distance(xyz, xyz)
        dl = jnp.sort(jnp.take_along_axis(d, lax_knn(xyz), -1), -1)
        dp = jnp.sort(jnp.take_along_axis(d, pal_knn(xyz), -1), -1)
        ok = bool(jnp.allclose(dl, dp, rtol=1e-3, atol=1e-4))
        print(f"knn  B={B} N={N} k={k}: lax {t_lax:.2f} ms | pallas {t_pal:.2f} ms "
              f"| {t_lax/t_pal:.2f}x | match={ok}")

        npoint = N // 4
        # force the lax path for the baseline (auto-dispatch would pick pallas)
        def lax_fps_fn(x):
            old = pointops.USE_PALLAS_FPS
            pointops.USE_PALLAS_FPS = False
            try:
                return pointops.farthest_point_sample(x, npoint)
            finally:
                pointops.USE_PALLAS_FPS = old

        lax_fps = jax.jit(lax_fps_fn)
        pal_fps = jax.jit(lambda x: fps_pallas(x, npoint))
        t_lax = timeit(lax_fps, xyz)
        t_pal = timeit(pal_fps, xyz)
        a = np.asarray(lax_fps(xyz))
        b = np.asarray(pal_fps(xyz))
        n_diff = int((a != b).sum())
        print(f"fps  B={B} N={N} S={npoint}: lax {t_lax:.2f} ms | pallas "
              f"{t_pal:.2f} ms | {t_lax/t_pal:.2f}x | diffs={n_diff}")


if __name__ == "__main__":
    main()

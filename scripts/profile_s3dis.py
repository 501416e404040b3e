"""Component-level timing of the S3DIS semseg step on the real chip.

Isolates the candidates for the ~90 ms/step (batch 4, N=4096): FPS scan,
kNN, the two TransitionDowns, the 1025-token deit_base ViT core, and the
TransitionUps. Each timing jits a lax.scan of REPS carry-dependent calls
(see scripts/_timing.py: loop-invariant bodies get hoisted by XLA LICM, so
the old fixed-input protocol under-reported; per-dispatch tunnel overhead
still amortizes) and synchronizes by fetching a scalar (block_until_ready
returns early on this backend — CLAUDE.md).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REPS = 20
B, N, K = 4, 4096, 16


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _timing import timeit as _honest_timeit  # noqa: E402


def timeit(name, fn, *args):
    """Honest scan timing (see scripts/_timing.py — the earlier inline
    protocol here was invalidated by XLA while-loop LICM hoisting the
    loop-invariant body; absolute ms it reported were unreliable)."""
    return _honest_timeit(name, fn, *args, reps=REPS)


def main():
    from simple3dformer_tpu.kernels.fps import fps_pallas
    from simple3dformer_tpu.kernels.knn import knn_pallas
    from simple3dformer_tpu.nn.vit import ViTCore
    from simple3dformer_tpu.ops import pointops

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    xyz1k = xyz[:, :1024]

    timeit("fps XLA scan N=4096 npoint=4096",
           lambda a: pointops.farthest_point_sample(a, N), xyz)
    timeit("fps XLA scan N=4096 npoint=1024",
           lambda a: pointops.farthest_point_sample(a, 1024), xyz)
    timeit("fps pallas N=4096 npoint=4096", lambda a: fps_pallas(a, N), xyz)
    timeit("fps pallas N=4096 npoint=1024", lambda a: fps_pallas(a, 1024), xyz)

    timeit("knn XLA  4096x4096 k=16",
           lambda a: jax.lax.top_k(-pointops.square_distance(a, a), K)[1], xyz)
    timeit("knn pallas 4096x4096 k=16", lambda a: knn_pallas(a, a, K)[0], xyz)
    timeit("knn XLA  1024x1024 k=16",
           lambda a: jax.lax.top_k(-pointops.square_distance(a, a), K)[1], xyz1k)

    # neighborhood MLP block shaped like level-0 SA: [B,N,K,195] -> 384 -> 384
    w1 = jnp.asarray(rng.randn(195, 384).astype(np.float32)) * 0.02
    w2 = jnp.asarray(rng.randn(384, 384).astype(np.float32)) * 0.02
    g = jnp.asarray(rng.rand(B, N, K, 195).astype(np.float32))

    def sa_mlp(g):
        h = jax.nn.relu(g @ w1)
        h = jax.nn.relu(h @ w2)
        return jnp.max(h, axis=2)

    timeit("SA MLP fwd [4,4096,16,195->384->384]+max", sa_mlp, g)

    # ViT core fwd+bwd at 1025 tokens, deit_base
    core = ViTCore(depth=12, num_heads=12)
    tok = jnp.asarray(rng.randn(B, 1025, 768).astype(np.float32) * 0.02)
    params = jax.jit(core.init)(jax.random.key(0), tok)["params"]

    def core_step(p, t):
        def loss(p):
            return jnp.sum(core.apply({"params": p}, t) ** 2)

        l, gr = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), gr, jnp.float32(0)
        )

    timeit("ViT core deit_base 1025 tok fwd+bwd", core_step, params, tok)

    timeit("three_nn_interpolate 4096<-1024 D=384",
           lambda a, b: pointops.three_nn_interpolate(
               a, b, jnp.ones((B, 1024, 384))), xyz, xyz1k)

    # --- fwd+bwd of the SA neighborhood MLPs (the two TransitionDowns) ---
    def sa_fwd_bwd(cin, cout, n, dtype):
        w1 = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.02)
        w2 = jnp.asarray(rng.randn(cout, cout).astype(np.float32) * 0.02)
        g = jnp.asarray(rng.rand(B, n, K, cin).astype(np.float32))

        def loss(w1, w2, g):
            h = jax.nn.relu((g.astype(dtype) @ w1.astype(dtype)))
            h = jax.nn.relu(h @ w2.astype(dtype))
            return jnp.sum(jnp.max(h, axis=2).astype(jnp.float32) ** 2)

        def step(w1, w2, g):
            l, gr = jax.value_and_grad(loss, argnums=(0, 1))(w1, w2, g)
            return l + jnp.sum(jnp.abs(gr[0])) + jnp.sum(jnp.abs(gr[1]))

        return timeit(f"SA MLP f/b [{B},{n},{K},{cin}->{cout}] {dtype.__name__}",
                      step, w1, w2, g)

    sa_fwd_bwd(195, 384, 4096, jnp.float32)
    sa_fwd_bwd(195, 384, 4096, jnp.bfloat16)
    sa_fwd_bwd(387, 768, 1024, jnp.float32)
    sa_fwd_bwd(387, 768, 1024, jnp.bfloat16)

    # neighborhood gather fwd+bwd: [B,N,C] -> [B,N,K,C] via take_along_axis
    feats = jnp.asarray(rng.rand(B, N, 192).astype(np.float32))
    idxn = jnp.asarray(rng.randint(0, N, size=(B, N, K)).astype(np.int32))

    def gather_loss(f, i):
        return jnp.sum(pointops.index_points(f, i) ** 2)

    def gather_step(f, i):
        l, gr = jax.value_and_grad(gather_loss)(f, i)
        return l + jnp.sum(jnp.abs(gr))

    timeit("gather f/b [4,4096,16,192]", gather_step, feats, idxn)

    # ViT core bf16
    core_bf = ViTCore(depth=12, num_heads=12, dtype=jnp.bfloat16)

    def core_step_bf(p, t):
        def loss(p):
            return jnp.sum(core_bf.apply({"params": p}, t).astype(jnp.float32) ** 2)

        l, gr = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), gr, jnp.float32(0)
        )

    timeit("ViT core deit_base 1025 tok f/b bf16", core_step_bf, params, tok)


if __name__ == "__main__":
    main()

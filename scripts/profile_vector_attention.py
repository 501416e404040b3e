"""Component-level timing of the Hengshuang vector-attention block.

The [B,N,K,Dm] neighborhood chain (fc_delta MLP -> fc_gamma MLP -> softmax ->
weighted sum, reference Hengshuang/transformer.py:29-42) is the point models'
HBM hot spot: at transformer1 shape (B=64, N=1024, K=16, Dm=512) each f32
intermediate is 2.1 GB and XLA cannot fuse matmul->matmul chains, so ~6 of
them round-trip HBM per forward. This script times the block fwd+bwd on the
real chip in f32/bf16 with the XLA path vs the fused Pallas kernel, plus the
isolated sub-parts (gathers, MLP chain). Timing protocol mirrors
scripts/profile_s3dis.py: scan REPS calls inside one jit, sync by scalar
fetch (block_until_ready returns early on the tunneled backend — CLAUDE.md).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REPS = 10
B, N, K, DM, DP = 64, 1024, 16, 512, 32


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
    from simple3dformer_tpu.nn.vector_attention import VectorAttentionBlock

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, DP).astype(np.float32) * 0.1)

    only = next((a for a in sys.argv[1:] if a in ("f32", "bf16")), None)
    dtypes = {None: (jnp.float32, jnp.bfloat16), "f32": (jnp.float32,),
              "bf16": (jnp.bfloat16,)}[only]
    for dtype in dtypes:
        blk = VectorAttentionBlock(d_model=DM, k=K, dtype=dtype)
        params = jax.jit(blk.init)(jax.random.key(0), xyz, feats)["params"]

        def fwd(p, x, f):
            out, _ = blk.apply({"params": p}, x, f)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def step(p, x, f):
            l, gr = jax.value_and_grad(fwd)(p, x, f)
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                gr, jnp.float32(0))

        tag = dtype.__name__
        timeit(f"vec-attn blk fwd      [B{B},N{N},K{K},D{DM}] {tag}",
               lambda x, f, p=params: fwd(p, x, f), xyz, feats)
        timeit(f"vec-attn blk fwd+bwd  [B{B},N{N},K{K},D{DM}] {tag}",
               lambda p, x, f: step(p, x, f), params, xyz, feats)


if __name__ == "__main__":
    main()


def full_model(batch_sizes=(32, 64), dtypes=("float32",)):
    """Full PointTransformerCls fwd+bwd at the cls recipe (N=1024, nblocks=4)."""
    from simple3dformer_tpu.models.hengshuang import PointTransformerCls

    rng = np.random.RandomState(1)
    for tag in dtypes:
        dtype = jnp.bfloat16 if tag == "bf16" else jnp.float32
        for bsz in batch_sizes:
            x = jnp.asarray(rng.rand(bsz, 1024, 6).astype(np.float32))
            model = PointTransformerCls(num_point=1024, num_class=40,
                                        input_dim=6, dtype=dtype)
            variables = jax.jit(model.init)(jax.random.key(0), x)
            params, bstats = variables["params"], variables["batch_stats"]

            def loss(p, x):
                out, _ = model.apply(
                    {"params": p, "batch_stats": bstats}, x,
                    deterministic=False, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)

            def step(p, x):
                l, gr = jax.value_and_grad(loss)(p, x)
                return l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                    gr, jnp.float32(0))

            dt = timeit(f"PointTransformerCls f/b B={bsz} {tag}", step, params, x)
            print(f"    -> {bsz / dt * 1000:.1f} samples/sec")


if __name__ == "__main__" and "--full" in sys.argv:
    full_model()

"""Honest component profile of the Hengshuang step (carry-dependent inputs).

The older scan-timing protocol (profile_s3dis.py style: scan REPS calls of a
fixed-input fn) is INVALID on this stack: XLA's while-loop LICM hoists the
entire loop-invariant body, so the scan measures ONE execution divided by
REPS (verified 2026-08-16: full Hengshuang step 22 ms "invariant" vs 193 ms
with a carry-dependent input — the latter matches the e2e CLI rate).

Protocol here: every timed fn takes (c, *args) and must mix the f32 scalar
carry c into its inputs (x + c * 1e-12) so each iteration depends on the
previous one. Sync by scalar fetch as always.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REPS = 10


def timeit(name, fn, *args):
    """fn(c, *args) -> array; c is the f32 carry (0.0 on the first rep)."""

    def scanned(*a):
        def body(c, _):
            r = fn(c, *a)
            return c + r.reshape(-1)[0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return out

    f = jax.jit(scanned)
    float(f(*args))
    t0 = time.time()
    float(f(*args))
    dt = (time.time() - t0) / REPS * 1000
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main(B=64, dtype=jnp.bfloat16, tag="bf16"):
    from simple3dformer_tpu.kernels.vector_attention import (
        fused_vector_attention, vector_attention_reference)  # noqa: F401
    from simple3dformer_tpu.nn.vector_attention import VectorAttentionBlock
    from simple3dformer_tpu.ops import pointops

    N, K, D = 1024, 16, 512
    key = jax.random.key(0)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 5)
        xyz = jax.random.uniform(ks[0], (B, N, 3))
        q = (jax.random.normal(ks[1], (B, N, D)) * 0.3).astype(dtype)
        k = (jax.random.normal(ks[2], (B, N, K, D)) * 0.3).astype(dtype)
        v = (jax.random.normal(ks[3], (B, N, K, D)) * 0.3).astype(dtype)
        rel = jax.random.normal(ks[4], (B, N, K, 3)).astype(dtype)
        idx = jax.random.randint(ks[0], (B, N, K), 0, N)
        return xyz, q, k, v, rel, idx

    xyz, q, k, v, rel, idx = mk(key)
    W = {n: jax.random.normal(jax.random.key(i), s, jnp.float32) * 0.05
         for i, (n, s) in enumerate(
             [("wd1", (3, D)), ("bd1", (D,)), ("wd2", (D, D)), ("bd2", (D,)),
              ("wg1", (D, D)), ("bg1", (D,)), ("wg2", (D, D)), ("bg2", (D,))])}

    def gnorm(g):
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
            g, jnp.float32(0))

    # --- index ops ---
    timeit(f"knn pallas {N}x{N} B={B}",
           lambda c, a: pointops.knn_indices(a + c * 1e-12, a, K)[..., :1]
           .astype(jnp.float32), xyz)
    timeit(f"fps 1024->256 B={B}",
           lambda c, a: pointops.farthest_point_sample(a + c * 1e-12, 256)
           [..., :1].astype(jnp.float32), xyz)

    # --- gathers ---
    def gather_fb(c, f, i):
        f = f + (c * 1e-12).astype(f.dtype)
        l, g = jax.value_and_grad(
            lambda f: jnp.sum(pointops.index_points(f, i)
                              .astype(jnp.float32) ** 2))(f)
        return l + gnorm(g)

    timeit(f"gather f/b [B,{N},{K},{D}] {tag}", gather_fb, q, idx)

    # --- the attention chain: XLA (pre-gathered) vs fused (in-kernel gather) ---
    def chain_xla_fb(c, q, k, v, rel, W):
        q = q + (c * 1e-12).astype(q.dtype)

        def loss(q, W):
            o = vector_attention_reference(q, k, v, rel, W)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(q, W)
        return l + gnorm(g)

    def chain_fused_fb(c, q, kall, vall, idx, rel, W):
        q = q + (c * 1e-12).astype(q.dtype)

        def loss(q, kall, vall, W):
            o = fused_vector_attention(q, kall, vall, idx, rel, W, 32, False)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            q, kall, vall, W)
        return l + gnorm(g)

    kall = q * 0.7 + 0.1
    vall = q * 0.4 - 0.2
    timeit(f"chain XLA (pre-gathered) f/b B={B} {tag}",
           lambda c, *a: chain_xla_fb(c, *a), q, k, v, rel, W)
    timeit(f"gather-fused kernel f/b B={B} {tag}",
           lambda c, *a: chain_fused_fb(c, *a), q, kall, vall, idx, rel, W)

    # --- whole block (gathers + projections + chain + residual) ---
    blk = VectorAttentionBlock(d_model=D, k=K, dtype=dtype)
    feats = jax.jit(lambda k: jax.random.normal(k, (B, N, 32)) * 0.3)(key)
    params = jax.jit(blk.init)(key, xyz, feats)["params"]

    def blk_fb(c, p, xyz, f):
        f = f + c * 1e-12

        def loss(p, f):
            out, _ = blk.apply({"params": p}, xyz, f)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, f)
        return l + gnorm(g)

    timeit(f"vec-attn block f/b B={B} {tag}", blk_fb, params, xyz, feats)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tag = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    main(B, jnp.bfloat16 if tag == "bf16" else jnp.float32, tag)

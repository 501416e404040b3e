"""Fused vector-attention kernel vs XLA chain at the transformer1 shape.

Data is generated ON DEVICE (jax.random) — a [64,1024,16,512] f32 operand is
2.1 GB, which the tunneled host->device link moves at ~3-5 MB/s. Timing
protocol as elsewhere: scan REPS calls in one jit, sync by scalar fetch.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from simple3dformer_tpu.kernels.vector_attention import (  # noqa: E402
    fused_vector_attention, vector_attention_reference)

REPS = 10
B, N, K, D = 64, 1024, 16, 512


def timeit(name, fn, *args):
    def scanned(*a):
        def body(c, _):
            return c + fn(*a).reshape(-1)[0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return out

    f = jax.jit(scanned)
    float(f(*args))
    t0 = time.time()
    float(f(*args))
    dt = (time.time() - t0) / REPS * 1000
    print(f"{name:50s} {dt:8.2f} ms", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("dtype",))
def make_data(key, dtype):
    ks = jax.random.split(key, 4)
    q = (jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.3).astype(dtype)
    k = (jax.random.normal(ks[1], (B, N, K, D), jnp.float32) * 0.3).astype(dtype)
    v = (jax.random.normal(ks[2], (B, N, K, D), jnp.float32) * 0.3).astype(dtype)
    rel = jax.random.normal(ks[3], (B, N, K, 3), jnp.float32).astype(dtype)
    return q, k, v, rel


@jax.jit
def make_weights(key):
    shapes = [("wd1", (3, D)), ("bd1", (D,)), ("wd2", (D, D)), ("bd2", (D,)),
              ("wg1", (D, D)), ("bg1", (D,)), ("wg2", (D, D)), ("bg2", (D,))]
    ks = jax.random.split(key, len(shapes))
    return {n: jax.random.normal(kk, s, jnp.float32) * 0.05
            for kk, (n, s) in zip(ks, shapes)}


def main(tile=32, dtypes=("f32", "bf16")):
    W = make_weights(jax.random.key(1))

    for tag in dtypes:
        cast = jnp.bfloat16 if tag == "bf16" else jnp.float32
        q, k, v, rel = make_data(jax.random.key(0), cast)

        def lf(q, k, v, rel, W):
            return jnp.sum(fused_vector_attention(
                q, k, v, rel, W, tile, False).astype(jnp.float32) ** 2)

        def lr(q, k, v, rel, W):
            return jnp.sum(vector_attention_reference(
                q, k, v, rel, W).astype(jnp.float32) ** 2)

        def grad_norm(g):
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                g, jnp.float32(0))

        def stepf(q, k, v, rel, W):
            l, g = jax.value_and_grad(lf, argnums=(0, 4))(q, k, v, rel, W)
            return l + grad_norm(g)

        def stepr(q, k, v, rel, W):
            l, g = jax.value_and_grad(lr, argnums=(0, 4))(q, k, v, rel, W)
            return l + grad_norm(g)

        timeit(f"XLA   chain fwd   {tag}",
               lambda *a: vector_attention_reference(*a), q, k, v, rel, W)
        timeit(f"fused kernel fwd  {tag} tile={tile}",
               lambda q, k, v, rel, W: fused_vector_attention(
                   q, k, v, rel, W, tile, False), q, k, v, rel, W)
        timeit(f"fused kernel f/b  {tag} tile={tile}", stepf, q, k, v, rel, W)
        timeit(f"XLA   chain f/b   {tag}", stepr, q, k, v, rel, W)
        del q, k, v, rel


if __name__ == "__main__":
    main(tile=int(sys.argv[1]) if len(sys.argv) > 1 else 32)

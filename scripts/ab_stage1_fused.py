"""A/B the group_embed stage-1 core with the fused ViT-block kernel.

profile_group_embed.py attributes 107.8 ms of the 227 ms stage-1 f/b to
non-GEMM overhead (LayerNorm/softmax/scheduling at 3,136 sequences of 15
tokens) — exactly the degenerate-shape regime kernels/vit_block.py was built
for. The flagship demoted that kernel (net-negative inside the scanned step
at B=32/N=26, see nn/layers.py switch comment); here tiles pack s=8 samples
per 104-row target (120 rows/tile, 392 grid steps over 47k rows), a very
different balance. ABAB ordering hedges chip contention (CLAUDE.md: repeat
A/B before believing >1.5x).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_stage1_fused.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import timeit  # noqa: E402

from simple3dformer_tpu.nn import layers  # noqa: E402
from simple3dformer_tpu.nn.vit import ViTCore  # noqa: E402

NPILLAR, NSEQ, D, HEADS, DEPTH = 3136, 15, 768, 3, 12


def main(reps=6):
    core = ViTCore(depth=DEPTH, num_heads=HEADS, dtype=jnp.float32)
    # generated ON DEVICE: a 144 MB host->device put through the tunnel
    # takes minutes and has been observed to wedge outright (CLAUDE.md)
    pillars = jax.jit(lambda k: jax.random.normal(
        k, (NPILLAR, NSEQ, D), jnp.float32))(jax.random.key(3))
    params = jax.jit(core.init)(jax.random.key(9), pillars[:8])["params"]
    print("inputs staged on device", flush=True)

    def fwd(t, cp):
        return core.apply({"params": cp}, t)

    def fb(t, cp):
        return jax.grad(lambda tt: jnp.sum(fwd(tt, cp) ** 2))(t)

    # numerics check once (fused vs XLA forward)
    layers.USE_FUSED_BLOCK = False
    want = jax.jit(fwd)(pillars[:64], params)
    layers.USE_FUSED_BLOCK = True
    got = jax.jit(fwd)(pillars[:64], params)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"fused-vs-XLA fwd max|d| @[64,15,768]: {err:.3e}", flush=True)

    results = {"xla_f": [], "fused_f": [], "xla_fb": [], "fused_fb": []}
    for trial in range(2):  # ABAB
        layers.USE_FUSED_BLOCK = False
        results["xla_f"].append(
            timeit(f"[{trial}] XLA   fwd", fwd, pillars, params, reps=reps))
        results["xla_fb"].append(
            timeit(f"[{trial}] XLA   f/b", fb, pillars, params, reps=reps))
        layers.USE_FUSED_BLOCK = True
        results["fused_f"].append(
            timeit(f"[{trial}] fused fwd", fwd, pillars, params, reps=reps))
        results["fused_fb"].append(
            timeit(f"[{trial}] fused f/b", fb, pillars, params, reps=reps))
    for k, v in results.items():
        print(f"{k:9s} min over trials: {min(v):8.2f} ms", flush=True)
    return results


if __name__ == "__main__":
    main()

"""Component attribution of the Hengshuang cls step (batch 64, bf16).

The point-cls headline (BASELINE.md: ~495 samples/sec/chip bf16 = ~129
ms/step at batch 64) was improved 3x in round 2 via the Pallas kNN/FPS/
vector-attention kernels, but — unlike group_embed (round-3 table) — it was
never component-attributed. This script breaks the full train step into its
pyramid levels with the floor-corrected carry protocol (scripts/_timing):

  stem fc1 -> VAB(N=1024) -> [TD(256) -> VAB(256)] -> [TD(64) -> VAB(64)]
  -> [TD(16) -> VAB(16)] -> [TD(4) -> VAB(4)] -> mean -> MlpHead

Each component is timed fwd+bwd (value_and_grad with a gnorm anchor on
every gradient leaf — partial anchors let XLA elide siblings, BASELINE
round-3 optimizer section), discrete index ops fwd-only where they carry no
gradient. Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hengshuang.py [B] [f32|bf16]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import timeit  # noqa: E402

from simple3dformer_tpu.models.hengshuang import (  # noqa: E402
    PointTransformerCls, TransitionDown)
from simple3dformer_tpu.nn.vector_attention import VectorAttentionBlock  # noqa: E402
from simple3dformer_tpu.ops import pointops  # noqa: E402


def gnorm(g):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
        g, jnp.float32(0))


def main(B=64, dtype=jnp.bfloat16, tag="bf16"):
    N, D, K = 1024, 512, 16
    key = jax.random.key(0)

    # ---- full train step (sanity anchor vs the e2e CLI rate) ----
    model = PointTransformerCls(num_point=N, num_class=40, input_dim=6,
                                nblocks=4, nneighbor=K, transformer_dim=D,
                                dtype=dtype)
    x_full = jax.jit(lambda k: jax.random.normal(k, (B, N, 6)) * 0.5)(key)
    variables = jax.jit(model.init)(key, x_full)
    y = jnp.asarray(np.random.RandomState(0).randint(0, 40, size=B))

    def step_fb(p, bs, x):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   deterministic=False,
                                   mutable=["batch_stats"])
            l = -jnp.mean(jnp.sum(
                jax.nn.one_hot(y, 40)
                * jax.nn.log_softmax(out.astype(jnp.float32)), -1))
            return l, mut
        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return l + gnorm(g) + gnorm(mut)

    timeit(f"FULL model f/b B={B} {tag}", step_fb,
           variables["params"], variables["batch_stats"], x_full)

    # ---- per-level components ----
    # level sizes after each TransitionDown: 1024 -> 256 -> 64 -> 16 -> 4
    sizes = [N, N // 4, N // 16, N // 64, N // 256]
    chans = [32, 64, 128, 256, 512]

    for lvl, (n, c) in enumerate(zip(sizes, chans)):
        xyz = jax.jit(lambda k, n=n: jax.random.uniform(k, (B, n, 3)))(
            jax.random.key(lvl))
        feats = jax.jit(
            lambda k, n=n, c=c: (jax.random.normal(k, (B, n, c)) * 0.3)
            .astype(dtype))(jax.random.key(10 + lvl))

        vab = VectorAttentionBlock(d_model=D, k=K, dtype=dtype)
        p_vab = jax.jit(vab.init)(key, xyz, feats)["params"]

        def vab_fb(p, xyz, f, vab=vab):
            def loss(p, f):
                out, _ = vab.apply({"params": p}, xyz, f)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, f)
            return l + gnorm(g)

        timeit(f"VAB f/b N={n} C={c}", vab_fb, p_vab, xyz, feats)

        if lvl < 4:
            n_out, c_out = sizes[lvl + 1], chans[lvl + 1]
            td = TransitionDown(k=n_out, nneighbor=K,
                                channels=(c + 3, c_out, c_out), dtype=dtype)
            v_td = jax.jit(td.init)(key, xyz, feats)
            # discrete sampling (fwd-only, no grads flow through indices)
            timeit(f"  fps {n}->{n_out}",
                   lambda a, n_out=n_out: pointops.farthest_point_sample(
                       a, n_out)[..., :1].astype(jnp.float32),
                   xyz)

            def td_fb(p, bs, xyz, f, td=td):
                # full f/b through SA (fps+knn+gather + MLP/BN + max)
                def loss(p, f):
                    (nx, out), mut = td.apply(
                        {"params": p, "batch_stats": bs}, xyz, f,
                        deterministic=False, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32) ** 2) + gnorm(mut)
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, f)
                return l + gnorm(g)

            timeit(f"  TD {n}->{n_out} f/b (fps+knn+gather+MLP/BN+max)",
                   td_fb, v_td["params"], v_td["batch_stats"], xyz, feats)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tag = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    main(B, jnp.bfloat16 if tag == "bf16" else jnp.float32, tag)

"""Honest (carry-dependent) component profile of the S3DIS semseg step.

Decomposes the 3DViT_s3dis train step (B=4, N=4096, dim 9, deit_base core at
1025 tokens) into: full step, ViT core f/b, the two TransitionDown SA stages
f/b, FP/3-NN, and the SA neighborhood gathers — each timed with the honest
protocol (scripts/_timing.py). Run: PYTHONPATH=/root/repo:/root/.axon_site
python scripts/honest_profile_s3dis.py [bf16|f32].
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import timeit  # noqa: E402

B, N, DIM, NCLS = 4, 4096, 9, 13


def gnorm(g):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
        g, jnp.float32(0))


def main(tag="bf16"):
    dtype = jnp.bfloat16 if tag == "bf16" else None
    from simple3dformer_tpu.core.config import load_task_config
    from simple3dformer_tpu.models.registry import make_point_model
    from simple3dformer_tpu.nn.set_abstraction import PointNetSetAbstraction
    from simple3dformer_tpu.nn.vit import ViTCore
    from simple3dformer_tpu.ops import pointops

    cfg = load_task_config("semseg", {})
    cfg.setdefault("num_class", NCLS)
    cfg.setdefault("input_dim", DIM)
    cfg.num_point = N
    model = make_point_model(cfg, task="seg", dtype=dtype)

    x = jax.jit(lambda k: jax.random.uniform(k, (B, N, DIM)))(jax.random.key(0))
    y = jax.jit(lambda k: jax.random.randint(k, (B, N), 0, NCLS))(jax.random.key(1))
    variables = jax.jit(model.init)(jax.random.key(9), x[:2])
    params = variables["params"]
    bstats = variables.get("batch_stats")

    def full_step(p, x):
        def loss(p):
            var = {"params": p}
            if bstats is not None:
                var["batch_stats"] = bstats
                out, _ = model.apply(var, x, deterministic=False,
                                     rngs={"dropout": jax.random.key(0)},
                                     mutable=["batch_stats"])
            else:
                out = model.apply(var, x, deterministic=False,
                                  rngs={"dropout": jax.random.key(0)})
            logits = out.astype(jnp.float32)
            oh = jax.nn.one_hot(y, logits.shape[-1])
            return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

        l, g = jax.value_and_grad(loss)(p)
        return l + gnorm(g)

    dt = timeit(f"s3dis full step f/b B={B} {tag}", full_step, params, x)
    print(f"    -> {B / dt * 1000:.1f} samples/sec", flush=True)

    # ViT core at 1025 tokens (deit_base geometry: 12 blocks, d=768)
    core = ViTCore(depth=12, num_heads=12, dtype=dtype)
    tok = jax.jit(lambda k: jax.random.normal(k, (B, 1025, 768)) * 0.02)(
        jax.random.key(2))
    cparams = jax.jit(core.init)(jax.random.key(3), tok)["params"]

    def core_fb(p, t):
        def loss(p):
            return jnp.sum(core.apply({"params": p}, t).astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return l + gnorm(g)

    timeit(f"ViT core 1025tok deit_base f/b {tag}", core_fb, cparams, tok)

    # SA stages as used by the TDs: (npoint=N, K=16, mlp D/2=384) then
    # (npoint=N/4, K=16, mlp 768)
    feats0 = jax.jit(lambda k: jax.random.normal(k, (B, N, 192)) * 0.3)(
        jax.random.key(4))
    xyz = x[..., :3]
    for npoint, cin_feats, width, label in [
        (N, 192, 384, "TD0 SA 4096->4096"),
        (N // 4, 384, 768, "TD1 SA 4096->1024"),
    ]:
        f = jax.jit(lambda k: jax.random.normal(k, (B, N, cin_feats)) * 0.3)(
            jax.random.key(5))
        sa = PointNetSetAbstraction(npoint=npoint, radius=0.0, nsample=16,
                                    mlp=[width, width], group_all=False,
                                    knn=True, dtype=dtype)
        sav = jax.jit(sa.init)(jax.random.key(6), xyz, f)

        def sa_fb(p, f, sav=sav, sa=sa):
            def loss(p):
                var = dict(sav)
                var["params"] = p
                out, _ = sa.apply(var, xyz, f, deterministic=False,
                                  mutable=["batch_stats"])
                return jnp.sum(out[1].astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            return l + gnorm(g)

        timeit(f"{label} f/b {tag}", sa_fb, sav["params"], f)

    # raw neighborhood gather at the TD0 shape
    idx = jax.jit(lambda k: jax.random.randint(k, (B, N, 16), 0, N))(
        jax.random.key(7))

    def gather_fb(f, i):
        l, g = jax.value_and_grad(
            lambda f: jnp.sum(pointops.index_points(f, i)
                              .astype(jnp.float32) ** 2))(f)
        return l + gnorm(g)

    timeit(f"gather f/b [4,4096,16,192] {tag}", gather_fb, feats0, idx)

    # 3-NN interpolate 4096 <- 1024
    coarse = jax.jit(lambda k: jax.random.normal(k, (B, N // 4, 768)) * 0.3)(
        jax.random.key(8))

    def fp_fb(coarse):
        l, g = jax.value_and_grad(
            lambda cc: jnp.sum(pointops.three_nn_interpolate(
                xyz, xyz[:, :N // 4], cc).astype(jnp.float32) ** 2))(coarse)
        return l + gnorm(g)

    timeit(f"three_nn_interp 4096<-1024 D=768 f/b {tag}", fp_fb, coarse)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16")

"""Backward attribution of the packed flagship step (follow-up to
scripts/profile_flagship.py).

Phase 1 measured fwd 0.25 ms vs fwd+bwd 1.43 ms at B=32 f32 — a 4.7x
f/b-to-f ratio where ~3x is theoretical. This script splits the backward
between the two compute stages (voxel_embed conv tokenizer vs the packed
deit_small core) with the carried whole-tree protocol: each stage's f/b
runs as params' = params - 1e-6 * grad(pseudo-loss) so every leaf is
anchored (partial anchors let XLA elide siblings — BASELINE round-3
optimizer section).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_flagship_bwd.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import time_carried, timeit  # noqa: E402

from __graft_entry__ import _flagship  # noqa: E402

tmap = jax.tree_util.tree_map


def main(dtype=None, B=32):
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"=== packed flagship backward split (B={B} {tag}) ===", flush=True)
    model = _flagship(dtype=dtype)
    variables = jax.jit(model.init)(jax.random.key(9),
                                    jnp.zeros((2, 30, 30, 30)))
    params = variables["params"]
    x1 = jax.jit(lambda k: (jax.random.uniform(k, (B, 30, 30, 30)) > 0.85)
                 .astype(jnp.float32))(jax.random.key(0))
    tok = jax.jit(lambda x: model.apply(
        {"params": params}, x,
        method=lambda m, v: m.voxel_embed(v).reshape(B, -1, 384)))(x1)
    cot_tok = jax.jit(lambda k: jax.random.normal(k, tok.shape))(
        jax.random.key(2))
    cot_cls = jax.jit(lambda k: jax.random.normal(k, (B, 384)))(
        jax.random.key(3))
    print("staged", flush=True)

    def fb(apply_fn, cot):
        def step(p, args):
            def loss(p):
                return jnp.vdot(apply_fn(p, *args).astype(jnp.float32),
                                cot.astype(jnp.float32))

            g = jax.grad(loss)(p)
            return tmap(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

        return step

    # voxel_embed conv tokenizer f/b (its params only)
    emb_params = {"voxel_embed": params["voxel_embed"]}
    emb_ms = time_carried(
        "voxel_embed f/b (conv tokenizer)",
        fb(lambda p, x: model.apply(
            {"params": p}, x,
            method=lambda m, v: m.voxel_embed(v).reshape(B, -1, 384)),
           cot_tok),
        emb_params, (x1,))

    # packed core f/b from fixed tokens (core+cls+pos+head params)
    core_keys = [k for k in params if k != "voxel_embed"]
    core_params = {k: params[k] for k in core_keys}

    def core_apply(p, t):
        full = dict(p)
        feats = model.apply(
            {"params": full}, t,
            method=lambda m, tt: m._packed_core(
                m._with_cls(tt, m.cls_token)
                + m.voxel_pos_embed.astype(tt.dtype), True))
        return feats[:, 0]

    core_ms = time_carried("packed core f/b (incl. cls/pos)",
                           fb(core_apply, cot_cls), core_params, (tok,))

    # reference points
    fwd_emb = timeit("voxel_embed fwd", lambda x: model.apply(
        {"params": params}, x,
        method=lambda m, v: m.voxel_embed(v)), x1)
    fwd_core = timeit("packed core fwd", lambda t: model.apply(
        {"params": params}, t,
        method=lambda m, tt: m._packed_core(
            m._with_cls(tt, m.cls_token)
            + m.voxel_pos_embed.astype(tt.dtype), True)), tok)

    print("\n--- derived ---")
    print(f"embed bwd-only ~ {emb_ms - fwd_emb:8.3f} ms")
    print(f"core  bwd-only ~ {core_ms - fwd_core:8.3f} ms")
    print(f"sum f/b {emb_ms + core_ms:8.3f} ms (phase-1 whole-model fb 1.43)")


if __name__ == "__main__":
    main(dtype=jnp.bfloat16 if "bf16" in sys.argv[1:] else None)

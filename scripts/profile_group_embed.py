"""Component profile of the ShapeNetV2 group_embed step (VERDICT round-2 #2).

BASELINE.md's ceiling analysis computed a ~170-200 ms GEMM-bound floor for the
(batch 16, 128^3, cell 9, deit_base) group_embed train step vs ~285 ms
measured, and called the rest "architecture-bound" without accounting for the
85-115 ms gap. This script breaks the step into its components with the
floor-corrected carry-dependent protocol (scripts/_timing) so the gap is
attributed, not hand-waved.

Components (reference semantics vit_3d_2d_pretrain.py:472-496):
  voxel_embed   Conv3d-as-matmul tokenizer [16,128^3] -> [16,14,14,14,768]
  stage1 group  PostNormEncoderLayer over 3,136 pillar sequences of 15 tokens
  stage1 core   12-block deit_base over the same [3136, 15, 768]
  stage2 core   12-block deit_base over the pillar grid [16, 197, 768]
  gemm floor    the raw qkv/proj/fc1/fc2 GEMM chain at stage-1 row count,
                f/b, x12 blocks — what the "~170-200 ms floor" priced in
  attn at N=15  the attention einsums alone at the stage-1 shape — tiny
                [15,15] output tiles, the part the GEMM floor did NOT price
  adam          optimizer update alone on the full param tree

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_group_embed.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from _timing import timeit  # noqa: E402

from simple3dformer_tpu.models.voxel_vit import VoxelViT  # noqa: E402
from simple3dformer_tpu.nn.layers import Block  # noqa: E402
from simple3dformer_tpu.nn.vit import ViTCore  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage  # noqa: E402
from simple3dformer_tpu.train.loop import create_train_state, make_train_step  # noqa: E402
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

B = 16
V = 128
CELL = 9
P = V // CELL  # 14
D = 768
HEADS = 3  # reference deit_base quirk
DEPTH = 12
NPILLAR = B * P * P  # 3136
NSEQ = P + 1  # 15 tokens per pillar (z cells + group cls)


def main(dtype=jnp.float32, reps=6, parts=("components", "full")):
    rng = np.random.RandomState(9)

    emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=CELL, patch_size=P,
                              embed_dim=D, dtype=dtype)
    # group_pack=1: keep the components/full/ab_fused parts measuring the
    # round-3 unpacked program (packing is A/B'd explicitly in --ab-pack)
    model = VoxelViT(voxel_embed=emb, n_classes=55,
                     transformer_backbone="deit_base_patch16_224",
                     pos_embedding="group_embed", group_pack=1, dtype=dtype)
    # all big arrays are generated ON DEVICE: >100 MB host->device puts
    # through the tunnel take minutes and have been observed to wedge
    x = jax.jit(lambda k: jax.random.bernoulli(
        k, 0.1, (B, V, V, V)).astype(jnp.float32))(jax.random.key(4))
    y = jnp.asarray(rng.randint(0, 55, size=(B,)).astype(np.int32))
    variables = jax.jit(model.init)(jax.random.key(9), x[:2])
    params = variables["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"group_embed profile: B={B} V={V} cell={CELL} -> {NPILLAR} pillars"
          f" x {NSEQ} tokens; params {n_params / 1e6:.1f}M, dtype "
          f"{jnp.dtype(dtype).name}, reps={reps}", flush=True)

    out = {}
    core = ViTCore(depth=DEPTH, num_heads=HEADS, dtype=dtype)
    core_params = params["core"]

    if "components" in parts:
        # ---- tokenizer ----
        def tok_fwd(xx):
            return emb.apply({"params": params["voxel_embed"]}, xx)

        out["tok"] = timeit("voxel_embed fwd", tok_fwd, x, reps=reps)

        # ---- stage-1: 12-block core over the pillar sequences ----
        pillars = jax.jit(lambda k: jax.random.normal(
            k, (NPILLAR, NSEQ, D), jnp.float32))(jax.random.key(5))

        # params are timeit ARGS, not closures: closure-captured trees bake
        # into the HLO as constants and 413 the remote compiler (CLAUDE.md)
        def s1_fwd(t, cp):
            return core.apply({"params": cp}, t)

        out["s1f"] = timeit("stage-1 core fwd  [3136,15,768] x12", s1_fwd,
                            pillars, core_params, reps=reps)

        def s1_fb(t, cp):
            return jax.grad(lambda tt: jnp.sum(s1_fwd(tt, cp) ** 2))(t)

        out["s1"] = timeit("stage-1 core f/b", s1_fb, pillars, core_params,
                           reps=reps)

        # ---- stage-1 group encoder layer ----
        from simple3dformer_tpu.models.voxel_vit import PostNormEncoderLayer

        gparams = params["group_embed"]
        gmod = PostNormEncoderLayer(dtype=dtype)

        def grp_fb(t, gp):
            return jax.grad(lambda tt: jnp.sum(
                gmod.apply({"params": gp}, tt) ** 2))(t)

        out["grp"] = timeit("stage-1 group encoder f/b", grp_fb, pillars,
                            gparams, reps=reps)

        # ---- stage-2 core over the pillar grid ----
        grid = jax.jit(lambda k: jax.random.normal(
            k, (B, P * P + 1, D), jnp.float32))(jax.random.key(6))

        def s2_fb(t, cp):
            return jax.grad(lambda tt: jnp.sum(
                core.apply({"params": cp}, tt) ** 2))(t)

        out["s2"] = timeit("stage-2 core f/b  [16,197,768] x12", s2_fb, grid,
                           core_params, reps=reps)

        # ---- the GEMM floor: qkv/proj/fc1/fc2 chains at stage-1 rows ----
        rows = NPILLAR * NSEQ
        xr = jax.jit(lambda k: jax.random.normal(
            k, (rows, D), jnp.float32))(jax.random.key(7))
        w_qkv = jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.02)
        w_proj = jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.02)
        w_fc1 = jnp.asarray(rng.randn(D, 4 * D).astype(np.float32) * 0.02)
        w_fc2 = jnp.asarray(rng.randn(4 * D, D).astype(np.float32) * 0.02)

        def gemm_block(t):
            h = t @ w_qkv
            h = h[:, :D] @ w_proj
            h = h @ w_fc1
            return h @ w_fc2

        def gemm12_fb(t):
            def loss(tt):
                h = tt
                for _ in range(DEPTH):
                    h = gemm_block(h)
                return jnp.sum(h ** 2)

            return jax.grad(loss)(t)

        out["gemm"] = timeit("GEMM floor: 12x(qkv+proj+fc1+fc2) f/b @47k rows",
                             gemm12_fb, xr, reps=reps)

        # ---- attention einsums alone at the stage-1 shape ----
        hd = D // HEADS
        q = jax.jit(lambda k: jax.random.normal(
            k, (NPILLAR, NSEQ, HEADS, hd), jnp.float32))(jax.random.key(8))

        def attn12_fb(qq):
            def loss(q_):
                h = q_
                for _ in range(DEPTH):
                    a = jnp.einsum("bnhd,bmhd->bhnm", h * hd ** -0.5, h)
                    a = jax.nn.softmax(a, axis=-1)
                    h = jnp.einsum("bhnm,bmhd->bnhd", a, h)
                return jnp.sum(h ** 2)

            return jax.grad(loss)(qq)

        out["attn"] = timeit("attention-only x12 @[3136,3,15,15] f/b",
                             attn12_fb, q, reps=reps)

        # ---- adam update alone (carried protocol: timeit's single-leaf
        # perturbation + scalar return lets XLA hoist/DCE/never-materialize
        # the other ~150 leaves — an earlier run read 0.16 ms for what is
        # >= 2.5 GB of HBM traffic; see _timing.time_carried) ----
        import optax

        from _timing import time_carried

        from simple3dformer_tpu.train.optim import apply_lr

        tx0 = make_optimizer("Adam")
        state0 = create_train_state(params, tx0)
        g_fixed = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 1e-3), params)

        def adam_step(carry, g):
            pp, os = carry
            updates, os2 = tx0.update(g, os, pp)
            return optax.apply_updates(pp, apply_lr(updates, 1e-3)), os2

        out["adam"] = time_carried("adam update alone (full tree)",
                                   adam_step, (params, state0.opt_state),
                                   g_fixed, reps=reps)

        if "gemm" in out and "attn" in out and "s1" in out:
            print(f"non-GEMM stage-1 overhead (LN/softmax/scheduling): "
                  f"{out['s1'] - out['gemm'] - out['attn']:8.1f} ms",
                  flush=True)

    if "full" in parts or "ab_fused" in parts:
        tx = make_optimizer("Adam")
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, donate=False)

        def full_step(xx, st):
            new_state, m = step(st, {"x": xx, "y": y}, 1e-3,
                                jax.random.key(0))
            # anchor the step's outputs so XLA cannot dead-code-eliminate
            # the backward + update (loss alone depends only on the fwd;
            # summing every new-param leaf's first element forces each
            # leaf's grad chain — and grads of the embedding-side leaves
            # force the full backward through all 12 blocks)
            fp = jnp.stack([l.reshape(-1)[0] for l in
                            jax.tree_util.tree_leaves(new_state.params)])
            return m["loss"][None] + jnp.sum(fp)[None] * 1e-20

        if "full" in parts:
            out["full"] = timeit("full train step (fwd+bwd+adam)", full_step,
                                 x, state, reps=max(4, reps // 2))

    if "ab_pack" in parts:
        # Block-diagonal pillar packing (models/voxel_vit.py group_pack):
        # stage-1 isolation + interleaved full-step A/B. Packing is pure XLA
        # (no pallas_call boundary), so unlike the fused-block kernel it
        # keeps XLA's cross-component fusion — the round-3 failure mode.
        from simple3dformer_tpu.models.voxel_vit import pack_factor

        PK = pack_factor(NPILLAR, NSEQ)  # 8 at the recipe shape
        print(f"pack factor {PK}: [{NPILLAR},{NSEQ}] -> "
              f"[{NPILLAR // PK},{PK * NSEQ}]", flush=True)
        pillars = jax.jit(lambda k: jax.random.normal(
            k, (NPILLAR, NSEQ, D), jnp.float32))(jax.random.key(5))

        def s1_fb_unpacked(t, cp):
            return jax.grad(lambda tt: jnp.sum(
                core.apply({"params": cp}, tt) ** 2))(t)

        def s1_fb_packed(t, cp):
            def loss(tt):
                o = core.apply({"params": cp},
                               tt.reshape(NPILLAR // PK, PK * NSEQ, D),
                               seg_len=NSEQ)
                return jnp.sum(o ** 2)
            return jax.grad(loss)(t)

        out["s1_unpacked"] = timeit("stage-1 core f/b unpacked",
                                    s1_fb_unpacked, pillars, core_params,
                                    reps=reps)
        out["s1_packed"] = timeit(
            f"stage-1 core f/b packed x{PK} (seg mask)", s1_fb_packed,
            pillars, core_params, reps=reps)

        emb_p = VoxelEmbedNoAverage(voxel_size=V, cell_size=CELL,
                                    patch_size=P, embed_dim=D, dtype=dtype)
        for trial in range(2):
            for tag, gp in (("unpacked", 1), ("packed", 0)):
                m = VoxelViT(voxel_embed=emb_p, n_classes=55,
                             transformer_backbone="deit_base_patch16_224",
                             pos_embedding="group_embed", group_pack=gp,
                             dtype=dtype)
                tx2 = make_optimizer("Adam")
                st2 = create_train_state(params, tx2)
                stp = make_train_step(m, tx2, donate=False)

                def full2(xx, st, _stp=stp):
                    new_state, mm = _stp(st, {"x": xx, "y": y}, 1e-3,
                                         jax.random.key(0))
                    fp = jnp.stack([l.reshape(-1)[0] for l in
                                    jax.tree_util.tree_leaves(
                                        new_state.params)])
                    return mm["loss"][None] + jnp.sum(fp)[None] * 1e-20

                out[f"full_{tag}_{trial}"] = timeit(
                    f"[{trial}] full train step, {tag}", full2, x, st2,
                    reps=max(4, reps // 2))

    if "ab_fused" in parts:
        # full-step A/B of the fused ViT-block kernel at THIS workload's
        # stage-1 shape (3136 seqs x 15 tokens), interleaved A/B/A/B.
        # USE_FUSED_BLOCK is read at trace time, so each timeit (fresh jit)
        # honors the flag set just before it.
        from simple3dformer_tpu.kernels import vit_block as vb
        from simple3dformer_tpu.nn import layers

        train_kernel = vb.fused_vit_block_train
        for trial in range(2):
            layers.USE_FUSED_BLOCK = False
            vb.fused_vit_block_train = train_kernel
            out[f"full_xla_{trial}"] = timeit(
                f"[{trial}] full step, XLA blocks", full_step, x, state,
                reps=max(4, reps // 2))
            # the RECOMPUTE-backward kernel in train mode: the residual-bwd
            # train kernel measured e2e-neutral here (347.5 vs 348.8 ms —
            # at 47k rows the 12 x [47k,768]-class residual writes eat the
            # fused win); recompute re-buys FLOPs from VMEM instead
            layers.USE_FUSED_BLOCK = True
            vb.fused_vit_block_train = vb.fused_vit_block
            out[f"full_recomp_{trial}"] = timeit(
                f"[{trial}] full step, fused (recompute bwd)", full_step, x,
                state, reps=max(4, reps // 2))
        vb.fused_vit_block_train = train_kernel
        layers.USE_FUSED_BLOCK = None
    return out


if __name__ == "__main__":
    kw = {}
    if "--bf16" in sys.argv:
        kw["dtype"] = jnp.bfloat16
    if "--components" in sys.argv:
        kw["parts"] = ("components",)
    if "--full" in sys.argv:
        kw["parts"] = ("full",)
    if "--ab-fused" in sys.argv:
        kw["parts"] = ("ab_fused",)
    if "--ab-pack" in sys.argv:
        kw["parts"] = ("ab_pack",)
    main(**kw)

"""Component attribution of the ViP-3D (vip3d_s7) train step — VERDICT r3 #4.

The permutator (/root/reference/models/vip_3d.py:43-88, our
models/vip3d.py) mixes a [B,H,W,Z,C] token volume along H/W/Z/C with
segment reshapes + 6-D transposes — the layout-hostile pattern round-3e's
method localizes well. This script attributes the train_pure_mlp recipe
step (vip3d_s7, ModelNet40 30^3 zero-padded to 32^3, VoxelEmbed_no_average
cell 4 -> 8^3 tokens, B=32, f32 per the reference — no AMP anywhere in
train_pure_mlp.py) with the hardened protocols of profile_flagship.py:

- whole-tree passes use `_timing.time_carried` (fwd+bwd anchored by an
  every-leaf param update) — single-leaf / scalar-reduce / fusion-elision
  traps all produced retracted numbers before (BASELINE round-3).
- per-component forwards use `_timing.timeit` (carry-perturbed input,
  dispatch floor subtracted).
- the production scanned run (250 steps/dispatch, unroll=4, scalar-fetch
  sync) anchors the sum, exactly like bench.py's measurement.

Shape math at this recipe: stage 0 runs 4 blocks on [32, 8,8,8, 192]
(512 tokens, seg 8); the transition downsamples to [32, 4,4,4, 384]; 14
more blocks (3+8+3) run on 64 tokens at C=384. Branch timings isolate the
axis-mix transposes from the plain channel paths.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_vip3d.py [bf16] [peg]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import time_carried, timeit  # noqa: E402

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.vip3d import (PermutatorBlock,  # noqa: E402
                                             VisionPermutator3D,
                                             WeightedPermuteMLP)
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage  # noqa: E402
from simple3dformer_tpu.train.loop import (create_train_state,  # noqa: E402
                                           cross_entropy,
                                           make_scanned_train_steps)
from simple3dformer_tpu.train.optim import apply_lr, make_optimizer  # noqa: E402

tmap = jax.tree_util.tree_map


def main(dtype=None, B=32, n=1024, peg=False):
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    V = 32
    print(f"=== vip3d_s7 step anatomy (B={B} {tag} V={V}"
          f"{' PEG' if peg else ''}) ===", flush=True)
    emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=4, patch_size=8,
                              embed_dim=192, dtype=dtype)
    model = VisionPermutator3D.from_name(
        "vip3d_s7", embed_layer=emb, num_classes=40, dtype=dtype,
        pos_embedding="PEG" if peg else None)
    variables = jax.jit(model.init)(jax.random.key(9),
                                    jnp.zeros((2, V, V, V)))
    params = variables["params"]
    tx = make_optimizer("Adam")

    # device-generated data (host puts this size would crawl/wedge)
    xs = jax.jit(lambda k: (jax.random.uniform(k, (n, V, V, V)) > 0.85)
                 .astype(jnp.uint8))(jax.random.key(0))
    ys = jax.jit(lambda k: jax.random.randint(k, (n,), 0, 40)
                 .astype(jnp.int32))(jax.random.key(1))
    ds = DeviceResidentDataset({"x": np.zeros((2, V, V, V), np.uint8),
                                "y": np.zeros((2,), np.int32)})
    ds.n = n
    ds.arrays = {"x": jax.jit(lambda a: a.reshape(n, -1))(xs), "y": ys}
    x1 = jax.jit(lambda a: a[:B].astype(jnp.float32))(xs)
    y1 = jax.jit(lambda a: a[:B])(ys)
    print("staged", flush=True)

    # ---- anchor: the production scanned step (bench.py regime) ----
    device_copy = jax.jit(lambda p: tmap(lambda v: v + 0.0, p))
    run = make_scanned_train_steps(model, tx, ds, None, unroll=4)
    state = create_train_state(device_copy(params), tx)
    rng = np.random.RandomState(9)
    idxm = jnp.asarray(rng.randint(0, n, size=(250, B)).astype(np.int32))
    for trial in range(3):
        t0 = time.time()
        state, metrics = run(state, idxm, 1e-3, jax.random.key(0))
        float(metrics["loss"][-1])
        dt = (time.time() - t0) / 250 * 1e3
        print(f"production scanned step [{trial}]"
              f"{'(compile)' if trial == 0 else '':16s} {dt:8.3f} ms "
              f"({B / dt * 1e3:.0f} samples/sec)", flush=True)
    full_ms = dt

    # ---- fwd+bwd fixed batch, every-leaf anchored ----
    def fb_fixed(p, args):
        x, y = args

        def loss(p):
            return cross_entropy(
                model.apply({"params": p}, x, deterministic=False,
                            rngs={"dropout": jax.random.key(0)}), y)

        g = jax.grad(loss)(p)
        return tmap(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

    fbx_ms = time_carried("fwd+bwd, fixed batch", fb_fixed, params, (x1, y1))

    # ---- forward-only + embed ----
    fwd_ms = timeit("forward only",
                    lambda x: model.apply({"params": params}, x), x1)
    emb_v = jax.jit(emb.init)(jax.random.key(1), jnp.zeros((2, V, V, V)))
    emb_ms = timeit("voxel_embed (no_average) forward",
                    lambda x: emb.apply(emb_v, x), x1)

    # ---- per-stage shapes: one block forward at each ----
    cdt = dtype or jnp.float32
    t0_tokens = jax.jit(lambda k: jax.random.normal(
        k, (B, 8, 8, 8, 192), cdt))(jax.random.key(2))
    t1_tokens = jax.jit(lambda k: jax.random.normal(
        k, (B, 4, 4, 4, 384), cdt))(jax.random.key(3))

    def block_ms(name, tokens, seg):
        blk = PermutatorBlock(segment_dim=seg, mlp_ratio=3.0, dtype=dtype)
        bp = jax.jit(blk.init)(jax.random.key(4), tokens[:2])["params"]
        return timeit(name, lambda t: blk.apply({"params": bp}, t), tokens)

    b0_ms = block_ms("PermutatorBlock fwd @ stage0 [32,8^3,192] seg8",
                     t0_tokens, 8)
    b1_ms = block_ms("PermutatorBlock fwd @ stage1+ [32,4^3,384] seg4",
                     t1_tokens, 4)

    # ---- inside WeightedPermuteMLP: axis-mix branches vs channel paths ----
    def wpm_ms(name, tokens, seg):
        m = WeightedPermuteMLP(segment_dim=seg, dtype=dtype)
        mp = jax.jit(m.init)(jax.random.key(5), tokens[:2])["params"]
        return timeit(name, lambda t: m.apply({"params": mp}, t), tokens)

    w0_ms = wpm_ms("  WeightedPermuteMLP fwd @ stage0", t0_tokens, 8)
    w1_ms = wpm_ms("  WeightedPermuteMLP fwd @ stage1+", t1_tokens, 4)

    def branch_timers(tokens, seg, label):
        Bq, H, W, Z, C = tokens.shape
        S = C // seg
        T = C // H
        k = jax.random.key(6)
        wgt = jax.jit(lambda k: jax.random.normal(
            k, (H * S, H * S), cdt) * 0.02)(k)

        def h_branch(x, w):
            h = x.reshape(Bq, H, W, Z, seg, S).transpose(0, 4, 3, 2, 1, 5)
            h = h.reshape(Bq, seg, Z, W, H * S) @ w
            h = h.reshape(Bq, seg, Z, W, H, T).transpose(0, 4, 2, 3, 1, 5)
            return h.reshape(Bq, H, W, Z, C)

        def c_branch(x, w):
            return x @ w.reshape(C, -1)[:, :C]

        hb = timeit(f"    one axis-mix branch (transpose+dense) {label}",
                    h_branch, tokens, wgt)
        cb = timeit(f"    channel dense (no transpose)          {label}",
                    c_branch, tokens, wgt)
        return hb, cb

    h0_ms, c0_ms = branch_timers(t0_tokens, 8, "@ stage0")
    h1_ms, c1_ms = branch_timers(t1_tokens, 4, "@ stage1+")

    # ---- optimizer-only ----
    import optax

    grads = jax.jit(jax.grad(lambda p: cross_entropy(
        model.apply({"params": p}, x1), y1)))(params)
    opt_state = jax.jit(tx.init)(params)

    def opt_step(carry, g):
        p, s = carry
        updates, s2 = tx.update(g, s, p)
        return (optax.apply_updates(p, apply_lr(updates, 1e-3)), s2)

    opt_ms = time_carried("optimizer only (Adam + lr apply)",
                          opt_step, (params, opt_state), grads, reps=30)

    print("\n--- derived ---", flush=True)
    print(f"backward+grad accum = fb_fixed - fwd        {fbx_ms - fwd_ms:8.3f} ms")
    print(f"stage0 fwd = 4 x block0                     {4 * b0_ms:8.3f} ms")
    print(f"stages1-3 fwd = 14 x block1                 {14 * b1_ms:8.3f} ms")
    print(f"blocks+embed vs fwd                         "
          f"{4 * b0_ms + 14 * b1_ms + emb_ms:8.3f} vs {fwd_ms:8.3f} ms")
    print(f"axis-mix premium over channel dense @ s0    {h0_ms - c0_ms:8.3f} ms/branch")
    print(f"axis-mix premium over channel dense @ s1+   {h1_ms - c1_ms:8.3f} ms/branch")
    print(f"components fb+opt                           {fbx_ms + opt_ms:8.3f} ms"
          f" vs production {full_ms:8.3f} ms")


if __name__ == "__main__":
    main(dtype=jnp.bfloat16 if "bf16" in sys.argv[1:] else None,
         peg="peg" in sys.argv[1:])

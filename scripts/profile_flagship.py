"""Component attribution of the PACKED flagship train step (recipe B=32 f32).

Round-2e attributed the pre-packing 2.1 ms flagship step; round-3c's
batch_pack (P=4) then cut the step to ~1.8 ms by reshaping the core's work,
which invalidates that anatomy. This script re-attributes the step the
headline metric actually measures (bench.py recipe: deit_small cell 6
patch 5, B=32 f32, packed core) with the hardened protocols:

- whole-tree passes use `_timing.time_carried` (fwd+bwd anchored by an
  every-leaf param update; optimizer carried as (params, opt_state)) —
  single-leaf perturbation / scalar-reduce DCE / fusion-elided moment
  writes all produced retracted numbers before (BASELINE round-3).
- gather-inclusive bodies defeat LICM by deriving the index matrix from
  the carry (idx + 0 * cast(carry leaf)) so the on-device batch gather
  cannot hoist out of the timing loop.
- the production scanned run (250 steps/dispatch, unroll=4, scalar-fetch
  sync) anchors the sum, exactly like scripts/ab_flagship_pack.py.

Inputs are generated ON DEVICE (a >100 MB host put wedges the tunnel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_flagship.py [f32|bf16]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import time_carried, timeit  # noqa: E402

from __graft_entry__ import _flagship  # noqa: E402
from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.voxel_vit import frozen_mask  # noqa: E402
from simple3dformer_tpu.train.loop import (create_train_state,  # noqa: E402
                                           cross_entropy,
                                           make_scanned_train_steps)
from simple3dformer_tpu.train.optim import apply_lr, make_optimizer  # noqa: E402

tmap = jax.tree_util.tree_map


def main(dtype=None, B=32, n=1024):
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"=== packed flagship step anatomy (B={B} {tag}) ===", flush=True)
    model = _flagship(dtype=dtype)  # batch_pack=0 (auto) -> P=4 at [32,26]
    variables = jax.jit(model.init)(jax.random.key(9),
                                    jnp.zeros((2, 30, 30, 30)))
    params = variables["params"]
    mask = frozen_mask(params, True)
    tx = make_optimizer("Adam", trainable_mask=mask)

    # device-generated data (host puts this size would crawl/wedge)
    xs = jax.jit(lambda k: (jax.random.uniform(k, (n, 30, 30, 30)) > 0.85)
                 .astype(jnp.uint8))(jax.random.key(0))
    ys = jax.jit(lambda k: jax.random.randint(k, (n,), 0, 40)
                 .astype(jnp.int32))(jax.random.key(1))
    ds = DeviceResidentDataset({"x": np.zeros((2, 30, 30, 30), np.uint8),
                                "y": np.zeros((2,), np.int32)})
    ds.n = n  # swap in the device-generated corpus (flat layout, like init)
    ds.arrays = {"x": jax.jit(lambda a: a.reshape(n, -1))(xs), "y": ys}
    x1 = jax.jit(lambda a: a[:B].astype(jnp.float32))(xs)
    y1 = jax.jit(lambda a: a[:B])(ys)
    print("staged", flush=True)

    # ---- anchor: the production scanned step (bench.py regime) ----
    # state gets DONATED by the scanned run — build it from a device copy so
    # `params` stays alive for the component timings below.
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
              f"{'(compile)' if trial == 0 else '':16s} {dt:8.3f} ms",
              flush=True)
    full_ms = dt

    # ---- fwd+bwd (+gather, carry-dep idx), every-leaf anchored ----
    idx1 = jnp.asarray(rng.randint(0, n, size=(B,)).astype(np.int32))

    def fb_gather(p, args):
        arrays, idx = args
        anchor = jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]
        idx = idx + (anchor * 0).astype(jnp.int32)
        b = ds.gather_from(arrays, idx)
        x, y = b["x"].astype(jnp.float32), b["y"]

        def loss(p):
            return cross_entropy(model.apply({"params": p}, x,
                                             deterministic=False,
                                             rngs={"dropout": jax.random.key(0)}), y)

        g = jax.grad(loss)(p)
        return tmap(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

    fb_ms = time_carried("fwd+bwd incl. on-device gather", fb_gather,
                         params, (ds.arrays, idx1))

    def fb_fixed(p, args):
        x, y = args

        def loss(p):
            return cross_entropy(model.apply({"params": p}, x,
                                             deterministic=False,
                                             rngs={"dropout": jax.random.key(0)}), y)

        g = jax.grad(loss)(p)
        return tmap(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

    fbx_ms = time_carried("fwd+bwd, fixed batch (no gather)", fb_fixed,
                          params, (x1, y1))

    # ---- forward-only + components ----
    fwd_ms = timeit("forward only (packed core)",
                    lambda x: model.apply({"params": params}, x), x1)
    emb_ms = timeit(
        "voxel_embed forward",
        lambda x: model.apply({"params": params}, x,
                              method=lambda m, v: m.voxel_embed(v)), x1)
    tok = jax.jit(lambda x: model.apply(
        {"params": params}, x,
        method=lambda m, v: m.voxel_embed(v).reshape(B, -1, 384)))(x1)
    core_ms = timeit(
        "packed core forward ([32,26,384] tokens)",
        lambda t: model.apply(
            {"params": params}, t,
            method=lambda m, tt: m._packed_core(
                m._with_cls(tt, m.cls_token)
                + m.voxel_pos_embed.astype(tt.dtype), True)), tok)

    # ---- optimizer-only (masked Adam, production chain) ----
    grads = jax.jit(jax.grad(lambda p: cross_entropy(
        model.apply({"params": p}, x1), y1)))(params)
    opt_state = jax.jit(tx.init)(params)

    def opt_step(carry, g):
        p, s = carry
        updates, s2 = tx.update(g, s, p)
        return (optax.apply_updates(p, apply_lr(updates, 1e-3)), s2)

    opt_ms = time_carried("optimizer only (masked Adam + lr apply)",
                          opt_step, (params, opt_state), grads, reps=30)

    # ---- on-device batch gather alone (carry-dep idx) ----
    def gather_only(c, args):
        arrays, idx = args
        idx = idx + (c[0, 0] * 0).astype(jnp.int32)
        b = ds.gather_from(arrays, idx)
        # anchor EVERY gathered element (x and y): a single-scalar anchor
        # lets XLA DCE the label gather and fold the slice into a near-
        # single-element gather (the scalar-reduce trap; ADVICE round-3)
        return (c + b["x"].astype(jnp.float32).sum() * 1e-12
                + b["y"].astype(jnp.float32).sum() * 1e-12)

    gat_ms = time_carried("batch gather alone [B,30^3] u8 + labels",
                          gather_only, jnp.ones((8, 128), jnp.float32),
                          (ds.arrays, idx1))

    print("\n--- derived ---", flush=True)
    print(f"backward+grad accum = fb_fixed - fwd       {fbx_ms - fwd_ms:8.3f} ms")
    print(f"gather overhead in-graph = fb_g - fb_fixed {fb_ms - fbx_ms:8.3f} ms")
    print(f"head/cls/pos (fwd - core - embed)          {fwd_ms - core_ms - emb_ms:8.3f} ms")
    print(f"components fb+opt+gather                   {fb_ms + opt_ms:8.3f} ms"
          f" vs production {full_ms:8.3f} ms")


if __name__ == "__main__":
    main(dtype=jnp.bfloat16 if "bf16" in sys.argv[1:] else None)

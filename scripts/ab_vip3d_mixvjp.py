"""Interleaved A/B: ViP-3D hybrid-VJP axis mixes (S3F_VIP_MIXVJP) vs the
einsum-autodiff default — the decision measurement for BASELINE round-4a.

The first hybrid reading (2026-08-19 early AM) landed under heavy local
contention (two CPU accuracy runs competing for the single host core;
several floor-corrected sub-readings went negative) and read fwd+bwd
−6.9% but production +1.3% — not decision-grade. CLAUDE.md's protocol:
repeat A/B comparisons interleaved before believing any delta on the
shared chip. This script builds BOTH step variants in one process (the
env switch is read at trace time, so flipping os.environ between jit
traces yields two distinct compiled programs over identical weights/data)
and alternates trials A,B,A,B,... on:

  * the production scanned step (250 steps/dispatch, bench.py regime)
  * fwd+bwd fixed batch via time_carried (every-leaf anchored)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_vip3d_mixvjp.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from _timing import time_carried  # noqa: E402

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.vip3d import VisionPermutator3D  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage  # noqa: E402
from simple3dformer_tpu.train.loop import (create_train_state,  # noqa: E402
                                           cross_entropy,
                                           make_scanned_train_steps)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

tmap = jax.tree_util.tree_map
B, V, n = 32, 32, 1024


def main(trials=3):
    emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=4, patch_size=8,
                              embed_dim=192)
    model = VisionPermutator3D.from_name("vip3d_s7", embed_layer=emb,
                                         num_classes=40)
    variables = jax.jit(model.init)(jax.random.key(9),
                                    jnp.zeros((2, V, V, V)))
    params = variables["params"]
    tx = make_optimizer("Adam")

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

    device_copy = jax.jit(lambda p: tmap(lambda v: v + 0.0, p))
    rng = np.random.RandomState(9)
    idxm = jnp.asarray(rng.randint(0, n, size=(250, B)).astype(np.int32))

    # Build both variants' compiled artifacts up front (env read at trace).
    arms = {}
    for tag, flag in (("einsum-autodiff", "0"), ("hybrid-vjp", "1")):
        os.environ["S3F_VIP_MIXVJP"] = flag
        run = make_scanned_train_steps(model, tx, ds, None, unroll=4)
        state = create_train_state(device_copy(params), tx)
        # warm/compile
        state, metrics = run(state, idxm, 1e-3, jax.random.key(0))
        float(metrics["loss"][-1])

        def fb_fixed(p, args, _model=model):
            x, y = args

            def loss(pp):
                return cross_entropy(
                    _model.apply({"params": pp}, x, deterministic=False,
                                 rngs={"dropout": jax.random.key(0)}), y)

            g = jax.grad(loss)(p)
            return tmap(lambda a_, b_: a_ - 1e-6 * b_.astype(a_.dtype), p, g)

        arms[tag] = dict(run=run, state=state, fb=fb_fixed, flag=flag)
    del os.environ["S3F_VIP_MIXVJP"]

    prod = {t: [] for t in arms}
    for trial in range(trials):
        for tag, a in arms.items():
            t0 = time.time()
            a["state"], m = a["run"](a["state"], idxm, 1e-3,
                                     jax.random.key(trial + 1))
            float(m["loss"][-1])
            dt = (time.time() - t0) / 250 * 1e3
            prod[tag].append(dt)
            print(f"production step [{tag:16s}] trial {trial}: "
                  f"{dt:7.3f} ms ({B / dt * 1e3:.0f} samples/sec)",
                  flush=True)

    fb = {t: [] for t in arms}
    for trial in range(trials):
        for tag, a in arms.items():
            # time_carried traces fb on each call — the env switch is read
            # at trace time, so it must be set around the call itself
            os.environ["S3F_VIP_MIXVJP"] = a["flag"]
            try:
                fb[tag].append(time_carried(
                    f"fwd+bwd fixed [{tag}] trial {trial}",
                    a["fb"], params, (x1, y1)))
            finally:
                del os.environ["S3F_VIP_MIXVJP"]

    print("\n--- medians ---", flush=True)
    for tag in arms:
        pm = float(np.median(prod[tag]))
        fm = float(np.median(fb[tag]))
        print(f"{tag:18s} production {pm:7.3f} ms ({B / pm * 1e3:.0f} "
              f"samples/sec)   fwd+bwd {fm:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(trials=int(sys.argv[1]) if len(sys.argv) > 1 else 3)

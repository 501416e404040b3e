"""A/B: batch_pack block-diagonal packing on the FLAGSHIP train step.

Round-3b's pillar packing won e2e on group_embed by attacking degenerate
attention shapes inside XLA. The flagship recipe (deit_small, cell 6,
patch 5) runs the main core over [B, 26, 384] — the same degenerate-
sequence regime (each [26,26] score tile uses 26/128 of the MXU side, and
softmax/LN fusions run one grid row per sequence). batch_pack folds P=4
batch rows per attention row ([32,26] -> [8,104]) with the same exact
block-diagonal mask machinery (nn.layers.Attention(seg_len=)).

Protocol: interleaved ABAB full scanned-step trials (250 steps/dispatch,
unroll=4, frozen-2D mask — the bench.py recipe exactly), scalar-fetch sync,
trial 0 discarded as compile+warmup; plus a jitted packed-vs-unpacked logits
exactness check. Arms at batch 32 f32 (recipe) and batch 256 bf16
(throughput mode). Verdict recorded in BASELINE.md round-3c.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_flagship_pack.py
"""

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from __graft_entry__ import _flagship  # noqa: E402
from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.voxel_vit import frozen_mask  # noqa: E402
from simple3dformer_tpu.train.loop import (create_train_state,  # noqa: E402
                                           make_scanned_train_steps)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

tmap = jax.tree_util.tree_map


def exactness(model_off, model_on, params, x):
    lo = jax.jit(lambda p, v: model_off.apply({"params": p}, v))(params, x)
    lp = jax.jit(lambda p, v: model_on.apply({"params": p}, v))(params, x)
    d = float(jnp.max(jnp.abs(lo - lp)))
    s = float(jnp.max(jnp.abs(lo)))
    print(f"packed-vs-unpacked logits max|d| = {d:.3e} (scale {s:.2f})",
          flush=True)
    return d, s


def ab(batch=32, dtype=None, trial_steps=250, measure=2, trials=2, n=2048):
    tag = f"batch={batch} {'bf16' if dtype == jnp.bfloat16 else 'f32'}"
    print(f"=== flagship batch_pack A/B ({tag}) ===", flush=True)
    rng = np.random.RandomState(9)
    base = _flagship(dtype=dtype)
    models = {"off": dataclasses.replace(base, batch_pack=1),
              "on": dataclasses.replace(base, batch_pack=0)}
    variables = jax.jit(models["off"].init)(jax.random.key(9),
                                            jnp.zeros((2, 30, 30, 30)))
    params = variables["params"]
    mask = frozen_mask(params, True)
    ds = DeviceResidentDataset({
        "x": (rng.rand(n, 30, 30, 30) > 0.85).astype(np.uint8),
        "y": rng.randint(0, 40, size=(n,)).astype(np.int32),
    })
    x_small = jax.jit(
        lambda k: (jax.random.uniform(k, (batch, 30, 30, 30)) > 0.85)
        .astype(jnp.float32))(jax.random.key(0))
    exactness(models["off"], models["on"], params, x_small)

    device_copy = jax.jit(lambda p: tmap(lambda v: v + 0.0, p))
    runs, states = {}, {}
    for name, m in models.items():
        tx = make_optimizer("Adam", trainable_mask=mask)
        runs[name] = (make_scanned_train_steps(m, tx, ds, None, unroll=4),)
        states[name] = create_train_state(device_copy(params), tx)
        print(f"arm {name}: state staged", flush=True)

    def dispatch(name, idx):
        st, metrics = runs[name][0](states[name], idx, 1e-3, jax.random.key(0))
        float(metrics["loss"][-1])  # true sync (jax.block_until_ready lies here)
        states[name] = st

    results = {name: [] for name in models}
    for trial in range(1 + trials):
        for name in models:
            idx = jnp.asarray(
                rng.randint(0, n, size=(trial_steps, batch)).astype(np.int32))
            t0 = time.time()
            for _ in range(measure):
                dispatch(name, idx)
            dt = time.time() - t0
            sps = measure * trial_steps * batch / dt
            if trial > 0:
                results[name].append(sps)
            print(f"[{trial}] pack={name:3s} {sps:10.1f} samples/sec/chip "
                  f"({dt / (measure * trial_steps) * 1e3:.3f} ms/step)"
                  f"{'  (warmup+compile)' if trial == 0 else ''}", flush=True)
    print(f"{tag} best: " + "  ".join(
        f"{k}={max(v):.1f}" for k, v in results.items()), flush=True)
    return results


if __name__ == "__main__":
    ab(batch=32, dtype=None)
    if "--recipe-only" not in sys.argv:
        ab(batch=256, dtype=jnp.bfloat16, trial_steps=64)

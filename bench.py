"""Benchmark: flagship ModelNet40 voxel-classification training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the north-star recipe (BASELINE.md): VoxelViT with
deit_small_patch16_224 backbone + VoxelEmbed(cell 6, patch 5) on 30^3
ModelNet40-shaped voxels, Adam, batch 32 per chip, CE loss, full train step
(fwd + bwd + update). Data is HBM-resident (uint8 occupancy grids staged
once); whole measurement runs as scanned steps inside a single jit dispatch,
so the number reflects chip compute, not host-link bandwidth.

vs_baseline: BASELINE.md records that the reference repo publishes no
benchmark numbers; the driver-defined target is >=3x a single PyTorch GPU.
REF_GPU_SPS below is a provisional estimate of the reference's V100
samples/sec on this config (deit_small fwd+bwd at 26 tokens, batch 32,
DataLoader-bound binvox decode) to be replaced by a measured number when a
CUDA host is available. vs_baseline = value / REF_GPU_SPS.

Measured headroom beyond the recipe defaults (same chip): batch 256 + bf16
compute reaches ~20.9k samples/sec/chip (`python bench.py --bf16 --batch=256`);
the recipe-faithful default (batch 32, f32) is reported as the headline.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_GPU_SPS = 300.0  # provisional single-V100 estimate; see module docstring

BATCH = 32
STEPS_PER_DISPATCH = 50
WARMUP_DISPATCHES = 1
MEASURE_DISPATCHES = 3
N_SAMPLES = 2048


def main(dtype=None, batch=BATCH, quiet=False):
    from __graft_entry__ import _flagship
    from simple3dformer_tpu.data.pipeline import DeviceResidentDataset
    from simple3dformer_tpu.models.voxel_vit import frozen_mask
    from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh
    from simple3dformer_tpu.train.loop import create_train_state, make_scanned_train_steps
    from simple3dformer_tpu.train.optim import make_optimizer

    n_chips = jax.device_count()
    mesh = make_mesh()
    rules = ShardingRules(mesh)

    model = _flagship(dtype=dtype)
    x0 = jnp.zeros((2, 30, 30, 30))
    variables = jax.jit(model.init)(jax.random.key(9), x0)
    params = variables["params"]
    tx = make_optimizer("Adam", trainable_mask=frozen_mask(params, True))
    state = jax.device_put(create_train_state(params, tx), rules.params)

    rng = np.random.RandomState(9)
    ds = DeviceResidentDataset(
        {
            "x": (rng.rand(N_SAMPLES, 30, 30, 30) > 0.85).astype(np.uint8),
            "y": rng.randint(0, 40, size=(N_SAMPLES,)).astype(np.int32),
        },
        mesh=mesh,
    )
    run = make_scanned_train_steps(model, tx, ds, rules)

    global_batch = batch * n_chips

    def dispatch(state):
        idx = rules.put_scan_idx(
            rng.randint(0, N_SAMPLES, size=(STEPS_PER_DISPATCH, global_batch))
            .astype(np.int32)
        )
        state, metrics = run(state, idx, 1e-3, jax.random.key(0))
        # true synchronization: fetch a scalar. On the tunneled axon backend
        # block_until_ready can return before the computation finishes, which
        # silently inflates throughput numbers.
        float(metrics["loss"][-1])
        return state

    for _ in range(WARMUP_DISPATCHES):
        state = dispatch(state)
    t0 = time.time()
    for _ in range(MEASURE_DISPATCHES):
        state = dispatch(state)
    dt = time.time() - t0

    total = MEASURE_DISPATCHES * STEPS_PER_DISPATCH * global_batch
    sps_per_chip = total / dt / n_chips
    line = json.dumps(
        {
            "metric": "modelnet40_voxel_train_samples_per_sec_per_chip",
            "value": round(sps_per_chip, 1),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps_per_chip / REF_GPU_SPS, 3),
        }
    )
    if not quiet:
        print(line)
    return sps_per_chip


if __name__ == "__main__":
    import sys

    import jax.numpy as _jnp

    kw = {}
    if "--bf16" in sys.argv:
        kw["dtype"] = _jnp.bfloat16
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            kw["batch"] = int(a.split("=")[1])
    main(**kw)

"""Worker for test_multiprocess: sharded-training equivalence across a REAL
process boundary.

Launched once per rank (see tests/test_multiprocess.py). Joins the global
mesh via parallel.mesh.multihost_init (torch env:// names), then trains the
same tiny VoxelViT three ways on the SAME global 8-device mesh:

  * dp-8, replicated optimizer state   (the production default)
  * dp-8, ZeRO-1 (parallel/zero.py)    — the moment reduce-scatter /
    delta all-gather collectives here cross the process boundary (gloo),
    not just virtual intra-process devices
  * (dcn=2, data=4) multi-slice mesh   — the process boundary plays the
    role of DCN: the cross-"slice" grad psum is a real cross-process
    collective

Writes {"rep": [...], "zero1": [...], "dcn": [...]} per-step losses to the
given JSON path. The pytest asserts rank0 == rank1 == single-process run and
rep == zero1 == dcn within f32 reduction-order noise.

Usage: python tests/_mp_parallel_worker.py OUT.json
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.voxel_vit import VoxelViT  # noqa: E402
from simple3dformer_tpu.nn import vit as vit_mod  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed  # noqa: E402
from simple3dformer_tpu.parallel.mesh import (  # noqa: E402
    ShardingRules, make_mesh, multihost_init)
from simple3dformer_tpu.parallel.zero import zero1_state_shardings  # noqa: E402
from simple3dformer_tpu.train.loop import (  # noqa: E402
    create_train_state, make_scanned_train_steps)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402


def main(out_path: str) -> None:
    multihost_init()
    assert jax.device_count() == 8, jax.device_count()

    vit_mod.BACKBONES["mp_tiny"] = dict(
        patch_size=16, embed_dim=96, depth=3, num_heads=3, mlp_ratio=4.0,
        qkv_bias=True)
    rng = np.random.RandomState(0)
    x = (rng.rand(64, 8, 8, 8) > 0.7).astype(np.uint8)
    y = rng.randint(0, 4, size=(64,)).astype(np.int32)
    idx = rng.randint(0, 64, size=(3, 16)).astype(np.int32)

    emb = VoxelEmbed(voxel_size=8, cell_size=4, patch_size=2, embed_dim=96)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="mp_tiny")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 8, 8, 8)))
    tx = make_optimizer("Adam")

    def run(mesh, zero1: bool):
        rules = ShardingRules(mesh)
        ds = DeviceResidentDataset({"x": x, "y": y}, mesh=mesh)
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = create_train_state(params, tx)
        sh = zero1_state_shardings(state, mesh) if zero1 else rules.params
        state = jax.device_put(state, sh)
        step = make_scanned_train_steps(
            model, tx, ds, rules, state_shardings=sh if zero1 else None)
        _, metrics = step(state, rules.put_scan_idx(idx), 1e-3,
                          jax.random.key(7))
        # loss is psum-reduced => fully replicated => addressable everywhere
        return [float(v) for v in np.asarray(jax.device_get(metrics["loss"]))]

    out = {
        "rep": run(make_mesh(n_data=8), zero1=False),
        "zero1": run(make_mesh(n_data=8), zero1=True),
        "dcn": run(make_mesh(n_dcn=2, n_data=4), zero1=False),
        "process_count": jax.process_count(),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print("worker done", out)


if __name__ == "__main__":
    main(sys.argv[1])

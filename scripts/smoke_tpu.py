"""E2E smoke drive: train VoxelViT on the real TPU via the public package API.

Synthetic ModelNet40-shaped voxel batches; checks that the jitted SPMD train
step compiles on the TPU, loss decreases, and reports samples/sec.
Run: python scripts/smoke_tpu.py [--steps 30] [--batch 32]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from simple3dformer_tpu.models.voxel_vit import VoxelViT, frozen_mask
from simple3dformer_tpu.nn.voxel_embed import make_embed_layer
from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh, shard_batch_tree
from simple3dformer_tpu.train.loop import create_train_state, make_train_step
from simple3dformer_tpu.train.optim import epoch_lr, make_optimizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--backbone", default="deit_small_patch16_224")
    args = ap.parse_args()

    print("devices:", jax.devices())
    mesh = make_mesh()
    rules = ShardingRules(mesh)

    emb = make_embed_layer("VoxelEmbed", voxel_size=30, cell_size=6,
                           patch_size=5, embed_dim=384)
    model = VoxelViT(voxel_embed=emb, n_classes=40,
                     transformer_backbone=args.backbone)

    key = jax.random.key(9)
    x0 = jnp.zeros((2, 30, 30, 30))
    img0 = jnp.zeros((2, 224, 224, 3))
    variables = model.init(key, x0, img0, method=model.init_all)
    params = variables["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    tx = make_optimizer("Adam", trainable_mask=frozen_mask(params, pretrained=True))
    state = create_train_state(params, tx)
    state = jax.device_put(state, rules.params)
    step = make_train_step(model, tx, rules)

    rng = np.random.RandomState(9)
    # fixed synthetic dataset of 4 batches so the model can overfit
    batches = []
    for _ in range(4):
        xb = (rng.rand(args.batch, 30, 30, 30) > 0.8).astype(np.float32)
        yb = rng.randint(0, 40, size=(args.batch,)).astype(np.int32)
        batches.append({"x": xb, "y": yb})

    lr = epoch_lr(1e-3, 0, warmup=True)
    losses = []
    t_compile = time.time()
    for i in range(args.steps):
        b = shard_batch_tree(mesh, batches[i % 4])
        state, metrics = step(state, b, lr, key)
        if i == 0:
            jax.block_until_ready(metrics["loss"])
            print(f"first step (compile): {time.time()-t_compile:.1f}s")
            t_run = time.time()
        losses.append(float(metrics["loss"]))
    jax.block_until_ready(state.params)
    dt = time.time() - t_run
    sps = (args.steps - 1) * args.batch / dt
    print(f"loss[0..3]={losses[:4]}")
    print(f"loss[-4:]={losses[-4:]}")
    print(f"throughput: {sps:.1f} samples/sec ({dt/(args.steps-1)*1000:.1f} ms/step)")
    assert losses[-1] < losses[0], "loss did not decrease"
    print("SMOKE PASS")


if __name__ == "__main__":
    main()

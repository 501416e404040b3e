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
    ap.add_argument("--model", default="voxel_vit",
                    choices=["voxel_vit", "hengshuang", "point_vit"])
    args = ap.parse_args()

    print("devices:", jax.devices())
    mesh = make_mesh()
    rules = ShardingRules(mesh)
    key = jax.random.key(9)
    rng = np.random.RandomState(9)
    has_bn = False

    if args.model == "voxel_vit":
        emb = make_embed_layer("VoxelEmbed", voxel_size=30, cell_size=6,
                               patch_size=5, embed_dim=384)
        model = VoxelViT(voxel_embed=emb, n_classes=40,
                         transformer_backbone=args.backbone)
        x0 = jnp.zeros((2, 30, 30, 30))
        img0 = jnp.zeros((2, 224, 224, 3))
        # jit the init: eager init dispatches thousands of tiny ops, which is
        # unusable over the high-latency TPU tunnel
        variables = jax.jit(lambda k, a, b: model.init(k, a, b, method=model.init_all))(
            key, x0, img0
        )
        mask_fn = frozen_mask

        def make_batch():
            xb = (rng.rand(args.batch, 30, 30, 30) > 0.8).astype(np.float32)
            yb = rng.randint(0, 40, size=(args.batch,)).astype(np.int32)
            return {"x": xb, "y": yb}
    else:
        npoint = 256
        if args.model == "hengshuang":
            from simple3dformer_tpu.models.hengshuang import PointTransformerCls

            model = PointTransformerCls(num_point=npoint, num_class=40,
                                        input_dim=6, nblocks=4, nneighbor=16)
        else:
            from simple3dformer_tpu.models.point_vit import PointViT

            model = PointViT(variant="3DViT", task="cls", num_point=npoint,
                             num_class=40, input_dim=6, nneighbor=16,
                             transformer_backbone="deit_tiny_patch16_224")
        x0 = jnp.zeros((2, npoint, 6))
        variables = jax.jit(model.init)(key, x0)
        has_bn = "batch_stats" in variables
        mask_fn = lambda p, pretrained: None

        def make_batch():
            xb = rng.randn(args.batch, npoint, 6).astype(np.float32)
            yb = rng.randint(0, 40, size=(args.batch,)).astype(np.int32)
            return {"x": xb, "y": yb}

    params = variables["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    tx = make_optimizer("Adam", trainable_mask=mask_fn(params, True))
    state = create_train_state(params, tx, variables.get("batch_stats"))
    state = jax.device_put(state, rules.params)
    step = make_train_step(model, tx, rules, has_batch_stats=has_bn)

    # fixed synthetic dataset of 4 batches so the model can overfit
    batches = [make_batch() for _ in range(4)]

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

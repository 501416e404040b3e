"""bf16 compute path: training remains stable and params stay f32."""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed
from simple3dformer_tpu.train.loop import create_train_state, make_train_step
from simple3dformer_tpu.train.optim import make_optimizer


def test_bf16_training_decreases_loss(rng):
    emb = VoxelEmbed(voxel_size=12, cell_size=4, patch_size=3, embed_dim=192,
                     dtype=jnp.bfloat16)
    model = VoxelViT(voxel_embed=emb, n_classes=5,
                     transformer_backbone="deit_tiny_patch16_224",
                     dtype=jnp.bfloat16)
    x = jnp.asarray((rng.rand(8, 12, 12, 12) > 0.8).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, size=(8,)))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    # params stored in f32 despite bf16 compute
    dtypes = {p.dtype for p in jax.tree_util.tree_leaves(variables["params"])}
    assert dtypes == {np.dtype(jnp.float32)}

    out = model.apply(variables, x)
    assert out.dtype == jnp.bfloat16

    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model, tx)
    losses = []
    for _ in range(10):
        state, m = step(state, {"x": x, "y": y}, 3e-4, jax.random.key(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

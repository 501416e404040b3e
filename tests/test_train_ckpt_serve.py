"""Full lifecycle: train -> orbax checkpoint -> restore -> serve.

Also covers the 21k fit_dict converter path and the legacy batch loader.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from simple3dformer_tpu.core.checkpoint import Checkpointer
from simple3dformer_tpu.data.datasets import BatchPointCloudLoader
from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed
from simple3dformer_tpu.serve.predictor import Predictor
from simple3dformer_tpu.train.loop import create_train_state, make_train_step
from simple3dformer_tpu.train.optim import make_optimizer
from simple3dformer_tpu.utils.torch_convert import fit_21k_state_dict

V = 12


def test_train_checkpoint_serve_roundtrip(tmp_path, rng):
    emb = VoxelEmbed(voxel_size=V, cell_size=4, patch_size=3, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=5,
                     transformer_backbone="deit_tiny_patch16_224")
    x = jnp.asarray((rng.rand(8, V, V, V) > 0.8).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 5, size=(8,)))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx)
    step = make_train_step(model, tx, donate=False)
    for _ in range(3):
        state, metrics = step(state, {"x": x, "y": y}, 3e-4, jax.random.key(1))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(3, state, {"loss": float(metrics["loss"])})

    # restore into a fresh template and serve
    template = create_train_state(variables["params"], tx)
    predictor = Predictor.from_checkpoint(
        model, str(tmp_path / "ckpt"), template, input_shape=(V, V, V),
        batch_size=4,
    )
    out = predictor(np.asarray(x))
    assert out.shape == (8, 5)
    # served logits match the trained model applied directly
    direct = model.apply({"params": state.params}, x)
    np.testing.assert_allclose(out, np.asarray(direct), rtol=1e-4, atol=1e-5)


def test_fit_21k_state_dict(rng):
    def t(*s):
        return rng.randn(*s).astype(np.float32)

    sd = {
        "transformer.blocks.0.attn.proj_q.weight": t(8, 8),
        "transformer.blocks.0.attn.proj_k.weight": t(8, 8),
        "transformer.blocks.0.attn.proj_v.weight": t(8, 8),
        "transformer.blocks.0.attn.proj_q.bias": t(8),
        "transformer.blocks.0.attn.proj_k.bias": t(8),
        "transformer.blocks.0.attn.proj_v.bias": t(8),
        "transformer.blocks.0.pwff.fc1.weight": t(32, 8),
        "transformer.norm.weight": t(8),
    }
    out = fit_21k_state_dict(sd)
    assert out["blocks.0.attn.qkv.weight"].shape == (24, 8)
    assert out["blocks.0.attn.qkv.bias"].shape == (24,)
    assert "blocks.0.mlp.fc1.weight" in out
    assert "norm.weight" in out
    np.testing.assert_array_equal(
        out["blocks.0.attn.qkv.weight"][:8],
        sd["transformer.blocks.0.attn.proj_q.weight"],
    )


def test_batch_point_cloud_loader(rng):
    pts = rng.randn(10, 16, 6).astype(np.float32)
    lbl = rng.randint(0, 4, size=10)
    loader = BatchPointCloudLoader(pts, lbl, batch_size=4,
                                   rng=np.random.RandomState(0))
    seen = 0
    while loader.has_next_batch():
        b, l = loader.next_batch(augment=True)
        assert b.shape[1:] == (16, 6)
        assert len(b) == len(l)
        seen += len(b)
    assert seen == 10
    assert loader.num_batches() == 3
    loader.reset()
    assert loader.has_next_batch()


def test_bf16_nu_adam_tracks_f32_adam(rng):
    """make_optimizer(bf16_nu=True): nu stored bfloat16, updates track f32
    Adam within the bf16 quantization envelope over chained steps."""
    import optax

    from simple3dformer_tpu.train.optim import apply_lr

    params = {"w": jnp.asarray(rng.randn(64, 32).astype(np.float32)),
              "b": jnp.asarray(rng.randn(32).astype(np.float32))}
    tx32 = make_optimizer("Adam")
    tx16 = make_optimizer("Adam", bf16_nu=True)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16[0]["nu"]["w"].dtype == jnp.bfloat16  # chain state tuple
    assert s16[0]["mu"]["w"].dtype == jnp.float32  # first moment stays f32

    p32, p16 = params, params
    for _ in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32))
            * 1e-2, p32)
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, apply_lr(u32, 1e-3))
        u16, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, apply_lr(u16, 1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        # nu carries ~8 significant bits -> sqrt halves the relative error;
        # updates deviate in the ~3rd digit, params (lr-scaled) far less
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)

"""Block-diagonal sequence packing (nn.layers.Attention seg_len) — exactness.

The group_embed route runs the full backbone over B*px*py z-pillar sequences
of patch_size+1 tokens (/root/reference/models/vit_3d_2d_pretrain.py:472-481).
Packing P pillars per attention row with a within-pillar mask must be
*mathematically identical* to the per-pillar pass: LayerNorm/MLP are
per-token, and a masked softmax over the block-diagonal scores reproduces the
per-segment softmax (the -inf entries exp to exact zeros). These tests pin
that equality for the attention layer, the 12-block core (fwd + grads), and
the whole VoxelViT group_embed forward, plus the auto-pack policy edges.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.voxel_vit import VoxelViT, pack_factor
from simple3dformer_tpu.nn.layers import Attention, Block
from simple3dformer_tpu.nn.vit import ViTCore
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_pack_factor_policy():
    # ShapeNetV2 recipe shape: 3136 pillars of 15 tokens -> 8 (120 <= 128)
    assert pack_factor(3136, 15) == 8
    # flagship-ish: 50 pillars of 6 tokens -> largest divisor of 50 <= 21
    assert pack_factor(50, 6) == 10
    # too long to pack
    assert pack_factor(3136, 129) == 1
    # nothing divides: prime count, seg 60 -> limit 2, 3137 odd
    assert pack_factor(3137, 60) == 1
    assert pack_factor(1, 15) == 1


@pytest.mark.parametrize("module", ["attention", "block"])
def test_packed_attention_matches_unpacked(module):
    n_seq, S, C, H, P = 12, 5, 32, 4, 3
    x = _rand(0, (n_seq, S, C))
    if module == "attention":
        mod = Attention(num_heads=H)
    else:
        mod = Block(num_heads=H)
    params = mod.init(jax.random.key(1), x)

    ref = mod.apply(params, x)
    packed = mod.apply(params, x.reshape(n_seq // P, P * S, C), seg_len=S)
    np.testing.assert_allclose(
        np.asarray(packed.reshape(n_seq, S, C)), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_packed_core_matches_unpacked_with_grads(scan_blocks):
    n_seq, S, C, P = 8, 7, 64, 4
    core = ViTCore(depth=2, num_heads=4, scan_blocks=scan_blocks)
    x = _rand(2, (n_seq, S, C))
    params = core.init(jax.random.key(3), x)["params"]

    def loss_unpacked(p, t):
        return jnp.sum(core.apply({"params": p}, t) ** 2)

    def loss_packed(p, t):
        out = core.apply(
            {"params": p}, t.reshape(n_seq // P, P * S, C), seg_len=S)
        return jnp.sum(out ** 2)

    ref, gref = jax.value_and_grad(loss_unpacked)(params, x)
    got, ggot = jax.value_and_grad(loss_packed)(params, x)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for (ka), (kb) in zip(
        jax.tree_util.tree_leaves_with_path(gref),
        jax.tree_util.tree_leaves_with_path(ggot),
    ):
        assert jax.tree_util.keystr(ka[0]) == jax.tree_util.keystr(kb[0])
        np.testing.assert_allclose(
            np.asarray(kb[1]), np.asarray(ka[1]), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(ka[0]))


def test_packed_core_rejects_drop_path():
    core = ViTCore(depth=1, num_heads=4, drop_path=0.1)
    x = _rand(4, (4, 6, 64))
    params = core.init(jax.random.key(0), x)["params"]
    with pytest.raises(ValueError, match="drop_path"):
        core.apply({"params": params}, x, seg_len=3)


def _tiny_group_model(group_pack):
    emb = VoxelEmbedNoAverage(voxel_size=30, cell_size=6, patch_size=5,
                              embed_dim=192)
    return VoxelViT(
        voxel_embed=emb, n_classes=40,
        transformer_backbone="deit_tiny_patch16_224",
        pos_embedding="group_embed", group_pack=group_pack)


def test_voxel_vit_group_pack_exact():
    """Auto-packed group_embed forward == unpacked, logits and param grads."""
    x = (np.random.RandomState(0).rand(2, 30, 30, 30) > 0.8).astype(np.float32)
    x = jnp.asarray(x)
    m_off = _tiny_group_model(group_pack=1)
    m_auto = _tiny_group_model(group_pack=0)
    variables = jax.jit(m_off.init)(jax.random.key(9), x)
    y = jnp.array([3, 17])

    def loss(m):
        def f(p):
            logits = m.apply({"params": p}, x)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(2), y]), logits
        return jax.value_and_grad(f, has_aux=True)(variables["params"])

    (l_off, logit_off), g_off = loss(m_off)
    (l_on, logit_on), g_on = loss(m_auto)
    # 50 pillars of 6 tokens at this config -> auto pack factor 10
    np.testing.assert_allclose(np.asarray(logit_on), np.asarray(logit_off),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    for (ka), (kb) in zip(
        jax.tree_util.tree_leaves_with_path(g_off),
        jax.tree_util.tree_leaves_with_path(g_on),
    ):
        np.testing.assert_allclose(
            np.asarray(kb[1]), np.asarray(ka[1]), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(ka[0]))


def test_voxel_vit_batch_pack_exact():
    """batch_pack (default-route row packing) forward == unpacked, logits and
    param grads — the flagship recipe's [B, 26, D] core pass folded 4 rows
    per attention row."""
    from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed

    x = (np.random.RandomState(2).rand(4, 30, 30, 30) > 0.8).astype(np.float32)
    x = jnp.asarray(x)
    emb = VoxelEmbed(voxel_size=30, cell_size=6, patch_size=5, embed_dim=192)

    def make(bp):
        return VoxelViT(voxel_embed=emb, n_classes=40,
                        transformer_backbone="deit_tiny_patch16_224",
                        pos_embedding="default", batch_pack=bp)

    m_off, m_auto = make(1), make(0)
    variables = jax.jit(m_off.init)(jax.random.key(9), x)
    y = jnp.array([3, 17, 0, 39])

    def loss(m):
        def f(p):
            logits = m.apply({"params": p}, x)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(4), y]), logits
        return jax.value_and_grad(f, has_aux=True)(variables["params"])

    (l_off, logit_off), g_off = loss(m_off)
    (l_on, logit_on), g_on = loss(m_auto)
    # B=4 sequences of 26 tokens -> auto pack factor 4 (104 <= 128)
    np.testing.assert_allclose(np.asarray(logit_on), np.asarray(logit_off),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    for (ka), (kb) in zip(
        jax.tree_util.tree_leaves_with_path(g_off),
        jax.tree_util.tree_leaves_with_path(g_on),
    ):
        np.testing.assert_allclose(
            np.asarray(kb[1]), np.asarray(ka[1]), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(ka[0]))


def test_group_pack_disabled_under_rollout_capture():
    """mutable=['intermediates'] must sow per-pillar attention shapes."""
    x = jnp.asarray(
        (np.random.RandomState(1).rand(2, 30, 30, 30) > 0.8).astype(np.float32))
    model = _tiny_group_model(group_pack=0)
    variables = jax.jit(model.init)(jax.random.key(9), x)
    _, inter = model.apply(variables, x, mutable=["intermediates"])
    attns = [np.asarray(v) for k, v in jax.tree_util.tree_leaves_with_path(
        inter["intermediates"]) if "attn" in jax.tree_util.keystr(k)]
    assert attns, "rollout capture must still sow attention maps"
    # stage-1 maps stay [50 pillars, heads, 6, 6] (packed would be 60-wide);
    # stage-2 is [2, H, 26, 26]
    assert any(a.shape[-1] == 6 for a in attns)
    for a in attns:
        assert a.shape[-1] in (6, 26)


def test_group_pack_env_kill_switch(monkeypatch):
    monkeypatch.setenv("S3F_PACK", "0")
    model = _tiny_group_model(group_pack=0)
    # bind a module instance the flax way to resolve the policy
    x = jnp.zeros((2, 30, 30, 30))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    # behavior check: with the kill switch the forward still runs (unpacked)
    out = model.apply(variables, x)
    assert out.shape == (2, 40)

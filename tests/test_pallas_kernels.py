"""Pallas kernels vs the lax reference ops (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.kernels.fps import fps_pallas
from simple3dformer_tpu.kernels.knn import knn_pallas
from simple3dformer_tpu.ops import pointops


def test_knn_pallas_matches_lax(rng):
    q = rng.randn(2, 100, 3).astype(np.float32)
    p = rng.randn(2, 300, 3).astype(np.float32)
    idx, dist = knn_pallas(jnp.asarray(q), jnp.asarray(p), k=8, tile=32,
                           interpret=True)
    assert idx.shape == (2, 100, 8)

    d_full = np.sum((q[:, :, None] - p[:, None]) ** 2, axis=-1)
    ref_sorted = np.sort(d_full, axis=-1)[:, :, :8]
    np.testing.assert_allclose(np.sort(np.asarray(dist), axis=-1), ref_sorted,
                               rtol=1e-3, atol=1e-4)
    # distances gathered at returned indices agree
    got = np.take_along_axis(d_full, np.asarray(idx), axis=-1)
    np.testing.assert_allclose(np.sort(got, -1), ref_sorted, rtol=1e-3, atol=1e-4)


def test_knn_pallas_self_includes_self(rng):
    x = rng.randn(1, 64, 3).astype(np.float32)
    idx, dist = knn_pallas(jnp.asarray(x), jnp.asarray(x), k=4, tile=32,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(64))
    np.testing.assert_allclose(np.asarray(dist)[0, :, 0], 0.0, atol=1e-5)


def test_fps_pallas_matches_lax(rng):
    xyz = rng.randn(3, 128, 3).astype(np.float32)
    ref = np.asarray(pointops.farthest_point_sample(jnp.asarray(xyz), 32))
    out = np.asarray(fps_pallas(jnp.asarray(xyz), 32, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_fps_pallas_batch_one(rng):
    """batch_size=1 (the partseg recipe) pads to the 8-row sublane tile;
    round-2 regression: Mosaic could not lower the rows-select at B=1."""
    xyz = rng.randn(1, 128, 3).astype(np.float32)
    ref = np.asarray(pointops.farthest_point_sample(jnp.asarray(xyz), 32))
    out = np.asarray(fps_pallas(jnp.asarray(xyz), 32, interpret=True))
    assert out.shape == (1, 32)
    np.testing.assert_array_equal(out, ref)


def test_sample_and_group_identity_when_npoint_equals_n(rng):
    """npoint == N skips the FPS permutation (documented equivalence:
    every consumer is row-order invariant); new_xyz must be xyz itself."""
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))
    new_xyz, grouped = pointops.sample_and_group(
        64, 0.0, 8, xyz, feats, knn=True
    )
    np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(xyz))
    assert grouped.shape == (2, 64, 8, 8)
    # each point's own neighborhood contains itself: centered xyz row 0 == 0
    np.testing.assert_allclose(np.asarray(grouped)[:, :, 0, :3], 0.0, atol=1e-6)


def test_fps_pallas_custom_start(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    start = jnp.asarray([5, 17], dtype=jnp.int32)
    out = np.asarray(fps_pallas(jnp.asarray(xyz), 8, start=start, interpret=True))
    assert out[0, 0] == 5 and out[1, 0] == 17


def test_gather_rows_matches_take_along_axis(rng):
    from simple3dformer_tpu.kernels.gather import gather_rows

    B, N, C = 2, 300, 96
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    # R=1000 is not a multiple of the 256-row tile: exercises the pad path
    idx = jnp.asarray(rng.randint(0, N, size=(B, 1000)).astype(np.int32))
    out = gather_rows(pts, idx, interpret=True)
    ref = jnp.take_along_axis(pts, idx[..., None], axis=1)
    assert bool(jnp.all(out == ref))


def test_gather_rows_grad_matches_scatter_add(rng):
    from simple3dformer_tpu.kernels.gather import gather_rows

    B, N, C = 2, 128, 64
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, size=(B, 513)).astype(np.int32))
    cot = jnp.asarray(rng.randn(B, 513, C).astype(np.float32)).astype(jnp.bfloat16)

    def loss_k(p):
        return jnp.sum(gather_rows(p, idx, 256, True).astype(jnp.float32) * cot)

    def loss_x(p):
        return jnp.sum(
            jnp.take_along_axis(p, idx[..., None], 1).astype(jnp.float32) * cot)

    gk = jax.grad(loss_k)(pts).astype(jnp.float32)
    gx = jax.grad(loss_x)(pts).astype(jnp.float32)
    # kernel accumulates collisions in f32 then casts once; XLA's scatter-add
    # rounds per-collision — allow that rounding headroom
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), rtol=0.03, atol=0.05)


def test_mhsa_matches_einsum_attention(rng):
    from simple3dformer_tpu.kernels.mhsa import mhsa

    B, N, H, D = 2, 100, 3, 64  # N=100 exercises pad-column masking
    scale = D ** -0.5
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) * 0.3
               for _ in range(3))

    def ref(q, k, v):
        a = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", a, v)

    out = mhsa(q, k, v, scale, 512, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)),
                               rtol=2e-3, atol=2e-3)

    cot = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    gk = jax.grad(lambda *a: jnp.sum(mhsa(*a, scale, 512, True) * cot),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(ref(*a) * cot), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def _block_weights(params):
    p = params
    return dict(
        ln1_s=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
        wqkv=p["attn"]["qkv"]["kernel"], bqkv=p["attn"]["qkv"]["bias"],
        wproj=p["attn"]["proj"]["kernel"], bproj=p["attn"]["proj"]["bias"],
        ln2_s=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"],
        w1=p["mlp"]["fc1"]["kernel"], b1=p["mlp"]["fc1"]["bias"],
        w2=p["mlp"]["fc2"]["kernel"], b2=p["mlp"]["fc2"]["bias"],
    )


def test_fused_vit_block_matches_flax_block(rng):
    from simple3dformer_tpu.nn.layers import Block
    from simple3dformer_tpu.kernels.vit_block import (fused_vit_block,
                                                      fused_vit_block_train)

    B, N, D, H = 5, 26, 128, 2  # B=5 exercises fake-sample batch padding
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.5)
    blk = Block(num_heads=H)
    params = blk.init(jax.random.key(1), x)["params"]
    w = _block_weights(params)
    ref = blk.apply({"params": params}, x)
    for fn in (fused_vit_block, fused_vit_block_train):
        out = fn(x, w, H, None, True, 104)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_fused_vit_block_grads_match_flax(rng):
    from simple3dformer_tpu.nn.layers import Block
    from simple3dformer_tpu.kernels.vit_block import (fused_vit_block,
                                                      fused_vit_block_train)

    B, N, D, H = 3, 26, 128, 2
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.5)
    blk = Block(num_heads=H)
    params = blk.init(jax.random.key(1), x)["params"]
    w = _block_weights(params)
    cot = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    gx_r, gp_r = jax.grad(
        lambda x, p: jnp.sum(blk.apply({"params": p}, x) * cot),
        argnums=(0, 1))(x, params)
    gw_r = _block_weights(gp_r)
    for fn in (fused_vit_block, fused_vit_block_train):
        gx_k, gw_k = jax.grad(
            lambda x, w: jnp.sum(fn(x, w, H, None, True, 104) * cot),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-4)
        for k in gw_k:
            np.testing.assert_allclose(
                np.asarray(gw_k[k]), np.asarray(gw_r[k]), rtol=3e-3,
                atol=3e-3, err_msg=k)


def test_kernel_dispatch_guards(rng, monkeypatch):
    """Forced-on kernels must still yield to the einsum path whenever the
    caller needs the attention matrix (rollout capture) or dropout is live —
    the visualize CLI depends on this fallback."""
    import simple3dformer_tpu.nn.layers as L

    x = jnp.asarray(rng.randn(2, 20, 64).astype(np.float32))
    attn = L.Attention(num_heads=2)
    params = attn.init(jax.random.key(0), x)
    for flag in ("USE_FLASH", "USE_MHSA"):
        monkeypatch.setattr(L, flag, True)
        out, inter = attn.apply(params, x, mutable=["intermediates"])
        # capture present => einsum path ran despite the forced kernel flag
        probs = inter["intermediates"]["attn"][0]
        assert probs.shape == (2, 2, 20, 20)
        np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0,
                                   rtol=1e-5)
        monkeypatch.setattr(L, flag, None)

    blk = L.Block(num_heads=2, drop_path=0.1)
    bparams = blk.init(jax.random.key(1), x)
    monkeypatch.setattr(L, "USE_FUSED_BLOCK", True)
    # active droppath in train mode => fused path must decline (it cannot
    # express stochastic depth); run must not error and must differ from eval
    out_train = blk.apply(bparams, x, deterministic=False,
                          rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(np.asarray(out_train)).all()


def test_gather_dispatch_dtype_gate(rng, monkeypatch):
    """index_points must NOT route f32 values through the one-hot kernel
    (exact only for bf16); checked by forcing the switch on and asserting
    the f32 result is still take_along_axis-exact on adversarial values."""
    from simple3dformer_tpu.ops import pointops

    monkeypatch.setattr(pointops, "USE_PALLAS_GATHER", True)
    pts = jnp.asarray((rng.randn(2, 300, 96) * 1e20).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 300, size=(2, 400, 4)).astype(np.int32))
    out = pointops.index_points(pts, idx)
    ref = jnp.take_along_axis(pts, idx.reshape(2, -1, 1), axis=1
                              ).reshape(2, 400, 4, 96)
    assert bool(jnp.all(out == ref))


def test_fused_block_declines_vmem_hostile_shapes(rng, monkeypatch):
    """Odd N (e.g. 257, the partseg core) falls into the s=8 tile fallback
    whose per-head [T, T] probs would blow the VMEM budget — dispatch must
    decline and run the flax path."""
    import simple3dformer_tpu.nn.layers as L

    monkeypatch.setattr(L, "USE_FUSED_BLOCK", True)
    x = jnp.asarray(rng.randn(2, 257, 128).astype(np.float32) * 0.3)
    blk = L.Block(num_heads=2)
    params = blk.init(jax.random.key(0), x)
    out = blk.apply(params, x)  # must not route to the kernel (no crash)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_adam_matches_optax(rng):
    """kernels/adam.fused_adam_update == optax scale_by_adam + apply_lr +
    apply_updates, elementwise, over two chained steps (bias correction
    depends on the step count)."""
    import optax

    from simple3dformer_tpu.kernels.adam import fused_adam_update
    from simple3dformer_tpu.train.optim import apply_lr

    params = {
        "big": jnp.asarray(rng.randn(700, 128).astype(np.float32)),
        "nested": {"w": jnp.asarray(rng.randn(513, 130).astype(np.float32)),
                   "b": jnp.asarray(rng.randn(7).astype(np.float32))},
    }
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    state = tx.init(params)
    mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    nu = jax.tree_util.tree_map(jnp.zeros_like, params)
    p_ref, p_fused = params, params
    for step in (1, 2):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.randn(*p.shape).astype(np.float32)) * 1e-2, p_ref)
        updates, state = tx.update(grads, state, p_ref)
        p_ref = optax.apply_updates(p_ref, apply_lr(updates, 1e-3))
        p_fused, mu, nu = fused_adam_update(
            p_fused, grads, mu, nu, jnp.asarray(step, jnp.int32), 1e-3,
            interpret=True)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_fused_adam_pair_matches_masked_optax(rng):
    """fused_adam_pair's opt_update_fn (the train-loop hook) == the
    production multi_transform(Adam/set_to_zero) + apply chain, with frozen
    leaves byte-identical and carrying zero-size state."""
    import optax

    from simple3dformer_tpu.kernels.adam import fused_adam_pair
    from simple3dformer_tpu.train.optim import apply_lr, make_optimizer

    params = {
        "backbone": {"w": jnp.asarray(rng.randn(600, 140).astype(np.float32))},
        "head": {"w": jnp.asarray(rng.randn(520, 133).astype(np.float32)),
                 "b": jnp.asarray(rng.randn(5).astype(np.float32))},
    }
    mask = {"backbone": {"w": False}, "head": {"w": True, "b": True}}

    tx_ref = make_optimizer("Adam", trainable_mask=mask)
    st_ref = tx_ref.init(params)
    tx_f, update_fn = fused_adam_pair(trainable_mask=mask, interpret=True)
    st_f = tx_f.init(params)
    assert st_f["mu"]["backbone"]["w"].size == 0  # frozen leaf: no state

    p_ref, p_f = params, params
    for step in range(2):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.randn(*p.shape).astype(np.float32)) * 1e-2, p_ref)
        updates, st_ref = tx_ref.update(grads, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, apply_lr(updates, 3e-3))
        p_f, st_f = update_fn(grads, st_f, p_f, 3e-3)
        np.testing.assert_array_equal(  # frozen leaf untouched
            np.asarray(p_f["backbone"]["w"]),
            np.asarray(params["backbone"]["w"]))
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

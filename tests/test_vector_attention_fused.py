"""Fused Pallas vector-attention kernel vs the XLA/flax path.

Covers the kernel op directly (fwd + full VJP against the plain-jnp oracle
on XLA-gathered neighbors) and the VectorAttentionBlock module wiring
(FORCE_FUSED + interpret mode so the CPU suite exercises the exact
production code path). Reference math:
/root/reference/models/Hengshuang/transformer.py:29-42.
"""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.kernels.vector_attention import (
    fused_vector_attention, vector_attention_reference)
from simple3dformer_tpu.nn import vector_attention as va
from simple3dformer_tpu.ops import pointops


def _rand_inputs(rng, b=2, n=64, k=8, d=128):
    q = jnp.asarray(rng.randn(b, n, d).astype(np.float32) * 0.3)
    k_all = jnp.asarray(rng.randn(b, n, d).astype(np.float32) * 0.3)
    v_all = jnp.asarray(rng.randn(b, n, d).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, size=(b, n, k)).astype(np.int32))
    rel = jnp.asarray(rng.randn(b, n, k, 3).astype(np.float32))
    w = {name: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
         for name, s in [("wd1", (3, d)), ("bd1", (d,)), ("wd2", (d, d)),
                         ("bd2", (d,)), ("wg1", (d, d)), ("bg1", (d,)),
                         ("wg2", (d, d)), ("bg2", (d,))]}
    return q, k_all, v_all, idx, rel, w


def _oracle(q, k_all, v_all, idx, rel, w):
    k = pointops.index_points(k_all, idx)
    v = pointops.index_points(v_all, idx)
    return vector_attention_reference(q, k, v, rel, w)


def test_fused_op_forward_matches_oracle(rng):
    q, k_all, v_all, idx, rel, w = _rand_inputs(rng)
    out_f = fused_vector_attention(q, k_all, v_all, idx, rel, w, 32, True)
    out_r = _oracle(q, k_all, v_all, idx, rel, w)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_fused_op_vjp_matches_oracle(rng):
    q, k_all, v_all, idx, rel, w = _rand_inputs(rng)
    ct = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss(fn):
        def f(q, k_all, v_all, rel, w):
            return jnp.sum(fn(q, k_all, v_all, rel, w) * ct)
        return f

    gf = jax.grad(
        loss(lambda q, ka, va_, rel, w:
             fused_vector_attention(q, ka, va_, idx, rel, w, 32, True)),
        argnums=(0, 1, 2, 3, 4))(q, k_all, v_all, rel, w)
    gr = jax.grad(
        loss(lambda q, ka, va_, rel, w: _oracle(q, ka, va_, idx, rel, w)),
        argnums=(0, 1, 2, 3, 4))(q, k_all, v_all, rel, w)
    for name, a, b in zip(("gq", "gkall", "gvall", "grel"), gf[:4], gr[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    for name in gr[4]:
        scale = max(float(jnp.max(jnp.abs(gr[4][name]))), 1.0)
        np.testing.assert_allclose(
            np.asarray(gf[4][name]) / scale, np.asarray(gr[4][name]) / scale,
            rtol=1e-4, atol=1e-5, err_msg=name)


def test_fused_op_row_padding(rng):
    # N = 27, not a multiple of tile=32 -> exercises the N-axis padding.
    q, k_all, v_all, idx, rel, w = _rand_inputs(rng, b=3, n=27, k=5, d=128)
    out_f = fused_vector_attention(q, k_all, v_all, idx, rel, w, 32, True)
    out_r = _oracle(q, k_all, v_all, idx, rel, w)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_fused_op_duplicate_indices_scatter(rng):
    """Duplicate neighbor indices must accumulate grads (scatter-add)."""
    b, n, k, d = 1, 32, 4, 128
    q, k_all, v_all, _, rel, w = _rand_inputs(rng, b=b, n=n, k=k, d=d)
    idx = jnp.zeros((b, n, k), jnp.int32)  # every neighbor is point 0

    def f(ka):
        return jnp.sum(fused_vector_attention(q, ka, v_all, idx, rel, w,
                                              32, True) ** 2)

    def r(ka):
        return jnp.sum(_oracle(q, ka, v_all, idx, rel, w) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(k_all)),
                               np.asarray(jax.grad(r)(k_all)),
                               rtol=1e-4, atol=1e-5)


def test_module_fused_path_matches_xla_path(rng, monkeypatch):
    """VectorAttentionBlock with the fused kernel == flax path (fwd + grads)."""
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32) * 0.3)
    blk = va.VectorAttentionBlock(d_model=128, k=8)

    monkeypatch.setattr(va, "FORCE_FUSED", False)
    params = blk.init(jax.random.key(0), xyz, feats)["params"]
    out_x, attn_x = blk.apply({"params": params}, xyz, feats)
    assert attn_x is not None

    def loss(p, fused):
        monkeypatch.setattr(va, "FORCE_FUSED", fused)
        out, _ = blk.apply({"params": p}, xyz, feats)
        return jnp.sum(out ** 2)

    g_x = jax.grad(loss)(params, False)

    monkeypatch.setattr(va, "INTERPRET", True)
    monkeypatch.setattr(va, "FORCE_FUSED", True)
    # init under the fused path produces the identical tree
    params_f = blk.init(jax.random.key(0), xyz, feats)["params"]
    assert jax.tree_util.tree_structure(params_f) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params_f),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_f, attn_f = blk.apply({"params": params}, xyz, feats)
    assert attn_f is None
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    g_f = jax.grad(loss)(params, True)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, gx in flat_x:
        gf = flat_f[path]
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_pregathered_op_matches_oracle(rng):
    from simple3dformer_tpu.kernels.vector_attention import (
        fused_vector_attention_pregathered)

    q, k_all, v_all, idx, rel, w = _rand_inputs(rng)
    k = pointops.index_points(k_all, idx)
    v = pointops.index_points(v_all, idx)
    out_f = fused_vector_attention_pregathered(q, k, v, rel, w, 32, True)
    out_r = vector_attention_reference(q, k, v, rel, w)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss(fn):
        def f(q, k, v, rel, w):
            return jnp.sum(fn(q, k, v, rel, w) * ct)
        return f

    gf = jax.grad(loss(lambda *a: fused_vector_attention_pregathered(
        *a, 32, True)), argnums=(0, 1, 2, 3, 4))(q, k, v, rel, w)
    gr = jax.grad(loss(vector_attention_reference),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, rel, w)
    for name, a, b in zip(("gq", "gk", "gv", "grel"), gf[:4], gr[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    for name in gr[4]:
        scale = max(float(jnp.max(jnp.abs(gr[4][name]))), 1.0)
        np.testing.assert_allclose(
            np.asarray(gf[4][name]) / scale, np.asarray(gr[4][name]) / scale,
            rtol=1e-4, atol=1e-5, err_msg=name)


def test_resid_op_forward_matches_recompute_exactly(rng):
    """The residual-saving variant's fwd is the same kernel math — and its
    un-differentiated primal is literally the no-residual kernel."""
    from simple3dformer_tpu.kernels.vector_attention import (
        fused_vector_attention_resid)

    q, k_all, v_all, idx, rel, w = _rand_inputs(rng)
    out_r = fused_vector_attention_resid(q, k_all, v_all, idx, rel, w,
                                         32, True)
    out_f = fused_vector_attention(q, k_all, v_all, idx, rel, w, 32, True)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_f))


def test_resid_op_vjp_matches_oracle(rng):
    """f32 residual saves are exact, so the residual backward must hit the
    same oracle tolerances as the recompute backward."""
    from simple3dformer_tpu.kernels.vector_attention import (
        fused_vector_attention_resid)

    q, k_all, v_all, idx, rel, w = _rand_inputs(rng)
    ct = jnp.asarray(rng.randn(*q.shape).astype(np.float32))

    def loss(fn):
        def f(q, k_all, v_all, rel, w):
            return jnp.sum(fn(q, k_all, v_all, rel, w) * ct)
        return f

    gf = jax.grad(
        loss(lambda q, ka, va_, rel, w:
             fused_vector_attention_resid(q, ka, va_, idx, rel, w, 32, True)),
        argnums=(0, 1, 2, 3, 4))(q, k_all, v_all, rel, w)
    gr = jax.grad(
        loss(lambda q, ka, va_, rel, w: _oracle(q, ka, va_, idx, rel, w)),
        argnums=(0, 1, 2, 3, 4))(q, k_all, v_all, rel, w)
    for name, a, b in zip(("gq", "gkall", "gvall", "grel"), gf[:4], gr[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    for name in gr[4]:
        scale = max(float(jnp.max(jnp.abs(gr[4][name]))), 1.0)
        np.testing.assert_allclose(
            np.asarray(gf[4][name]) / scale, np.asarray(gr[4][name]) / scale,
            rtol=1e-4, atol=1e-5, err_msg=name)


def test_resid_op_row_padding_and_duplicates(rng):
    """N not a tile multiple + all-duplicate indices: padding rows must not
    pollute the scatter accumulators, duplicates must scatter-add."""
    from simple3dformer_tpu.kernels.vector_attention import (
        fused_vector_attention_resid)

    q, k_all, v_all, idx, rel, w = _rand_inputs(rng, b=3, n=27, k=5, d=128)
    idx = idx.at[:, :5].set(0)

    def f(ka):
        return jnp.sum(fused_vector_attention_resid(
            q, ka, v_all, idx, rel, w, 32, True) ** 2)

    def r(ka):
        return jnp.sum(_oracle(q, ka, v_all, idx, rel, w) ** 2)

    np.testing.assert_allclose(np.asarray(f(k_all)), np.asarray(r(k_all)),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(k_all)),
                               np.asarray(jax.grad(r)(k_all)),
                               rtol=1e-4, atol=1e-5)


def test_module_bf16_resid_dispatch(rng, monkeypatch):
    """bf16 module path routes through the residual variant by default and
    falls back to the recompute kernel under S3F_VA_RESID=0 / the HBM cap —
    same grads either way (bf16 u/a rounding tolerance)."""
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32) * 0.3)
    blk = va.VectorAttentionBlock(d_model=128, k=8, dtype=jnp.bfloat16)
    params = blk.init(jax.random.key(0), xyz, feats)["params"]

    monkeypatch.setattr(va, "INTERPRET", True)
    monkeypatch.setattr(va, "FORCE_FUSED", True)

    def loss(p):
        out, _ = blk.apply({"params": p}, xyz, feats)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    calls = []
    real_resid = va.fused_vector_attention_resid
    real_recomp = va.fused_vector_attention
    monkeypatch.setattr(
        va, "fused_vector_attention_resid",
        lambda *a, **k: calls.append("resid") or real_resid(*a, **k))
    monkeypatch.setattr(
        va, "fused_vector_attention",
        lambda *a, **k: calls.append("recompute") or real_recomp(*a, **k))

    g_resid = jax.grad(loss)(params)
    assert "resid" in calls and "recompute" not in calls

    calls.clear()
    monkeypatch.setenv("S3F_VA_RESID", "0")
    g_recomp = jax.grad(loss)(params)
    assert "recompute" in calls and "resid" not in calls

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_resid),
            jax.tree_util.tree_leaves_with_path(g_recomp)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(float(np.max(np.abs(b))), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-2, atol=2e-2,
                                   err_msg=jax.tree_util.keystr(path))


def test_module_fused_bf16_path(rng, monkeypatch):
    """bf16 module path dispatches to the in-kernel-gather kernel."""
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32) * 0.3)
    blk = va.VectorAttentionBlock(d_model=128, k=8, dtype=jnp.bfloat16)
    params = blk.init(jax.random.key(0), xyz, feats)["params"]

    monkeypatch.setattr(va, "FORCE_FUSED", False)
    out_x, _ = blk.apply({"params": params}, xyz, feats)

    monkeypatch.setattr(va, "INTERPRET", True)
    monkeypatch.setattr(va, "FORCE_FUSED", True)
    out_f, attn_f = blk.apply({"params": params}, xyz, feats)
    assert attn_f is None
    # kernel does bias/ReLU/softmax in f32 vs flax all-bf16: loose tolerance
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=5e-2, atol=5e-2)

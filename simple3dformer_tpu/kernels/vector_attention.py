"""Pallas TPU kernel: fused Point-Transformer vector-attention neighborhood chain.

Reference math: /root/reference/models/Hengshuang/transformer.py:29-42 —
per query point with K gathered neighbors,

    pos    = fc_delta(rel_xyz)                  (Linear 3->D, ReLU, Linear D->D)
    logits = fc_gamma(q - k + pos)              (Linear D->D, ReLU, Linear D->D)
    attn   = softmax(logits / sqrt(D), axis=K)
    out    = sum_K attn * (v + pos)

Why a kernel (measured on the real chip, B=64, N=1024, K=16, D=512, honest
carry-dependent timing — scripts/honest_profile.py):

* XLA cannot fuse matmul->matmul chains, so the chain materializes ~6
  [B,N,K,D] HBM intermediates per forward and keeps most as backward
  residuals (2.1 GB each in f32) — chain f/b alone measured 108.8 ms bf16.
* XLA's take_along_axis gather is ~10x off HBM speed-of-light (16.2 ms fwd)
  and its scatter-add VJP worse (30.1 ms) — per gathered operand.

This kernel fuses gather + chain + softmax + aggregation per (batch, query
tile) grid cell: k_all/v_all stay VMEM-resident for a whole batch element,
neighbors are gathered ON THE MXU via a one-hot matmul (exact: one-hot rows
select bf16/f32 values losslessly — the f32 path uses HIGHEST precision,
i.e. the bf16x6 decomposition, for the gather contractions), the three DxD
matmuls run back-to-back, and only [B,N,D] tensors ever touch HBM. The
backward is a second kernel that *recomputes* the forward in VMEM
(flash-attention-style: zero saved [B,N,K,D] residuals), scatters neighbor
grads with the transposed one-hot matmul into VMEM-accumulated [N,D] blocks,
and accumulates weight grads across the (sequential) TPU grid.

Measured kernel-level win at the shape above: chain+gathers f/b
108.8 + 2x41.7 ms (XLA) -> see scripts/honest_profile.py for the standing
fused numbers.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import dtypes as jax_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, w, precision=None):
    """[R, I] @ [I, O] on the MXU with f32 accumulation."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _mm_t(a, w):
    """[R, O] @ [I, O]^T -> [R, I], f32 accumulation."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_at(a, b, precision=None):
    """[R, I]^T @ [R, O] -> [I, O], f32 accumulation (weight grads/scatter)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _gather_precision(dtype):
    # one-hot gather of f32 values must run bf16x6 (HIGHEST) to be exact;
    # bf16 values are exact under any MXU pass count.
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _chain_fwd(q, k, v, rel, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
               *, kk, dtype):
    """Shared forward math on one tile. q [T,D]; k/v [TK,D] f32; rel [TK,3].

    Biases are added and ReLU/softmax taken in f32; matmul operands are cast
    to the compute dtype so the MXU runs at full rate, accumulation stays
    f32 (matches flax Dense with dtype=bf16 up to its output-cast rounding).
    """
    t, d = q.shape
    hd_pre = _mm(rel.astype(dtype), wd1.astype(dtype)) + bd1
    hd = jnp.maximum(hd_pre, 0.0)
    pos = _mm(hd.astype(dtype), wd2.astype(dtype)) + bd2  # [TK, D] f32
    q_rep = jnp.broadcast_to(q.astype(jnp.float32)[:, None, :], (t, kk, d))
    x = q_rep.reshape(t * kk, d) - k + pos
    hg_pre = _mm(x.astype(dtype), wg1.astype(dtype)) + bg1
    hg = jnp.maximum(hg_pre, 0.0)
    logits = _mm(hg.astype(dtype), wg2.astype(dtype)) + bg2  # [TK, D] f32
    z = logits.reshape(t, kk, d) * (1.0 / (d ** 0.5))
    z = z - jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z)
    a = e / jnp.sum(e, axis=1, keepdims=True)  # [T, K, D] f32
    u = v + pos
    out = jnp.sum(a * u.reshape(t, kk, d), axis=1)  # [T, D] f32
    return hd_pre, hd, pos, x, hg_pre, hg, a, u, out


def _gather_kv(kall_ref, vall_ref, idx_ref, n, dtype):
    """One-hot MXU gather: rows idx of k_all/v_all, cast to chain dtype.

    idx_ref block is [1, T*K, 1] (pre-flattened to a column in the wrapper:
    Mosaic cannot shape-cast a [T, K] lane-dim block into a [T*K, 1] column,
    and TPU block shapes need the last two dims (8, 128)-aligned or
    array-equal — a trailing size-1 lane dim satisfies both).
    """
    idxc = idx_ref[0]  # [T*K, 1] column
    oh = (jax.lax.broadcasted_iota(jnp.int32, (idxc.shape[0], n), 1)
          == idxc).astype(dtype)
    prec = _gather_precision(dtype)
    k = _mm(oh, kall_ref[0].astype(dtype), precision=prec)  # [TK, D] f32
    v = _mm(oh, vall_ref[0].astype(dtype), precision=prec)
    return oh, k, v


def _fwd_kernel(q_ref, kall_ref, vall_ref, idx_ref, rel_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                out_ref, *, kk, dtype):
    n = kall_ref.shape[1]
    _, k, v = _gather_kv(kall_ref, vall_ref, idx_ref, n, dtype)
    *_, out = _chain_fwd(
        q_ref[0], k, v, rel_ref[0],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, kall_ref, vall_ref, idx_ref, rel_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref, g_ref,
                gq_ref, gkall_ref, gvall_ref, grel_ref,
                gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref,
                *, kk, dtype):
    """Recompute forward in VMEM, then backprop. g_kall/g_vall accumulate
    across the query tiles of one batch element (grid dim 1); weight grads
    accumulate across the whole sequential grid."""

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        for r in (gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                  gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(pl.program_id(1) == 0)
    def _():
        gkall_ref[...] = jnp.zeros_like(gkall_ref)
        gvall_ref[...] = jnp.zeros_like(gvall_ref)

    n = kall_ref.shape[1]
    t, d = q_ref.shape[1], q_ref.shape[2]
    oh, k, v = _gather_kv(kall_ref, vall_ref, idx_ref, n, dtype)
    hd_pre, hd, pos, x, hg_pre, hg, a, u, _ = _chain_fwd(
        q_ref[0], k, v, rel_ref[0],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)

    g = g_ref[0].astype(jnp.float32)  # [T, D]
    g3 = jnp.broadcast_to(g[:, None, :], (t, kk, d))
    u3 = u.reshape(t, kk, d)
    g_a = g3 * u3
    g_u = (a * g3).reshape(t * kk, d)  # = g_v and the aggregation g_pos part
    # softmax bwd over K (with the 1/sqrt(D) logits scale)
    g_z = a * (g_a - jnp.sum(a * g_a, axis=1, keepdims=True))
    g_logits = (g_z * (1.0 / (d ** 0.5))).reshape(t * kk, d)

    gl = g_logits.astype(dtype)
    g_hg = _mm_t(gl, wg2_ref[...].astype(dtype)) * (hg_pre > 0)
    gwg2_ref[...] += _mm_at(hg.astype(dtype), gl)
    gbg2_ref[...] += jnp.sum(g_logits, axis=0, keepdims=True)

    ghg = g_hg.astype(dtype)
    g_x = _mm_t(ghg, wg1_ref[...].astype(dtype))  # [TK, D]
    gwg1_ref[...] += _mm_at(x.astype(dtype), ghg)
    gbg1_ref[...] += jnp.sum(g_hg, axis=0, keepdims=True)

    g_pos = g_x + g_u
    gp = g_pos.astype(dtype)
    g_hd = _mm_t(gp, wd2_ref[...].astype(dtype)) * (hd_pre > 0)
    gwd2_ref[...] += _mm_at(hd.astype(dtype), gp)
    gbd2_ref[...] += jnp.sum(g_pos, axis=0, keepdims=True)

    ghd = g_hd.astype(dtype)
    g_rel = _mm_t(ghd, wd1_ref[...].astype(dtype))  # [TK, 3]
    gwd1_ref[...] += _mm_at(rel_ref[0].astype(dtype), ghd)
    gbd1_ref[...] += jnp.sum(g_hd, axis=0, keepdims=True)

    gq_ref[0] = jnp.sum(g_x.reshape(t, kk, d), axis=1).astype(gq_ref.dtype)
    # scatter-add neighbor grads back to per-point rows on the MXU
    prec = _gather_precision(dtype)
    gkall_ref[0] += _mm_at(oh, (-g_x).astype(dtype), precision=prec)
    gvall_ref[0] += _mm_at(oh, g_u.astype(dtype), precision=prec)
    grel_ref[0] = g_rel.astype(grel_ref.dtype)


def _pad_n(arr, npad):
    """Pad axis 1 (the N query axis) with zeros."""
    pad = npad - arr.shape[1]
    if pad:
        spec = [(0, 0)] * arr.ndim
        spec[1] = (0, pad)
        arr = jnp.pad(arr, spec)
    return arr


_WNAMES = ("wd1", "bd1", "wd2", "bd2", "wg1", "bg1", "wg2", "bg2")


def _weight_list(weights):
    return [weights[k].reshape(1, -1) if weights[k].ndim == 1 else weights[k]
            for k in _WNAMES]


def _prep(q, idx, rel, tile):
    b, n, kk = idx.shape
    npad = ((n + tile - 1) // tile) * tile
    q2 = _pad_n(q, npad)
    # padded rows gather row 0; their outputs are sliced off
    idx2 = _pad_n(idx, npad).reshape(b, npad * kk, 1)
    rel2 = _pad_n(rel, npad).reshape(b, npad * kk, 3)
    return q2, idx2, rel2, npad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_vector_attention(q, k_all, v_all, idx, rel, weights,
                           tile=32, interpret=False):
    """Fused gather + softmax(fc_gamma(q-k+pos)/sqrt(D)) * (v+pos) aggregation.

    q, k_all, v_all [B,N,D] (pre-projection outputs, NOT gathered);
    idx [B,N,K] int32 kNN indices into the N axis; rel [B,N,K,3] relative
    xyz; weights dict with wd1 [3,D], bd1 [D], wd2 [D,D], bd2 [D], wg1,
    bg1, wg2, bg2 (f32 storage; compute dtype follows q.dtype).
    Returns out [B,N,D] in q.dtype.
    """
    return _fused_fwd_impl(q, k_all, v_all, idx, rel, weights, tile, interpret)


def _fused_fwd_impl(q, k_all, v_all, idx, rel, weights, tile, interpret):
    b, n, kk = idx.shape
    d = q.shape[-1]
    dtype = q.dtype
    q2, idx2, rel2, npad = _prep(q, idx, rel, tile)
    grid = (b, npad // tile)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile * kk, 1), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0))
             for w in _weight_list(weights)],
        out_specs=pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, npad, d), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q2, k_all, v_all, idx2, rel2,
      *[w.astype(jnp.float32) for w in _weight_list(weights)])
    return out[:, :n]


def _fused_fwd(q, k_all, v_all, idx, rel, weights, tile, interpret):
    return (_fused_fwd_impl(q, k_all, v_all, idx, rel, weights, tile,
                            interpret),
            (q, k_all, v_all, idx, rel, weights))


def _fused_bwd(tile, interpret, res, g):
    q, k_all, v_all, idx, rel, weights = res
    b, n, kk = idx.shape
    d = q.shape[-1]
    dtype = q.dtype
    q2, idx2, rel2, npad = _prep(q, idx, rel, tile)
    g2 = _pad_n(g, npad)
    grid = (b, npad // tile)
    wl = _weight_list(weights)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile * kk, 1), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0)) for w in wl]
          + [pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0))],
        out_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0)) for w in wl],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, d), dtype),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, npad * kk, 3), dtype),
        ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wl],
        # The recompute backward holds k_all/v_all + their grad accumulators
        # + ~9 [T*K, D] f32 tiles + weight mats/grads live; the default
        # 16 MB scoped-VMEM cap is too small. v5e/v6e have 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q2, k_all, v_all, idx2, rel2,
      *[w.astype(jnp.float32) for w in wl], g2)

    gq = outs[0][:, :n]
    gkall = outs[1].astype(k_all.dtype)
    gvall = outs[2].astype(v_all.dtype)
    grel = outs[3].reshape(b, npad, kk, 3)[:, :n]
    gidx = np.zeros(idx.shape, dtype=jax_dtypes.float0)
    gw = dict(zip(_WNAMES, outs[4:]))
    for name in _WNAMES:
        want = weights[name].shape
        gw[name] = gw[name].reshape(want).astype(weights[name].dtype)
    return gq, gkall, gvall, gidx, grel, gw


fused_vector_attention.defvjp(_fused_fwd, _fused_bwd)


def vector_attention_reference(q, k, v, rel, weights):
    """Plain-jnp mirror of the fused chain on PRE-GATHERED neighbors
    (parity oracle for the kernel). k, v [B,N,K,D].

    Matches the kernel's precision policy (f32 bias/ReLU/softmax, matmuls in
    q.dtype with f32 accumulation), not flax Dense's all-compute-dtype one.
    """
    dtype = q.dtype
    d = q.shape[-1]

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dtype), w.astype(dtype),
            dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    hd = jnp.maximum(mm(rel, weights["wd1"]) + weights["bd1"], 0.0)
    pos = mm(hd.astype(dtype), weights["wd2"]) + weights["bd2"]
    x = q[:, :, None, :].astype(jnp.float32) - k.astype(jnp.float32) + pos
    hg = jnp.maximum(mm(x, weights["wg1"]) + weights["bg1"], 0.0)
    logits = mm(hg.astype(dtype), weights["wg2"]) + weights["bg2"]
    a = jax.nn.softmax(logits / (d ** 0.5), axis=2)
    out = jnp.sum(a * (v.astype(jnp.float32) + pos), axis=2)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Pre-gathered variant: takes k, v already gathered to [B,N,K,D] (XLA
# take_along_axis outside; its scatter-add VJP is JAX's). Used for the f32
# path: an EXACT f32 one-hot gather needs HIGHEST precision (bf16x6 — the
# one-hot operand is a single exact bf16 term but the f32 values need all
# three decomposition terms against it), which measures slower end-to-end
# than XLA's gathers at f32 (e2e 191 vs 302 samples/sec on train_cls
# Hengshuang); bf16 one-hot gathers are exact at DEFAULT precision, so the
# bf16 path uses the in-kernel-gather kernel above.
# ---------------------------------------------------------------------------


def _fwd_kernel_pg(q_ref, k_ref, v_ref, rel_ref,
                   wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                   wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                   out_ref, *, kk, dtype):
    *_, out = _chain_fwd(
        q_ref[...], k_ref[...].astype(jnp.float32),
        v_ref[...].astype(jnp.float32), rel_ref[...],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel_pg(q_ref, k_ref, v_ref, rel_ref,
                   wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                   wg1_ref, bg1_ref, wg2_ref, bg2_ref, g_ref,
                   gq_ref, gk_ref, gv_ref, grel_ref,
                   gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                   gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref,
                   *, kk, dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                  gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref):
            r[...] = jnp.zeros_like(r)

    t, d = q_ref.shape
    hd_pre, hd, pos, x, hg_pre, hg, a, u, _ = _chain_fwd(
        q_ref[...], k_ref[...].astype(jnp.float32),
        v_ref[...].astype(jnp.float32), rel_ref[...],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)

    g = g_ref[...].astype(jnp.float32)  # [T, D]
    g3 = jnp.broadcast_to(g[:, None, :], (t, kk, d))
    u3 = u.reshape(t, kk, d)
    g_a = g3 * u3
    g_u = (a * g3).reshape(t * kk, d)
    g_z = a * (g_a - jnp.sum(a * g_a, axis=1, keepdims=True))
    g_logits = (g_z * (1.0 / (d ** 0.5))).reshape(t * kk, d)

    gl = g_logits.astype(dtype)
    g_hg = _mm_t(gl, wg2_ref[...].astype(dtype)) * (hg_pre > 0)
    gwg2_ref[...] += _mm_at(hg.astype(dtype), gl)
    gbg2_ref[...] += jnp.sum(g_logits, axis=0, keepdims=True)

    ghg = g_hg.astype(dtype)
    g_x = _mm_t(ghg, wg1_ref[...].astype(dtype))
    gwg1_ref[...] += _mm_at(x.astype(dtype), ghg)
    gbg1_ref[...] += jnp.sum(g_hg, axis=0, keepdims=True)

    g_pos = g_x + g_u
    gp = g_pos.astype(dtype)
    g_hd = _mm_t(gp, wd2_ref[...].astype(dtype)) * (hd_pre > 0)
    gwd2_ref[...] += _mm_at(hd.astype(dtype), gp)
    gbd2_ref[...] += jnp.sum(g_pos, axis=0, keepdims=True)

    ghd = g_hd.astype(dtype)
    g_rel = _mm_t(ghd, wd1_ref[...].astype(dtype))
    gwd1_ref[...] += _mm_at(rel_ref[...].astype(dtype), ghd)
    gbd1_ref[...] += jnp.sum(g_hd, axis=0, keepdims=True)

    gq_ref[...] = jnp.sum(g_x.reshape(t, kk, d), axis=1).astype(gq_ref.dtype)
    gk_ref[...] = (-g_x).astype(gk_ref.dtype)
    gv_ref[...] = g_u.astype(gv_ref.dtype)
    grel_ref[...] = g_rel.astype(grel_ref.dtype)


def _pad_rows(arr, rows):
    pad = rows - arr.shape[0]
    if pad:
        arr = jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))
    return arr


def _flatten_pg(q, k, v, rel, tile):
    """[B,N,D]/[B,N,K,D] -> row-major 2D with N-tile padding."""
    b, n, kk, d = k.shape
    r = ((n * b + tile - 1) // tile) * tile
    q2 = _pad_rows(q.reshape(b * n, d), r)
    k2 = _pad_rows(k.reshape(b * n * kk, d), r * kk)
    v2 = _pad_rows(v.reshape(b * n * kk, d), r * kk)
    rel2 = _pad_rows(rel.reshape(b * n * kk, 3), r * kk)
    return q2, k2, v2, rel2, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_vector_attention_pregathered(q, k, v, rel, weights,
                                       tile=32, interpret=False):
    """Fused chain on PRE-GATHERED neighbors k, v [B,N,K,D] (f32 path)."""
    return _fused_fwd_impl_pg(q, k, v, rel, weights, tile, interpret)


def _fused_fwd_impl_pg(q, k, v, rel, weights, tile, interpret):
    b, n, kk, d = k.shape
    dtype = q.dtype
    q2, k2, v2, rel2, r = _flatten_pg(q, k, v, rel, tile)
    grid = (r // tile,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_pg, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, 3), lambda i: (i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0))
             for w in _weight_list(weights)],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q2, k2, v2, rel2,
      *[w.astype(jnp.float32) for w in _weight_list(weights)])
    return out[: b * n].reshape(b, n, d)


def _fused_fwd_pg(q, k, v, rel, weights, tile, interpret):
    return (_fused_fwd_impl_pg(q, k, v, rel, weights, tile, interpret),
            (q, k, v, rel, weights))


def _fused_bwd_pg(tile, interpret, res, g):
    q, k, v, rel, weights = res
    b, n, kk, d = k.shape
    dtype = q.dtype
    q2, k2, v2, rel2, r = _flatten_pg(q, k, v, rel, tile)
    g2 = _pad_rows(g.reshape(b * n, d), r)
    grid = (r // tile,)
    wl = _weight_list(weights)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_pg, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, 3), lambda i: (i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in wl]
          + [pl.BlockSpec((tile, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, 3), lambda i: (i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in wl],
        out_shape=[
            jax.ShapeDtypeStruct((r, d), dtype),
            jax.ShapeDtypeStruct((r * kk, d), dtype),
            jax.ShapeDtypeStruct((r * kk, d), dtype),
            jax.ShapeDtypeStruct((r * kk, 3), dtype),
        ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wl],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q2, k2, v2, rel2, *[w.astype(jnp.float32) for w in wl], g2)

    gq = outs[0][: b * n].reshape(b, n, d)
    gk = outs[1][: b * n * kk].reshape(b, n, kk, d)
    gv = outs[2][: b * n * kk].reshape(b, n, kk, d)
    grel = outs[3][: b * n * kk].reshape(b, n, kk, 3)
    gw = dict(zip(_WNAMES, outs[4:]))
    for name in _WNAMES:
        want = weights[name].shape
        gw[name] = gw[name].reshape(want).astype(weights[name].dtype)
    return gq, gk, gv, grel, gw


fused_vector_attention_pregathered.defvjp(_fused_fwd_pg, _fused_bwd_pg)


# ---------------------------------------------------------------------------
# Residual-saving variant (bf16 train path). The recompute backward above is
# the right call when residuals don't fit (f32), but at bf16 it re-runs the
# gathers + whole chain: measured on-chip at B=64,N=1024,K=16,D=512 the
# kernel is ~89% of MXU peak, i.e. FLOP-bound, and the recompute is ~29% of
# total kernel FLOPs (gather re-pass 1.07 GF/cell + chain re-pass 0.81
# GF/cell of 6.44 GF/cell f/b). Saving exactly four [B,N*K,D] compute-dtype
# tensors (x, u, hg_pre, softmax a) removes ALL backward recompute:
#
#   * x and hg_pre are BIT-EXACT saves: the recompute backward itself only
#     ever uses them cast to the compute dtype (weight-grad matmuls) or via
#     their sign (ReLU masks, exact under round-to-nearest);
#   * u and a are rounded to the compute dtype (<=0.4% rel at bf16) on the
#     softmax-bwd/elementwise paths — grads deviate by O(bf16 eps), bounded
#     by tests/test_vector_attention_fused.py against the oracle;
#   * the backward also no longer needs k_all/v_all VMEM-resident (only the
#     one-hot rebuild for the two scatter matmuls).
#
# HBM cost: 4 tensors written in fwd + read in bwd (8.6 GB total traffic at
# the flagship level-0 shape) hides under the remaining ~47 ms of MXU time.
# The un-differentiated primal still runs the no-residual forward kernel, so
# eval/inference pays nothing. Dispatch policy lives in
# nn/vector_attention.py (S3F_VA_RESID, HBM cap).
# ---------------------------------------------------------------------------


def _fwd_kernel_res(q_ref, kall_ref, vall_ref, idx_ref, rel_ref,
                    wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                    wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                    out_ref, x_ref, u_ref, hgp_ref, a_ref, *, kk, dtype):
    n = kall_ref.shape[1]
    _, k, v = _gather_kv(kall_ref, vall_ref, idx_ref, n, dtype)
    _, _, _, x, hg_pre, _, a, u, out = _chain_fwd(
        q_ref[0], k, v, rel_ref[0],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)
    out_ref[0] = out.astype(out_ref.dtype)
    x_ref[0] = x.astype(x_ref.dtype)
    u_ref[0] = u.astype(u_ref.dtype)
    hgp_ref[0] = hg_pre.astype(hgp_ref.dtype)
    a_ref[0] = a.reshape(x.shape[0], x.shape[1]).astype(a_ref.dtype)


def _bwd_kernel_res(idx_ref, rel_ref,
                    wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                    wg1_ref, bg1_ref, wg2_ref, bg2_ref, g_ref,
                    x_ref, u_ref, hgp_ref, a_ref,
                    gq_ref, gkall_ref, gvall_ref, grel_ref,
                    gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                    gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref,
                    *, kk, dtype):
    """Backward from saved residuals: grad matmuls + scatters only. The only
    recompute is the cheap 3->D fc_delta hidden (for its ReLU mask/weight
    grad) and the one-hot rebuild for the two scatter matmuls."""

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        for r in (gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                  gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(pl.program_id(1) == 0)
    def _():
        gkall_ref[...] = jnp.zeros_like(gkall_ref)
        gvall_ref[...] = jnp.zeros_like(gvall_ref)

    n = gkall_ref.shape[1]
    t, d = g_ref.shape[1], g_ref.shape[2]

    idxc = idx_ref[0]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (idxc.shape[0], n), 1)
          == idxc).astype(dtype)

    hd_pre = _mm(rel_ref[0].astype(dtype), wd1_ref[...].astype(dtype)) \
        + bd1_ref[...]
    hd = jnp.maximum(hd_pre, 0.0)

    x = x_ref[0]                                   # compute dtype (exact)
    u = u_ref[0].astype(jnp.float32)
    hg_pre = hgp_ref[0].astype(jnp.float32)
    hg = jnp.maximum(hg_pre, 0.0)
    a = a_ref[0].astype(jnp.float32).reshape(t, kk, d)

    g = g_ref[0].astype(jnp.float32)  # [T, D]
    g3 = jnp.broadcast_to(g[:, None, :], (t, kk, d))
    u3 = u.reshape(t, kk, d)
    g_a = g3 * u3
    g_u = (a * g3).reshape(t * kk, d)
    g_z = a * (g_a - jnp.sum(a * g_a, axis=1, keepdims=True))
    g_logits = (g_z * (1.0 / (d ** 0.5))).reshape(t * kk, d)

    gl = g_logits.astype(dtype)
    g_hg = _mm_t(gl, wg2_ref[...].astype(dtype)) * (hg_pre > 0)
    gwg2_ref[...] += _mm_at(hg.astype(dtype), gl)
    gbg2_ref[...] += jnp.sum(g_logits, axis=0, keepdims=True)

    ghg = g_hg.astype(dtype)
    g_x = _mm_t(ghg, wg1_ref[...].astype(dtype))  # [TK, D]
    gwg1_ref[...] += _mm_at(x.astype(dtype), ghg)
    gbg1_ref[...] += jnp.sum(g_hg, axis=0, keepdims=True)

    g_pos = g_x + g_u
    gp = g_pos.astype(dtype)
    g_hd = _mm_t(gp, wd2_ref[...].astype(dtype)) * (hd_pre > 0)
    gwd2_ref[...] += _mm_at(hd.astype(dtype), gp)
    gbd2_ref[...] += jnp.sum(g_pos, axis=0, keepdims=True)

    ghd = g_hd.astype(dtype)
    g_rel = _mm_t(ghd, wd1_ref[...].astype(dtype))  # [TK, 3]
    gwd1_ref[...] += _mm_at(rel_ref[0].astype(dtype), ghd)
    gbd1_ref[...] += jnp.sum(g_hd, axis=0, keepdims=True)

    gq_ref[0] = jnp.sum(g_x.reshape(t, kk, d), axis=1).astype(gq_ref.dtype)
    prec = _gather_precision(dtype)
    gkall_ref[0] += _mm_at(oh, (-g_x).astype(dtype), precision=prec)
    gvall_ref[0] += _mm_at(oh, g_u.astype(dtype), precision=prec)
    grel_ref[0] = g_rel.astype(grel_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_vector_attention_resid(q, k_all, v_all, idx, rel, weights,
                                 tile=32, interpret=False):
    """fused_vector_attention with a residual-saving backward (see above).

    Same signature/semantics; forward outputs are identical (same kernel
    math). Only use when 4*B*N*K*D*itemsize of extra HBM is affordable —
    nn/vector_attention.py gates on that.
    """
    # Un-differentiated primal: no residuals are needed, run the plain
    # forward kernel (eval/inference pays zero extra HBM).
    return _fused_fwd_impl(q, k_all, v_all, idx, rel, weights, tile,
                           interpret)


def _fused_fwd_res(q, k_all, v_all, idx, rel, weights, tile, interpret):
    b, n, kk = idx.shape
    d = q.shape[-1]
    dtype = q.dtype
    q2, idx2, rel2, npad = _prep(q, idx, rel, tile)
    grid = (b, npad // tile)
    res_spec = pl.BlockSpec((1, tile * kk, d), lambda bi, i: (bi, i, 0))
    res_shape = jax.ShapeDtypeStruct((b, npad * kk, d), dtype)
    out, x_s, u_s, hgp_s, a_s = pl.pallas_call(
        functools.partial(_fwd_kernel_res, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile * kk, 1), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0))
             for w in _weight_list(weights)],
        out_specs=[pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
                   res_spec, res_spec, res_spec, res_spec],
        out_shape=[jax.ShapeDtypeStruct((b, npad, d), dtype),
                   res_shape, res_shape, res_shape, res_shape],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q2, k_all, v_all, idx2, rel2,
      *[w.astype(jnp.float32) for w in _weight_list(weights)])
    return out[:, :n], (idx, rel, weights, x_s, u_s, hgp_s, a_s)


def _fused_bwd_res(tile, interpret, res, g):
    idx, rel, weights, x_s, u_s, hgp_s, a_s = res
    b, n, kk = idx.shape
    d = x_s.shape[-1]
    dtype = x_s.dtype
    _, idx2, rel2, npad = _prep(jnp.zeros((b, n, d), dtype), idx, rel, tile)
    g2 = _pad_n(g, npad)
    grid = (b, npad // tile)
    wl = _weight_list(weights)
    res_spec = pl.BlockSpec((1, tile * kk, d), lambda bi, i: (bi, i, 0))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_res, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile * kk, 1), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0)) for w in wl]
          + [pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
             res_spec, res_spec, res_spec, res_spec],
        out_specs=[
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile * kk, 3), lambda bi, i: (bi, i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda bi, i: (0, 0)) for w in wl],
        out_shape=[
            jax.ShapeDtypeStruct((b, npad, d), dtype),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, npad * kk, 3), dtype),
        ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wl],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(idx2, rel2, *[w.astype(jnp.float32) for w in wl], g2,
      x_s, u_s, hgp_s, a_s)

    gq = outs[0][:, :n]
    gkall = outs[1].astype(dtype)
    gvall = outs[2].astype(dtype)
    grel = outs[3].reshape(b, npad, kk, 3)[:, :n].astype(rel.dtype)
    gidx = np.zeros(idx.shape, dtype=jax_dtypes.float0)
    gw = dict(zip(_WNAMES, outs[4:]))
    for name in _WNAMES:
        want = weights[name].shape
        gw[name] = gw[name].reshape(want).astype(weights[name].dtype)
    return gq, gkall, gvall, gidx, grel, gw


fused_vector_attention_resid.defvjp(_fused_fwd_res, _fused_bwd_res)

"""Pallas TPU kernel: fused Point-Transformer vector-attention neighborhood chain.

Reference math: /root/reference/models/Hengshuang/transformer.py:29-42 —
per query point with K gathered neighbors,

    pos    = fc_delta(rel_xyz)                  (Linear 3->D, ReLU, Linear D->D)
    logits = fc_gamma(q - k + pos)              (Linear D->D, ReLU, Linear D->D)
    attn   = softmax(logits / sqrt(D), axis=K)
    out    = sum_K attn * (v + pos)

The XLA path materializes ~6 [B,N,K,D] intermediates in HBM per forward
(relu_delta, pos, q-k+pos, gamma hidden, logits, attn, v+pos) because XLA
cannot fuse matmul->matmul chains; at the Hengshuang transformer1 shape
(B=64, N=1024, K=16, D=512) each is 2.1 GB f32, and the backward pass keeps
most of them as residuals — blowing past HBM and forcing remat/spills (the
measured 5.7x f32 vs bf16 gap in scripts/profile_vector_attention.py).

This kernel fuses the whole chain per tile of T query rows: neighbor rows
stream through VMEM once, the three DxD matmuls run back-to-back on the MXU,
softmax + aggregation happen in registers/VMEM, and only the [B,N,D] result
is written. The backward is a second kernel that *recomputes* the forward
intermediates in VMEM (flash-attention-style: zero saved residuals) and
accumulates weight gradients across the sequential TPU grid into
VMEM-resident [D,D] blocks.

The neighbor gathers (k, v, rel from kNN indices) stay in XLA outside the
kernel, so their scatter-add VJP is handled by JAX; the kernel's custom_vjp
covers everything downstream of the gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, w, prefer=jnp.float32):
    """[R, I] @ [I, O] on the MXU with f32 accumulation."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=prefer,
    )


def _mm_t(a, w):
    """[R, O] @ [I, O]^T -> [R, I], f32 accumulation."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_at(a, b):
    """[R, I]^T @ [R, O] -> [I, O], f32 accumulation (weight grads)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chain_fwd(q, k, v, rel, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
               *, kk, dtype):
    """Shared forward math on one tile. q [T,D]; k/v [TK,D]; rel [TK,3].

    Returns every intermediate the backward needs. Biases are added and ReLU
    taken in f32; matmul operands are cast to the compute dtype so the MXU
    runs at full rate, accumulation stays f32 (matches flax Dense with
    dtype=bf16 up to its output-cast rounding).
    """
    t, d = q.shape
    hd_pre = _mm(rel.astype(dtype), wd1.astype(dtype)) + bd1
    hd = jnp.maximum(hd_pre, 0.0)
    pos = _mm(hd.astype(dtype), wd2.astype(dtype)) + bd2  # [TK, D] f32
    q_rep = jnp.broadcast_to(q.astype(jnp.float32)[:, None, :], (t, kk, d))
    x = q_rep.reshape(t * kk, d) - k.astype(jnp.float32) + pos
    hg_pre = _mm(x.astype(dtype), wg1.astype(dtype)) + bg1
    hg = jnp.maximum(hg_pre, 0.0)
    logits = _mm(hg.astype(dtype), wg2.astype(dtype)) + bg2  # [TK, D] f32
    z = logits.reshape(t, kk, d) * (1.0 / (d ** 0.5))
    z = z - jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z)
    a = e / jnp.sum(e, axis=1, keepdims=True)  # [T, K, D] f32
    u = v.astype(jnp.float32) + pos
    out = jnp.sum(a * u.reshape(t, kk, d), axis=1)  # [T, D] f32
    return hd_pre, hd, pos, x, hg_pre, hg, a, u, out


def _fwd_kernel(q_ref, k_ref, v_ref, rel_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                out_ref, *, kk, dtype):
    *_, out = _chain_fwd(
        q_ref[...], k_ref[...], v_ref[...], rel_ref[...],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, rel_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref, g_ref,
                gq_ref, gk_ref, gv_ref, grel_ref,
                gwd1_ref, gbd1_ref, gwd2_ref, gbd2_ref,
                gwg1_ref, gbg1_ref, gwg2_ref, gbg2_ref,
                *, kk, dtype):
    """Recompute forward in VMEM, then backprop. Weight grads accumulate
    across the (sequential) grid into whole-array VMEM-resident blocks."""
    t, d = q_ref.shape
    hd_pre, hd, pos, x, hg_pre, hg, a, u, _ = _chain_fwd(
        q_ref[...], k_ref[...], v_ref[...], rel_ref[...],
        wd1_ref[...], bd1_ref[...], wd2_ref[...], bd2_ref[...],
        wg1_ref[...], bg1_ref[...], wg2_ref[...], bg2_ref[...],
        kk=kk, dtype=dtype)

    g = g_ref[...].astype(jnp.float32)  # [T, D]
    g3 = jnp.broadcast_to(g[:, None, :], (t, kk, d))
    u3 = u.reshape(t, kk, d)
    g_a = g3 * u3
    g_u = (a * g3).reshape(t * kk, d)  # = g_v and the aggregation part of g_pos
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
    gwd1_ref[...] += _mm_at(rel_ref[...].astype(dtype), ghd)
    gbd1_ref[...] += jnp.sum(g_hd, axis=0, keepdims=True)

    gq_ref[...] = jnp.sum(g_x.reshape(t, kk, d), axis=1).astype(gq_ref.dtype)
    gk_ref[...] = (-g_x).astype(gk_ref.dtype)
    gv_ref[...] = g_u.astype(gv_ref.dtype)
    grel_ref[...] = g_rel.astype(grel_ref.dtype)


def _zero_init(*refs):
    for r in refs:
        r[...] = jnp.zeros_like(r)


def _pad_rows(arr, rows):
    pad = rows - arr.shape[0]
    if pad:
        arr = jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))
    return arr


def _flatten(q, k, v, rel, tile):
    """[B,N,D]/[B,N,K,D] -> row-major 2D with N-tile padding."""
    b, n, kk, d = k.shape
    r = ((n * b + tile - 1) // tile) * tile
    q2 = _pad_rows(q.reshape(b * n, d), r)
    k2 = _pad_rows(k.reshape(b * n * kk, d), r * kk)
    v2 = _pad_rows(v.reshape(b * n * kk, d), r * kk)
    rel2 = _pad_rows(rel.reshape(b * n * kk, 3), r * kk)
    return q2, k2, v2, rel2, r


_WNAMES = ("wd1", "bd1", "wd2", "bd2", "wg1", "bg1", "wg2", "bg2")


def _weight_list(weights):
    return [weights[k].reshape(1, -1) if weights[k].ndim == 1 else weights[k]
            for k in _WNAMES]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_vector_attention(q, k, v, rel, weights, tile=32, interpret=False):
    """Fused softmax(fc_gamma(q-k+pos)/sqrt(D)) * (v+pos) aggregation.

    q [B,N,D]; k, v [B,N,K,D] (pre-gathered neighbors); rel [B,N,K,3];
    weights dict with wd1 [3,D], bd1 [D], wd2 [D,D], bd2 [D], wg1 [D,D],
    bg1 [D], wg2 [D,D], bg2 [D] (f32 storage; compute dtype follows q.dtype).
    Returns out [B,N,D] in q.dtype.
    """
    return _fused_fwd_impl(q, k, v, rel, weights, tile, interpret)


def _fused_fwd_impl(q, k, v, rel, weights, tile, interpret):
    b, n, kk, d = k.shape
    dtype = q.dtype
    q2, k2, v2, rel2, r = _flatten(q, k, v, rel, tile)
    grid = (r // tile,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kk=kk, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, d), lambda i: (i, 0)),
            pl.BlockSpec((tile * kk, 3), lambda i: (i, 0)),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in _weight_list(weights)],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), dtype),
        interpret=interpret,
    )(q2, k2, v2, rel2,
      *[w.astype(jnp.float32) for w in _weight_list(weights)])
    return out[: b * n].reshape(b, n, d)


def _fused_fwd(q, k, v, rel, weights, tile, interpret):
    return _fused_fwd_impl(q, k, v, rel, weights, tile, interpret), (
        q, k, v, rel, weights)


def _fused_bwd(tile, interpret, res, g):
    q, k, v, rel, weights = res
    b, n, kk, d = k.shape
    dtype = q.dtype
    q2, k2, v2, rel2, r = _flatten(q, k, v, rel, tile)
    g2 = _pad_rows(g.reshape(b * n, d), r)
    grid = (r // tile,)
    wl = _weight_list(weights)

    kernel = functools.partial(_bwd_kernel, kk=kk, dtype=dtype)

    def wrapped(*refs):
        ins = refs[: 13]
        outs = refs[13:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            _zero_init(*outs[4:])

        kernel(*ins, *outs)

    outs = pl.pallas_call(
        wrapped,
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
        # The recompute backward holds ~9 [T*K, D] f32 tiles + 3 weight
        # mats + their grads live; the default 16 MB scoped-VMEM cap is a
        # hair too small at tile=32, D=512 (measured 18.8 MB). v5e/v6e have
        # 128 MB VMEM — give the kernel headroom.
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


fused_vector_attention.defvjp(_fused_fwd, _fused_bwd)


def vector_attention_reference(q, k, v, rel, weights):
    """Plain-jnp mirror of the fused chain (parity oracle for the kernel).

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

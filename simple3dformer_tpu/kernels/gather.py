"""Pallas TPU kernel: batched row gather / scatter-add on the MXU.

Replaces `ops.pointops.index_points`'s take_along_axis on the set-abstraction
hot path (reference semantics: /root/reference/data/pointnet_util.py:45-57).
XLA's TPU gather runs ~10x off HBM speed-of-light at these shapes and its
scatter-add VJP is worse (see kernels/vector_attention.py header for the
measured numbers); here the gather is a one-hot matmul generated in VMEM —
exact for bf16 values at DEFAULT MXU precision (each output element is
1.0 * value + zeros, accumulated in f32) — and the backward is the
transposed one-hot matmul accumulated into a f32 VMEM block per batch
element (tighter than XLA's bf16 scatter-add, which rounds per-collision).

Dispatch policy lives in ops/pointops.index_points: TPU backend + bf16
values + big-enough shapes (S3F_PALLAS switch, default auto-on for TPU).

Padded index rows are set to N (out of range): their one-hot row is all
zeros, so forward gathers zeros (sliced off) and backward contributes no
spurious gradient to row 0.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import dtypes as jax_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def _onehot(idx_ref, n, dtype):
    idxc = idx_ref[0]  # [T, 1] column
    return (jax.lax.broadcasted_iota(jnp.int32, (idxc.shape[0], n), 1)
            == idxc).astype(dtype)


def _fwd_kernel(pts_ref, idx_ref, out_ref):
    n = pts_ref.shape[1]
    oh = _onehot(idx_ref, n, pts_ref.dtype)
    out = jax.lax.dot_general(
        oh, pts_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, gpts_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        gpts_ref[...] = jnp.zeros_like(gpts_ref)

    n = gpts_ref.shape[1]
    oh = _onehot(idx_ref, n, g_ref.dtype)
    # oh^T @ g: scatter-add of the tile's row grads, f32 accumulation
    gpts_ref[0] += jax.lax.dot_general(
        oh, g_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _prep_idx(idx, tile, n):
    b, r = idx.shape
    rp = ((r + tile - 1) // tile) * tile
    if rp != r:
        idx = jnp.pad(idx, ((0, 0), (0, rp - r)), constant_values=n)
    return idx.reshape(b, rp, 1), rp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows(points, idx, tile=256, interpret=False):
    """points [B,N,C], idx [B,R] int32 -> [B,R,C] (= take_along_axis)."""
    return _fwd_impl(points, idx, tile, interpret)


def _fwd_impl(points, idx, tile, interpret):
    b, n, c = points.shape
    r = idx.shape[1]
    idx2, rp = _prep_idx(idx, tile, n)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(b, rp // tile),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rp, c), points.dtype),
        compiler_params=_VMEM,
        interpret=interpret,
    )(points, idx2)
    return out[:, :r]


def _fwd(points, idx, tile, interpret):
    # bwd reads only points.shape/.dtype — the value itself is DCE'd
    return _fwd_impl(points, idx, tile, interpret), (points, idx)


def _bwd(tile, interpret, res, g):
    points, idx = res
    (b, n, c), dtype = points.shape, points.dtype
    r = idx.shape[1]
    idx2, rp = _prep_idx(idx, tile, n)
    if rp != r:
        g = jnp.pad(g, ((0, 0), (0, rp - r), (0, 0)))
    gpts = pl.pallas_call(
        _bwd_kernel,
        grid=(b, rp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda bi, i: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        compiler_params=_VMEM,
        interpret=interpret,
    )(idx2, g)
    gidx = np.zeros(idx.shape, dtype=jax_dtypes.float0)
    return gpts.astype(dtype), gidx


gather_rows.defvjp(_fwd, _bwd)

"""Pallas TPU kernel: fused k-nearest-neighbor search.

The XLA path (ops/pointops.knn_indices) materializes the full [B, S, N]
squared-distance tensor in HBM and then runs top_k over it — for the
Hengshuang vector-attention blocks that is the dominant HBM traffic
(B=32, N=1024 -> 128 MB per layer call). This kernel fuses both steps: per
(batch, query-tile) grid cell it computes the distance block on the MXU into
VMEM and extracts the k smallest by k unrolled rounds of masked row-argmin,
so only the [B, S, k] indices (and distances) ever touch HBM.

Tie-breaking: each round picks the smallest index among equal distances,
matching torch argsort's stable order (reference transformer.py:30) more
closely than XLA top_k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(q_ref, p_ref, idx_ref, dist_ref, *, k: int, n_points: int):
    """Grid cell: one batch element, one tile of queries.

    q_ref: [1, T, 3]; p_ref: [1, N, 3]; idx_ref: [1, T, k] int32;
    dist_ref: [1, T, k] f32.
    """
    q = q_ref[0]  # [T, 3]
    p = p_ref[0]  # [N, 3]
    # squared distances via the MXU: |q|^2 + |p|^2 - 2 q.p^T
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # [T, 1]
    p2 = jnp.sum(p * p, axis=-1)[None, :]  # [1, N]
    cross = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, N]
    d = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)

    T = d.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, n_points), 1)

    args, dists = [], []
    for _ in range(k):  # k is small and static: fully unrolled
        m = jnp.min(d, axis=-1, keepdims=True)  # [T, 1]
        arg = jnp.min(jnp.where(d == m, col, n_points), axis=-1)  # [T]
        args.append(arg)
        dists.append(m[:, 0])
        d = jnp.where(col == arg[:, None], jnp.inf, d)

    idx_ref[0] = jnp.stack(args, axis=1)
    dist_ref[0] = jnp.stack(dists, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def knn_pallas(query: jnp.ndarray, points: jnp.ndarray, k: int,
               tile: int = 128, interpret: bool = False):
    """Fused kNN. query [B,S,3], points [B,N,3] -> (idx [B,S,k], dist [B,S,k]).

    S is padded to the tile size internally; padding rows are discarded.
    """
    B, S, C = query.shape
    N = points.shape[1]
    k = min(k, N)
    S_pad = ((S + tile - 1) // tile) * tile
    if S_pad != S:
        query = jnp.pad(query, ((0, 0), (0, S_pad - S), (0, 0)))

    grid = (B, S_pad // tile)
    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n_points=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((B, S_pad, k), jnp.float32),
        ],
        interpret=interpret,
    )(query.astype(jnp.float32), points.astype(jnp.float32))
    return idx[:, :S], dist[:, :S]

"""Pallas TPU kernel: VMEM-resident farthest point sampling.

The lax.scan FPS (ops/pointops.farthest_point_sample) round-trips the [B, N]
running-distance buffer through HBM on every one of the npoint iterations and
pays scan dispatch overhead per step. This kernel runs the whole iteration
batch-vectorized inside a single invocation: xyz [B, N, 3] and the distance
matrix [B, N] stay in VMEM for the entire loop (B=32, N=1024 -> 512 KB, far
under the 16 MB budget); each iteration is one fused one-hot centroid gather
(MXU-free masked reduction) + distance update + row argmax on the VPU.

Parity: identical iteration rule to the reference (pointnet_util.py:67-72) —
per-batch start index input, masked-min distance update, argmax picking the
first maximum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, *, npoint: int, n: int):
    """x/y/z_ref [B, N] f32; start_ref [B, N] int32 (start index broadcast);
    out_ref [B, npoint] int32."""
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    B = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)

    def body(i, carry):
        distance, farthest, rows = carry  # [B,N] f32, [B,1] i32, [B,npoint] i32
        rows = jnp.where(out_col == i, farthest, rows)
        sel = col == farthest  # [B, N] one-hot per row
        cx = jnp.max(jnp.where(sel, x, -jnp.inf), axis=1, keepdims=True)
        cy = jnp.max(jnp.where(sel, y, -jnp.inf), axis=1, keepdims=True)
        cz = jnp.max(jnp.where(sel, z, -jnp.inf), axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        distance = jnp.minimum(distance, d)
        nxt = jnp.argmax(distance, axis=1, keepdims=True).astype(jnp.int32)
        return distance, nxt, rows

    init = (
        jnp.full((B, n), 1e10, dtype=jnp.float32),
        start_ref[:, :1],
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, rows = jax.lax.fori_loop(0, npoint, body, init)
    out_ref[:] = rows


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int, start: jnp.ndarray | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """xyz [B, N, 3] -> centroid indices [B, npoint] (int32)."""
    B, N, C = xyz.shape
    if start is None:
        start = jnp.zeros((B,), dtype=jnp.int32)
    # Mosaic cannot lower the rows-select sublane broadcast at B=1 (partseg's
    # batch_size=1 recipe) — pad the batch to the 8-row sublane tile; the
    # extra rows are discarded. FPS work is VPU-bound per row and tiny.
    B_pad = max(B, 8)
    if B_pad != B:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:1], (B_pad - B, N, C))], axis=0
        )
        start = jnp.concatenate(
            [start, jnp.zeros((B_pad - B,), dtype=start.dtype)], axis=0
        )
    start_b = jnp.broadcast_to(start.reshape(B_pad, 1).astype(jnp.int32),
                               (B_pad, N))
    xyz = xyz.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n=N),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, npoint), jnp.int32),
        interpret=interpret,
    )(xyz[..., 0], xyz[..., 1], xyz[..., 2], start_b)
    return out[:B]

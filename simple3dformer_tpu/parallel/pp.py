"""Pipeline parallelism (GPipe schedule) for the ViT block stack.

The reference has data parallelism only (SURVEY §2.6: TP/PP/SP/EP absent —
not required for parity); like parallel/tp.py this module goes beyond
parity with a TPU-native scaling path. Depth-stacked block parameters
(ViTCore ``scan_blocks=True`` layout: every leaf carries a leading [depth]
axis) are split into ``n_stage`` contiguous stages sharded over a 'stage'
mesh axis, and microbatches stream through the stages inside one
``shard_map``: each tick every stage runs its blocks on the activation it
holds, then ``lax.ppermute`` shifts activations one hop along the ring —
neighbor traffic only, which is exactly what ICI is shaped for.

Schedule: plain GPipe. With M microbatches and S stages the scan runs
T = M + S - 1 ticks; stage s processes microbatch (t - s) at tick t, the
first/last (S-1) ticks per stage are the usual pipeline bubble (computed on
zeros and discarded — no data-dependent control flow, so one fixed-shape
compiled program). Bubble fraction (S-1)/T shrinks as M grows.

The whole pipeline is differentiable: jax.grad through the scan + ppermute
gives the reverse pipeline automatically (ppermute's transpose is the
inverse ring shift), so a full training step jits over a dp x pp mesh with
no hand-written backward schedule. There is no EP analog in this framework
— no model family has MoE/expert layers (SURVEY §2.2), so an 'expert' mesh
axis would shard nothing.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map, replication check renamed to check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

STAGE_AXIS = "stage"


def split_stages(stacked_params, n_stage: int):
    """[depth, ...] block params -> [n_stage, depth // n_stage, ...].

    Stage boundaries are contiguous: stage s holds blocks
    [s * depth/S, (s+1) * depth/S). Shard the result's axis 0 over 'stage'
    (stage_sharding) so each device materializes only its own blocks.
    """

    def split(leaf):
        depth = leaf.shape[0]
        if depth % n_stage:
            raise ValueError(f"depth {depth} not divisible by {n_stage} stages")
        return leaf.reshape(n_stage, depth // n_stage, *leaf.shape[1:])

    return jax.tree_util.tree_map(split, stacked_params)


def merge_stages(stage_params):
    """Inverse of split_stages: [S, per, ...] -> [S * per, ...]."""
    return jax.tree_util.tree_map(
        lambda l: l.reshape(l.shape[0] * l.shape[1], *l.shape[2:]),
        stage_params)


def stage_sharding(mesh: Mesh, axis: str = STAGE_AXIS) -> NamedSharding:
    """Sharding for split_stages output: axis 0 over the stage mesh axis."""
    return NamedSharding(mesh, P(axis))


def pipeline_apply(
    block_fn: Callable,
    stage_params,
    microbatches,
    mesh: Mesh,
    axis: str = STAGE_AXIS,
    batch_axis: str | None = None,
):
    """Run [M, ...] microbatches through all stages; returns [M, ...].

    ``block_fn(one_block_params, x) -> x`` applies a single transformer
    block (e.g. a bound flax Block.apply); each stage scans it over its
    local [depth/S, ...] params. ``microbatches`` is [M, B, ...] with the
    stream replicated over the stage axis; pass ``batch_axis='data'`` on a
    dp x pp mesh to shard the per-microbatch batch dim B over data — the
    pipeline collectives only ever touch 'stage', so the two compose.

    Output identity with the sequential stack is exact (same op order per
    microbatch); tested against a plain unrolled loop in
    tests/test_parallel.py.
    """
    n_stage = mesh.shape[axis]
    m = microbatches.shape[0]

    def run_stage(local_blocks, x):
        h, _ = jax.lax.scan(
            lambda hh, bp: (block_fn(bp, hh), None), x, local_blocks)
        return h

    nd = microbatches.ndim
    stream_spec = P(None, batch_axis, *([None] * (nd - 2)))
    params_spec = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(params_spec, stream_spec),
        out_specs=stream_spec,
        check_rep=False,
    )
    def pipelined(stage_p, xs):
        # local view keeps a size-1 stage dim; drop it
        local = jax.tree_util.tree_map(lambda l: l[0], stage_p)
        sid = jax.lax.axis_index(axis)
        bubble = jnp.zeros((n_stage - 1,) + xs.shape[1:], xs.dtype)
        stream = jnp.concatenate([xs, bubble], axis=0)
        ring = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def tick(held, xt):
            my_in = jnp.where(sid == 0, xt, held)
            out = run_stage(local, my_in)
            return jax.lax.ppermute(out, axis, ring), out

        _, outs = jax.lax.scan(tick, jnp.zeros_like(xs[0]), stream)
        # microbatch i finishes on the LAST stage at tick i + S - 1; other
        # stages hold intermediates there. Broadcast the last stage's
        # slice to everyone (mask + psum = one all-reduce over 'stage').
        ys = jax.lax.dynamic_slice_in_dim(outs, n_stage - 1, m, axis=0)
        ys = jnp.where(sid == n_stage - 1, ys, jnp.zeros_like(ys))
        return jax.lax.psum(ys, axis)

    return pipelined(stage_params, microbatches)


def to_microbatches(x, n_micro: int):
    """[B, ...] -> [n_micro, B / n_micro, ...]."""
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    return x.reshape(n_micro, b // n_micro, *x.shape[1:])


def from_microbatches(x):
    """Inverse of to_microbatches."""
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])

"""ZeRO-1 optimizer-state sharding over the data axis.

The reference's only scaling strategy is NCCL DDP with fully replicated
optimizer state: every GPU holds a complete copy of the Adam moments
(torch.optim.Adam under DistributedDataParallel,
/root/reference/train_cls_voxel.py:154-196). The TPU-native extension here
partitions those moments over the mesh's data axis — the ZeRO stage-1
sharding of Rajbhandari et al. (arXiv:1910.02054) — expressed purely through
GSPMD sharding annotations: the train-step *code* is unchanged, only the
in/out shardings of the optimizer-state subtree differ.

Dataflow XLA derives from the annotations: the gradient reduction feeding the
moment update becomes a reduce-scatter (each chip reduces only its shard),
each chip updates its 1/n_data slice of mu/nu, and one all-gather rebuilds
the replicated parameter delta. Per-chip optimizer memory drops from
2x params to 2x params / n_data; parameters themselves stay replicated
(stage 1 — matching the replicated-params contract of every other train
path in this framework; stages 2/3 would shard grads/params too).

Sharding rule per leaf: split the first axis whose length divides the data-
axis size; leaves with no such axis (scalars, odd-sized vectors) stay
replicated — correct everywhere, sharded where it pays. On a (dcn, data)
multi-slice mesh only the intra-slice 'data' axis is used, so the per-step
all-gather rides ICI, never DCN.

Usage (see cli/train_cls_voxel.py --zero1 and tests/test_parallel.py):

    state_sh = zero1_state_shardings(state, mesh)
    state = jax.device_put(state, state_sh)
    run = make_scanned_train_steps(..., rules=rules, state_shardings=state_sh)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _leaf_sharding(mesh: Mesh, shape, n: int) -> NamedSharding:
    for axis, dim in enumerate(shape):
        if dim >= n and dim % n == 0:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def zero1_opt_shardings(opt_state, mesh: Mesh):
    """Sharding tree for an optimizer state: each array leaf split over the
    data axis on its first evenly-divisible axis, scalars replicated."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: _leaf_sharding(mesh, leaf.shape, n), opt_state
    )


def zero1_state_shardings(state, mesh: Mesh):
    """ZeRO-1 shardings for a full train.loop.TrainState: params/batch_stats/
    step replicated, opt_state sharded over 'data'. The returned object is a
    TrainState whose leaves are NamedShardings — pass it to jax.device_put
    and to the train-step builders' ``state_shardings=``."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        params=jax.tree_util.tree_map(lambda _: repl, state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        opt_state=zero1_opt_shardings(state.opt_state, mesh),
        step=repl,
    )


def sharded_fraction(state) -> float:
    """Fraction of optimizer-state bytes actually sharded (diagnostics)."""
    tot = shd = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        tot += leaf.size * leaf.dtype.itemsize
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and DATA_AXIS in str(spec):
            shd += leaf.size * leaf.dtype.itemsize
    return shd / max(tot, 1)

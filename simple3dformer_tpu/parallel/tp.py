"""Tensor-parallel sharding rules for the ViT backbone.

The reference has data parallelism only (SURVEY §2.6: TP/PP/SP/EP absent, not
required for parity). This module goes beyond parity: Megatron-style tensor
parallelism for the transformer blocks expressed purely as parameter sharding
annotations over the mesh's 'model' axis — XLA inserts the all-reduces
(scaling-book recipe: pick a mesh, annotate, let the compiler place
collectives on ICI).

Rules (column-parallel then row-parallel per block, so each block needs one
psum on its output):
  qkv / fc1 kernels  -> shard the OUTPUT dim   (last axis)
  proj / fc2 kernels -> shard the INPUT dim    (second-to-last axis)
  qkv / fc1 biases   -> shard                  (last axis)
  everything else    -> replicated
Works for both ViTCore layouts (unrolled core/blocks_i/... and scanned
core/scan/block/... — the leading [depth] axis just shifts positions, handled
by indexing axes from the end).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

COL_PARALLEL = ("qkv", "fc1")  # shard output dim
ROW_PARALLEL = ("proj", "fc2")  # shard input dim


def _spec_for(path_names: list[str], leaf, n_model: int) -> P:
    ndim = np.ndim(leaf)
    is_kernel = path_names[-1] == "kernel"
    is_bias = path_names[-1] == "bias"
    layer = path_names[-2] if len(path_names) >= 2 else ""
    if layer in COL_PARALLEL and leaf.shape[-1] % n_model == 0:
        if is_kernel:
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
        if is_bias:
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
    if layer in ROW_PARALLEL and is_kernel and ndim >= 2 and (
        leaf.shape[-2] % n_model == 0
    ):
        return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
    return P()


def vit_tp_shardings(params, mesh: Mesh):
    """Same-structure tree of NamedSharding for a param tree."""
    n_model = mesh.shape[MODEL_AXIS]

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return NamedSharding(mesh, _spec_for(path, node, n_model))

    return walk(params, [])


def shard_like_params(tree, params, param_shardings, mesh: Mesh):
    """Sharding tree for an arbitrary pytree (e.g. optimizer state) whose
    array leaves mirror parameter shapes: leaves matching a param shape get
    that param's sharding, everything else is replicated. Shape collisions
    across differently-sharded params do not occur in the ViT family (all
    sharded shapes are distinct)."""
    by_shape = {}
    for p_leaf, p_sh in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(
            param_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
        ),
    ):
        by_shape[np.shape(p_leaf)] = p_sh

    replicated = NamedSharding(mesh, P())

    def pick(leaf):
        return by_shape.get(np.shape(leaf), replicated)

    return jax.tree_util.tree_map(pick, tree)


def device_put_tp(state, params_attr: str, mesh: Mesh):
    """Place a TrainState with TP params + matching opt state shardings."""
    params = getattr(state, params_attr)
    p_sh = vit_tp_shardings(params, mesh)
    state_sh = type(state)(
        params=p_sh,
        batch_stats=shard_like_params(state.batch_stats, params, p_sh, mesh),
        opt_state=shard_like_params(state.opt_state, params, p_sh, mesh),
        step=NamedSharding(mesh, P()),
    )
    return jax.device_put(state, state_sh)

"""Device mesh + sharding setup.

The reference scales with NCCL DistributedDataParallel only (data parallelism;
/root/reference/train_cls_voxel.py:154-165, SURVEY §2.6). The TPU-native
equivalent: one ``jax.sharding.Mesh`` whose axes cover every chip, parameters
replicated, batch sharded on the ``data`` axis, gradient psum riding ICI —
XLA inserts the collectives from sharding annotations, there is no hand-written
communication layer.

A second ``model`` axis is plumbed through for tensor-parallel experiments;
the reference has no TP/PP/SP (SURVEY §2.6) so the default mesh is 1-D.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
    n_dcn: int = 1,
) -> Mesh:
    """Build a (data, model) — or (dcn, data, model) — mesh.

    ``n_data=None`` uses all devices (divided by ``n_model`` and ``n_dcn``).
    Works the same on 1 real TPU chip, a v5e-8 slice, or 8 virtual CPU
    devices under ``--xla_force_host_platform_device_count``.

    ``n_dcn > 1`` adds a leading data-center-network axis for multi-slice
    pods: the outermost (slowest-varying) mesh dim maps across slices, so
    only the gradient psum over ``dcn`` rides DCN while everything else
    stays on ICI. Shard batch over ("dcn", "data") jointly for pure DP
    across slices (ShardingRules handles 2- and 3-axis meshes uniformly via
    axis names). The reference has no multi-node story beyond NCCL DDP
    (SURVEY §2.6); this is the TPU-native extension.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_dcn)
    use = np.asarray(devices[: n_dcn * n_data * n_model])
    if n_dcn > 1:
        return Mesh(use.reshape(n_dcn, n_data, n_model),
                    (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    return Mesh(use.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def multihost_init() -> None:
    """Initialize the multi-host runtime when launched under a cluster.

    Mirrors the reference's env:// + SLURM rendezvous
    (/root/reference/train_cls_voxel.py:384-396, train_pure_mlp.py:283-306)
    with ``jax.distributed.initialize``. Three rendezvous routes, first match
    wins:

      * explicit JAX vars — ``JAX_COORDINATOR_ADDRESS`` (host:port), plus
        ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` (jax only reads the address
        from env; the counts must be passed explicitly)
      * torch env:// names for reference-launcher parity —
        ``MASTER_ADDR``/``MASTER_PORT``/``WORLD_SIZE``/``RANK``
        (same contract as ``dist.init_process_group(init_method="env://")``)
      * SLURM auto-detect (``jax.distributed.initialize()`` no-arg path),
        matching the reference's hostfile rendezvous under sbatch

    On CPU backends the cross-process collective implementation is switched
    to gloo (the default has no inter-process channel) — this is how the
    multi-process path is exercised in tests/test_multiprocess.py without a
    real multi-chip slice. No-op for single-host runs.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and os.environ.get("MASTER_ADDR") and os.environ.get("WORLD_SIZE"):
        addr = (f"{os.environ['MASTER_ADDR']}:"
                f"{os.environ.get('MASTER_PORT', '29500')}")
    if addr is None:
        if os.environ.get("SLURM_JOB_ID"):
            jax.distributed.initialize()
        return
    n = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("WORLD_SIZE")
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK")
    platforms = jax.config.jax_platforms or ""
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(n) if n else None,
        process_id=int(pid) if pid else None,
    )


def fetch_global(x) -> np.ndarray:
    """Fetch a (possibly cross-process-sharded) device array to host numpy.

    Single-process: plain ``np.asarray``. Multi-process: a process can only
    read its addressable shards, so non-replicated arrays are all-gathered
    across processes first (``multihost_utils.process_allgather``) — every
    process returns the full array, keeping callers rank-oblivious (the
    reference's loops are rank-oblivious too: DDP allreduces metrics,
    /root/reference/train_pure_mlp.py:118-133).
    """
    if jax.process_count() == 1 or getattr(x, "sharding", None) is None:
        return np.asarray(jax.device_get(x))
    if x.sharding.is_fully_replicated:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _batch_axes(mesh: Mesh):
    """The axes the batch dim shards over: ("dcn", "data") on multi-slice
    meshes, plain "data" otherwise."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data (and dcn) axes."""
    return NamedSharding(mesh, P(_batch_axes(mesh), *([None] * (ndim - 1))))


def shard_batch_tree(mesh: Mesh, tree):
    """Device-put a host batch pytree with its leading dim split over data."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharded(mesh, x.ndim))

    return jax.tree_util.tree_map(put, tree)


@dataclass(frozen=True)
class ShardingRules:
    """Shardings for a train step: params/opt replicated, batch data-split."""

    mesh: Mesh

    @property
    def params(self) -> NamedSharding:
        return replicated(self.mesh)

    @property
    def batch(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(_batch_axes(self.mesh)))

    def batch_spec(self, ndim: int) -> NamedSharding:
        return batch_sharded(self.mesh, ndim)

    @property
    def scan_batch(self) -> NamedSharding:
        """[steps, batch] index matrices: shard the batch dim, not steps."""
        return NamedSharding(self.mesh, P(None, _batch_axes(self.mesh)))

    def put_scan_idx(self, idx):
        """Place a [steps, batch] index matrix: batch-sharded over the data
        axis when divisible, replicated otherwise (tiny-batch fallback —
        correct everywhere, parallel when it can be)."""
        import warnings

        import jax
        import jax.numpy as jnp

        idx = jnp.asarray(idx)
        n = self.mesh.shape[DATA_AXIS]
        if DCN_AXIS in self.mesh.axis_names:
            n *= self.mesh.shape[DCN_AXIS]
        if idx.shape[1] % n == 0:
            return jax.device_put(idx, self.scan_batch)
        warnings.warn(
            f"batch {idx.shape[1]} not divisible by data-axis size {n}: "
            "running replicated (correct but not data-parallel). Use a batch "
            "that is a multiple of the device count for full throughput."
        )
        return jax.device_put(idx, replicated(self.mesh))

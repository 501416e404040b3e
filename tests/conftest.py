"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (no multi-chip TPU hardware in CI);
the driver separately dry-runs the multichip path via __graft_entry__.py.
These env vars must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env pins the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax before conftest runs, so the env var
# alone is too late — update the live config too (backends are not yet
# initialized at conftest-import time, so this still takes effect).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(9)  # reference manualSeed=9 (train_cls_voxel.py:383)

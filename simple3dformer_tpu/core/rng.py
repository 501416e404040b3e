"""Deterministic RNG plumbing.

The reference pins ``manualSeed = 9`` (/root/reference/train_cls_voxel.py:383)
and seeds python/torch from it. Here a single root ``jax.random.key`` is split
per subsystem (params / dropout / data augmentation) and folded per step, so
every run is reproducible from one integer and RNG use is explicit.
"""

from __future__ import annotations

import jax

DEFAULT_SEED = 9


def root_key(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.key(seed)


def split_named(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def step_key(key: jax.Array, step) -> jax.Array:
    """Per-step key derived inside jit (step may be a traced int)."""
    return jax.random.fold_in(key, step)

"""simple3dformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of Simple3D-Former.

Reference capability surface: VITA-Group/Simple3D-Former (arXiv:2209.07026),
mounted read-only at /root/reference. This package is a from-scratch redesign
for TPU hardware: tokenizers and point ops run on-device as XLA/Pallas
programs, training steps are jit-compiled SPMD programs over a
``jax.sharding.Mesh``, and the host side is a thin prefetching IO layer.

Layout (mirrors SURVEY.md §7.1):
  core/      config, rng, checkpointing, metrics, logging
  parallel/  mesh + sharding setup, data-parallel train-step wiring
  ops/       point-cloud and voxel compute primitives (jnp/lax)
  kernels/   Pallas TPU kernels for the hot fused ops
  nn/        ViT blocks, vector attention, set abstraction, permutator
  models/    voxel ViT, Hengshuang point transformer, 3DViT family, ViP-3D
  data/      binvox codec, dataset readers, augmentation (host + device)
  train/     train loops, optimizers/schedules, eval metrics
  utils/     torch-checkpoint conversion, attention rollout, profiling
  tools/     offline tooling (C++ voxelizer, S3DIS collector)
  cli/       entry points mirroring the reference train_*.py scripts
"""

__version__ = "0.1.0"

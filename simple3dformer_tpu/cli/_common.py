"""Shared runner pieces for the hydra-style CLIs.

Each CLI mirrors one reference entry point; they share: override parsing
(`key=value` / `model=Name`), config loading, mesh setup, model init,
optimizer build (reference recipes incl. the hardcoded SGD lr=0.01 quirk,
/root/reference/train_cls.py:91), HBM staging, scanned train/eval, and the
run-dir layout (out_dir/model.name/backbone — the reference's templated
hydra.run.dir, config/cls.yaml).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import Config, load_task_config
from ..core.rng import DEFAULT_SEED
from ..data.pipeline import DeviceResidentDataset
from ..parallel.mesh import ShardingRules, fetch_global, make_mesh, multihost_init
from ..train.optim import make_optimizer, steplr


def parse_cli(argv=None):
    """(task overrides..., flags) -> list of 'key=value' strings."""
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    flags = [a for a in argv if a not in overrides]
    return overrides, flags


def setup(task: str, argv=None, inject: dict | None = None):
    """Load config + mesh. Returns (cfg, mesh, rules)."""
    overrides, flags = parse_cli(argv)
    cfg = load_task_config(task, overrides)
    cfg.setdefault("seed", DEFAULT_SEED)
    cfg.setdefault("synthetic", 0)
    for f in flags:
        if f == "--synthetic":
            cfg.synthetic = 512
    for k, v in (inject or {}).items():
        cfg.setdefault(k, v)
    multihost_init()
    mesh = make_mesh()
    rules = ShardingRules(mesh)
    print(f"devices: {jax.device_count()} | mesh {dict(mesh.shape)}")
    print(cfg.to_yaml())
    return cfg, mesh, rules


def compute_dtype(cfg):
    """cfg.dtype: 'bf16'/'bfloat16' -> jnp.bfloat16 compute (params stay f32)."""
    name = str(cfg.get("dtype", "")).lower()
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if name in ("", "f32", "float32", "none"):
        return None
    raise ValueError(f"unknown dtype {name!r}")


def run_dir(cfg, task: str) -> str:
    d = os.path.join(
        cfg.get("out_dir", task), str(cfg.model.name),
        str(cfg.model.get("transformer_backbone", "none")),
        str(cfg.model.get("pretrained", False)),
    )
    os.makedirs(d, exist_ok=True)
    _write_provenance(d, cfg)
    return d


def _write_provenance(d: str, cfg) -> None:
    """Run-dir provenance, mirroring the reference's two mechanisms: each
    Hydra run copies the chosen ``models/<name>/model.py`` into its run dir
    (/root/reference/train_cls.py:67, train_partseg.py:72) and Hydra itself
    dumps the resolved config. Here: ``resolved_config.json`` (full cfg +
    argv) plus a copy of the selected model's source file. Best-effort —
    provenance must never fail a training run (read-only out_dir etc.)."""
    import json
    import shutil

    try:
        payload = {
            "argv": list(sys.argv),
            "config": cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
        }
        with open(os.path.join(d, "resolved_config.json"), "w") as f:
            json.dump(payload, f, indent=2, default=str)

        from ..models import hengshuang, point_vit
        from ..models.registry import POINT_VIT_VARIANTS

        name = str(cfg.model.name)
        mod = (hengshuang if name == "Hengshuang"
               else point_vit if name in POINT_VIT_VARIANTS else None)
        if mod is not None and getattr(mod, "__file__", None):
            shutil.copy(mod.__file__,
                        os.path.join(d, os.path.basename(mod.__file__)))
    except OSError as e:
        print(f"provenance write skipped: {e}")


def reference_optimizer(cfg, trainable_mask=None):
    """The hydra scripts' optimizer block (train_cls.py:82-93): Adam with
    cfg lr + weight decay, or SGD momentum 0.9 at hardcoded lr 0.01."""
    if str(cfg.optimizer) == "Adam":
        tx = make_optimizer("Adam", weight_decay=float(cfg.weight_decay),
                            trainable_mask=trainable_mask)
        base_lr = float(cfg.learning_rate)
    else:
        tx = make_optimizer("SGD", trainable_mask=trainable_mask)
        base_lr = 0.01
    return tx, base_lr


def lr_schedule(cfg, base_lr: float):
    """StepLR(50, 0.3) for cls (train_cls.py:93); others use cfg step/decay."""
    step = int(cfg.get("sched_step", 50))
    gamma = float(cfg.get("sched_gamma", 0.3))
    return lambda epoch: steplr(base_lr, step, gamma, epoch)


def stage(mesh, **arrays) -> DeviceResidentDataset:
    return DeviceResidentDataset(arrays, mesh=mesh)


def init_model(model, cfg, sample_x, with_images: bool = False):
    key = jax.random.key(int(cfg.seed))
    if with_images:
        img0 = jnp.zeros((2, 224, 224, 3))
        variables = jax.jit(
            lambda k, a, b: model.init(k, a, b, method=model.init_all)
        )(key, sample_x, img0)
    else:
        variables = jax.jit(model.init)(key, sample_x)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    print(f"Number of parameters: {n/1e6:.2f}M")
    return variables, key


class EpochTimer:
    def __init__(self):
        self.t0 = time.time()

    def lap(self, n_samples: int) -> str:
        dt = time.time() - self.t0
        self.t0 = time.time()
        return f"{n_samples/dt:.1f} samples/sec"


def to_host(x) -> np.ndarray:
    """Device -> host fetch that stays correct under multi-process runs
    (cross-process shards are all-gathered; see parallel.mesh.fetch_global)."""
    return fetch_global(x)

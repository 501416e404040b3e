"""Run-dir logging (the Hydra-run-dir analog, SURVEY §5.5).

The reference gets `logging` wired into the Hydra run directory plus a
provenance trick: each run copies the chosen model.py into the run dir
(/root/reference/train_cls.py:67). Here: a file+console logger rooted at the
run dir, plus `snapshot_config` writing the resolved config yaml (stronger
provenance than copying a source file — the model is reconstructable from it).
"""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(run_dir: str, name: str = "simple3dformer") -> logging.Logger:
    os.makedirs(run_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
    fh = logging.FileHandler(os.path.join(run_dir, "train.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def snapshot_config(cfg, run_dir: str) -> str:
    """Write the resolved config into the run dir (provenance)."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "config.yaml")
    with open(path, "w") as f:
        f.write(cfg.to_yaml())
    return path

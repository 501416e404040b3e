"""Checkpoint / resume (orbax-backed).

Replicates both reference schemes (SURVEY §5.4):
  * best-metric snapshots: `epoch_best` on best overall accuracy
    (/root/reference/train_cls_voxel.py:330-333) and the Hydra scripts'
    `best_model.pth` dict {epoch, metrics, model_state_dict, optimizer_state_dict}
    (/root/reference/train_cls.py:148-157) — here one CheckpointManager that
    stores the full TrainState (params + opt state + batch stats + step) plus
    a metrics dict, with resume-at-startup semantics.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metrics=ocp.args.JsonSave(metrics or {}),
            ),
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: int | None = None):
        """Restore (state, metrics); returns (None, None) if nothing saved."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metrics=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["metrics"]


def save_params(path: str, params) -> None:
    """One-shot parameter snapshot (the reference's epoch_0.pth analog)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)

"""Single config system covering both reference CLI styles.

The reference had two coexisting systems: argparse in the DDP scripts
(/root/reference/train_cls_voxel.py:345-375) and Hydra/OmegaConf yaml groups
(/root/reference/config/*.yaml + config/model/*.yaml). Here one attribute-dict
config covers both: yaml task files under configs/ (same keys as the reference
yamls), a ``model`` defaults-group resolved from configs/model/<name>.yaml, and
dotted ``key=value`` CLI overrides (the Hydra surface). Struct mode is off by
design — entry points inject fields like ``num_class``/``input_dim`` at
runtime, mirroring /root/reference/train_cls.py:65-66.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterable, Mapping

import yaml

CONFIG_ROOT = Path(__file__).resolve().parent.parent.parent / "configs"


class Config(dict):
    """A dict with attribute access, nested-key get/set, and yaml IO."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Mapping) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        return cls._wrap(dict(d))

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Config":
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls.from_dict(data)

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def copy(self) -> "Config":
        return Config.from_dict(copy.deepcopy(self.to_dict()))

    def set_dotted(self, dotted: str, value: Any) -> None:
        keys = dotted.split(".")
        node = self
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], Config):
                node[k] = Config()
            node = node[k]
        node[keys[-1]] = value

    def get_dotted(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for k in dotted.split("."):
            if not isinstance(node, Mapping) or k not in node:
                return default
            node = node[k]
        return node


def _coerce(text: str) -> Any:
    """yaml-style scalar coercion for CLI override values."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_task_config(
    task: str,
    overrides: Iterable[str] = (),
    config_root: str | Path | None = None,
) -> Config:
    """Load configs/<task>.yaml, resolve the model group, apply overrides.

    Overrides use the Hydra surface: ``model=Hengshuang`` swaps the model
    group file; ``learning_rate=0.05`` / ``model.nblocks=2`` set values.
    """
    root = Path(config_root) if config_root is not None else CONFIG_ROOT
    cfg = Config.from_yaml(root / f"{task}.yaml")

    model_group = cfg.pop("defaults", {})
    model_name = None
    if isinstance(model_group, list):  # hydra-style: [{model: name}]
        for entry in model_group:
            if isinstance(entry, Mapping) and "model" in entry:
                model_name = entry["model"]
    elif isinstance(model_group, Mapping):
        model_name = model_group.get("model")

    # a "model=X" override swaps the group before the file is read
    pending = []
    for ov in overrides:
        key, _, value = ov.partition("=")
        if key == "model":
            model_name = value
        else:
            pending.append((key, _coerce(value)))

    if model_name is not None:
        model_cfg = Config.from_yaml(root / "model" / f"{model_name}.yaml")
        cfg["model"] = model_cfg

    for key, value in pending:
        cfg.set_dotted(key, value)
    return cfg

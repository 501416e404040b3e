"""Model registry — maps config model names to constructors.

Replaces the reference's dynamic `importlib.import_module('models.{name}.model')`
(/root/reference/train_cls.py:69 etc.) with an explicit table; same names,
same selection surface (cfg.model.name from configs/model/<name>.yaml).
"""

from __future__ import annotations

from .hengshuang import PointTransformerCls as HengshuangCls
from .hengshuang import PointTransformerSeg as HengshuangSeg
from .point_vit import PointViT

POINT_VIT_VARIANTS = {
    "3DViT", "3DViT_0_layer", "3DViT_1_layer", "3DViT_LWF", "3DViT_s3dis",
}


def make_point_model(cfg, task: str, **kw):
    """task: 'cls' | 'seg'. cfg needs num_point/num_class/input_dim/model.*"""
    name = cfg.model.name
    if name == "Hengshuang":
        cls = HengshuangCls if task == "cls" else HengshuangSeg
        return cls.from_config(cfg, **kw)
    if name in POINT_VIT_VARIANTS:
        return PointViT.from_config(cfg, task=task, **kw)
    raise ValueError(f"Unknown model name {name!r}")


def has_lwf_pathway(cfg) -> bool:
    from .point_vit import variant_spec

    name = cfg.model.name
    if name == "Hengshuang":
        return False
    return variant_spec(name, 4, 4)["images"]

"""3DViT point-ViT family: per-variant shapes + LwF pathway."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.point_vit import (
    PointViT,
    frozen_mask_point,
    variant_spec,
)

N = 64


@pytest.mark.parametrize(
    "variant,task,out_rank",
    [
        ("3DViT", "cls", 2),
        ("3DViT", "seg", 3),
        ("3DViT_1_layer", "seg", 3),
        ("3DViT_0_layer", "seg", 3),
        ("3DViT_LWF", "seg", 3),
    ],
)
def test_variant_shapes(variant, task, out_rank, rng):
    model = PointViT(
        variant=variant, task=task, num_point=N, num_class=13, input_dim=6,
        nneighbor=8, transformer_backbone="deit_tiny_patch16_224",
    )
    x = jnp.asarray(rng.randn(2, N, 6).astype(np.float32))
    img = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.key(0), x, img, method=model.init_all)
    out = model.apply(
        variables, x,
        mutable=["batch_stats"] if "batch_stats" in variables else False,
    )
    if isinstance(out, tuple):
        out = out[0]
    if task == "cls":
        assert out.shape == (2, 13)
    else:
        assert out.shape == (2, N, 13)

    if variant_spec(variant, 192, N)["images"]:
        logits = model.apply(variables, img, method=model.forward_images)
        assert logits.shape == (2, 1000)
        mask = frozen_mask_point(variables["params"], pretrained=True)
        flat = jax.tree_util.tree_leaves_with_path(mask)
        frozen = {jax.tree_util.keystr(p) for p, v in flat if not v}
        assert any("head" in f for f in frozen)
        assert any("patch_embed" in f for f in frozen)
        assert not any("pos_embed" in f for f in frozen)  # pos_embed trainable

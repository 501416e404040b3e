"""Part-segmentation prediction renderer.

Mirrors /root/reference/visualize_point_cloud.py (which expects a
config/vis.yaml that the reference repo never shipped — latent gap; this CLI
uses the partseg config group instead). Renders ground-truth vs predicted part
labels of ShapeNetPart clouds as 3D scatter plots.

Usage:
  python -m simple3dformer_tpu.cli.visualize_point_cloud \
      model=3DViT_1_layer synthetic=8 n_samples=4 out_dir=./seg_vis
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..models.registry import make_point_model
from ..train.eval_metrics import SEG_LABEL_TO_CAT, category_restricted_argmax
from .train_partseg import NUM_PART, load_arrays, make_prepare_fn
from . import _common as C


def render(points, gt, pred, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 5))
    for k, (labels, title) in enumerate([(gt, "ground truth"),
                                         (pred, "prediction")]):
        ax = fig.add_subplot(1, 2, k + 1, projection="3d")
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], c=labels,
                   cmap="tab20", s=4)
        ax.set_title(title)
        ax.set_axis_off()
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def main(argv=None):
    cfg, mesh, rules = C.setup("partseg", argv)
    cfg.num_class = NUM_PART
    cfg.input_dim = (6 if cfg.normal else 3) + 16
    n_samples = int(cfg.get("n_samples", 4))
    out_dir = str(cfg.get("vis_dir", "./seg_vis"))
    os.makedirs(out_dir, exist_ok=True)

    _, (te_x, te_c, te_s) = load_arrays(cfg)
    model = make_point_model(cfg, task="seg")
    variables, _ = C.init_model(
        model, cfg, jnp.zeros((2, int(cfg.num_point), cfg.input_dim))
    )
    if cfg.get("checkpoint"):
        from ..core import checkpoint as ckpt_lib
        from ..train.loop import create_train_state
        from ..train.optim import make_optimizer

        tx = make_optimizer("Adam")
        tmpl = create_train_state(variables["params"], tx,
                                  variables.get("batch_stats"))
        state, _ = ckpt_lib.Checkpointer(str(cfg.checkpoint)).restore(tmpl)
        if state is not None:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats

    prepare = make_prepare_fn()
    apply = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
    outs = []
    for i in range(min(n_samples, len(te_x))):
        batch = {
            "x": jnp.asarray(te_x[i : i + 1]),
            "cls": jnp.asarray(te_c[i : i + 1]),
            "y": jnp.asarray(te_s[i : i + 1]),
        }
        x, _ = prepare(batch)
        logits = np.asarray(apply(variables, x))[0]
        cat = SEG_LABEL_TO_CAT[int(te_s[i, 0])]
        pred = category_restricted_argmax(logits, cat)
        path = os.path.join(out_dir, f"sample_{i}_{cat}.png")
        render(te_x[i], te_s[i], pred, path)
        acc = float((pred == te_s[i]).mean())
        print(f"sample {i} ({cat}): point acc {acc:.3f} -> {path}")
        outs.append(path)
    return outs


if __name__ == "__main__":
    main()

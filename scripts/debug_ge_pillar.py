"""Probe the group_embed pillar-mode training dynamics: per-step loss,
grad global-norm, param global-norm, logit stats for the first N steps of
the exact accuracy-parity jax leg (noise 0.02, batch 32, deit_tiny full
depth). Diagnoses why the round-5 pillar accuracy leg sits at chance."""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import synthetic_tasks  # noqa: E402

from simple3dformer_tpu.models.voxel_vit import VoxelViT  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage  # noqa: E402
from simple3dformer_tpu.train.loop import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

V = synthetic_tasks.V
seed = 0
batch = 32
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
backbone = "deit_tiny_patch16_224"

rng = np.random.RandomState(seed)
xs, ys = synthetic_tasks.make_hard_shape_voxels(2048, rng, noise=0.02)

from simple3dformer_tpu.nn.vit import BACKBONES

D = BACKBONES[backbone]["embed_dim"]
emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=4, patch_size=4, embed_dim=D)
model = VoxelViT(voxel_embed=emb, n_classes=8,
                 transformer_backbone=backbone, pos_embedding="group_embed",
                 group_axes="pillar", group_pack=0)
variables = jax.jit(
    lambda k, a, b: model.init(k, a, b, method=model.init_all)
)(jax.random.key(seed), jnp.zeros((2, V, V, V)), jnp.zeros((1, 224, 224, 3)))

tx = make_optimizer("Adam")
state = create_train_state(variables["params"], tx)
step = make_train_step(model, tx, donate=False)


@jax.jit
def diag(state, b):
    logits = model.apply({"params": state.params}, b["x"], deterministic=True)
    g = jax.grad(lambda p: jnp.mean(
        jax.nn.log_softmax(model.apply({"params": p}, b["x"],
                                       deterministic=True)) * 0.0
        + optax_loss(model.apply({"params": p}, b["x"], deterministic=True),
                     b["y"])))(state.params)
    gn = jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(g)))
    nan_params = sum(jnp.sum(~jnp.isfinite(x))
                     for x in jax.tree_util.tree_leaves(state.params))
    return jnp.max(jnp.abs(logits)), gn, nan_params


def optax_loss(logits, y):
    import optax as _o
    return _o.softmax_cross_entropy_with_integer_labels(logits, y).mean()

gnorm = jax.jit(lambda g: optax_gn(g))


def optax_gn(tree):
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                        for x in jax.tree_util.tree_leaves(tree)))


pnorm = jax.jit(optax_gn)

order = np.random.RandomState(seed + 1).permutation(2048)
spe = 2048 // batch  # wrap past one epoch (an out-of-range slice yields an
# empty batch whose mean-loss is NaN — the probe's original false alarm)
t0 = time.time()
for s in range(steps):
    e = s % spe
    bi = order[e * batch:(e + 1) * batch]
    b = {"x": jnp.asarray(xs[bi], jnp.float32), "y": jnp.asarray(ys[bi])}
    state, m = step(state, b, lr, jax.random.key(0))
    pn = float(pnorm(state.params))
    extra = ""
    if s >= 55:
        lm, gn, nanp = diag(state, b)
        extra = (f" |logit|max {float(lm):9.2f} gnorm {float(gn):10.2f} "
                 f"nan_params {int(nanp)}")
    print(f"step {s:3d} loss {float(m['loss']):9.4f} "
          f"acc {float(m['accuracy']):.3f} |params| {pn:10.2f} "
          f"({time.time()-t0:.0f}s){extra}", flush=True)

"""Hengshuang point-transformer: shapes, BN state, one train step."""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.hengshuang import (
    PointTransformerCls,
    PointTransformerSeg,
)
from simple3dformer_tpu.train.loop import (
    create_train_state,
    make_train_step,
    seg_cross_entropy,
)
from simple3dformer_tpu.train.optim import make_optimizer

N_POINT = 64  # tiny stand-in for the reference's 1024


def _cls_model():
    return PointTransformerCls(
        num_point=N_POINT, num_class=40, input_dim=6, nblocks=2,
        nneighbor=8, transformer_dim=64,
    )


def test_cls_forward_and_bn_state(rng):
    model = _cls_model()
    x = jnp.asarray(rng.randn(2, N_POINT, 6).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    out = model.apply(variables, x)
    assert out.shape == (2, 40)

    # train mode mutates batch stats
    out2, mut = model.apply(
        variables, x, deterministic=False, mutable=["batch_stats"]
    )
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b),
        variables["batch_stats"], mut["batch_stats"],
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_seg_forward(rng):
    model = PointTransformerSeg(
        num_point=N_POINT, num_class=50, input_dim=22, nblocks=2,
        nneighbor=8, transformer_dim=64,
    )
    x = jnp.asarray(rng.randn(2, N_POINT, 22).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, N_POINT, 50)


def test_cls_train_step_reduces_loss(rng):
    model = _cls_model()
    x = jnp.asarray(rng.randn(8, N_POINT, 6).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 40, size=(8,)))
    variables = model.init(jax.random.key(0), x)

    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx, variables["batch_stats"])
    step = make_train_step(model, tx, has_batch_stats=True)

    batch = {"x": x, "y": y}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, 1e-3, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_seg_train_step(rng):
    model = PointTransformerSeg(
        num_point=N_POINT, num_class=10, input_dim=6, nblocks=1,
        nneighbor=8, transformer_dim=32,
    )
    x = jnp.asarray(rng.randn(4, N_POINT, 6).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, size=(4, N_POINT)))
    variables = model.init(jax.random.key(0), x)
    tx = make_optimizer("SGD")
    state = create_train_state(variables["params"], tx, variables["batch_stats"])
    step = make_train_step(
        model, tx, loss_fn=seg_cross_entropy, has_batch_stats=True
    )
    state, m1 = step(state, {"x": x, "y": y}, 0.01, jax.random.key(1))
    state, m2 = step(state, {"x": x, "y": y}, 0.01, jax.random.key(1))
    assert float(m2["loss"]) < float(m1["loss"])

"""Optimizers + LR schedules matching the reference training recipes.

Recipes replicated:
  * Adam(lr) + StepLR(step_size, gamma) stepped per epoch + UntunedLinearWarmup
    dampening applied per epoch (/root/reference/train_cls_voxel.py:195-198,
    293-294). pytorch_warmup's UntunedLinearWarmup uses
    warmup_period = 2 / (1 - beta2) and multiplies lr by min(1, t / period).
  * torch.optim.Adam(weight_decay) semantics = L2-to-gradient (not AdamW):
    optax.add_decayed_weights *before* scale_by_adam
    (/root/reference/train_cls.py:82-89).
  * torch.optim.SGD(momentum=0.9) (/root/reference/train_cls.py:91 — note the
    reference hardcodes lr=0.01 for SGD regardless of cfg.learning_rate; the
    CLIs mirror that).
  * Frozen 2D parameters get zero updates (requires_grad=False equivalent,
    vit_3d_2d_pretrain.py:428-432) via optax.multi_transform.

The learning rate is NOT baked into the transformation: the jitted train step
takes ``lr`` as a scalar operand and scales the updates itself. The host loop
recomputes lr per epoch exactly like the torch schedulers, with no recompile.
"""

from __future__ import annotations

import jax
import optax


def steplr(base_lr: float, step_size: float, gamma: float, epoch: int) -> float:
    """torch StepLR: lr * gamma ** floor(epoch / step_size)."""
    return base_lr * (gamma ** (epoch // int(step_size)))


def untuned_linear_warmup_factor(epoch: int, beta2: float = 0.999) -> float:
    """pytorch_warmup.UntunedLinearWarmup factor after `epoch` dampen calls."""
    period = int(2.0 / (1.0 - beta2))
    return min(1.0, (epoch + 1) / period)


def epoch_lr(
    base_lr: float,
    epoch: int,
    step_size: float = 20,
    gamma: float = 0.5,
    warmup: bool = False,
    beta2: float = 0.999,
) -> float:
    lr = steplr(base_lr, step_size, gamma, epoch)
    if warmup:
        lr *= untuned_linear_warmup_factor(epoch, beta2)
    return lr


def scale_by_adam_bf16_nu(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8) -> optax.GradientTransformation:
    """scale_by_adam with the second moment stored in bfloat16.

    The Adam pass is HBM-traffic-bound (read p/m/v/g + write p/m/v); nu at
    half width removes 1.5/7 of that traffic, measured 1.14 vs 1.40 ms
    isolation and +3.5% flagship e2e (BASELINE.md round-3). Numerics: nu is
    quantized to ~8 significant bits each step (accumulation itself is f32);
    update directions deviate from f32 Adam in the ~3rd decimal digit.
    """
    import jax
    import jax.numpy as jnp

    tmap = jax.tree_util.tree_map

    def init(params):
        return dict(
            count=jnp.zeros((), jnp.int32),
            mu=tmap(jnp.zeros_like, params),
            nu=tmap(lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params),
        )

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        mu = tmap(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = tmap(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1 - b2) * g * g).astype(jnp.bfloat16),
            state["nu"], grads)
        bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
        updates = tmap(
            lambda m, v: (m / bc1) / (jnp.sqrt(v.astype(jnp.float32) / bc2)
                                      + eps),
            mu, nu)
        return updates, dict(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    optimizer: str = "Adam",
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    trainable_mask=None,
    bf16_nu: bool = False,
) -> optax.GradientTransformation:
    """Direction-only transformation; the train step multiplies by -lr.

    ``trainable_mask``: pytree of bools matching params (True = trainable);
    False leaves receive exactly zero updates and carry no optimizer state.

    ``bf16_nu``: store Adam's second moment in bfloat16. Measured +3.5%
    e2e on the flagship (the optimizer pass is HBM-bound: nu at half width
    is 5.5/7 of the traffic; BASELINE.md round-3 optimizer section). OFF by
    default — the framework's contract is reference-exact optimizer
    numerics (torch.optim.Adam keeps f32 state); opt in for throughput.
    """
    name = optimizer.lower()
    if name == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(scale_by_adam_bf16_nu() if bf16_nu
                     else optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        tx = optax.chain(*parts)
    elif name == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.trace(decay=momentum, nesterov=False))
        tx = optax.chain(*parts)
    else:
        raise ValueError(f"Unknown optimizer {optimizer!r}")

    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def apply_lr(updates, lr):
    """Scale direction updates by -lr (the final optimizer stage)."""
    return jax.tree_util.tree_map(lambda u: -lr * u, updates)

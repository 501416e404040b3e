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


def make_optimizer(
    optimizer: str = "Adam",
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """Direction-only transformation; the train step multiplies by -lr.

    ``trainable_mask``: pytree of bools matching params (True = trainable);
    False leaves receive exactly zero updates and carry no optimizer state.
    """
    name = optimizer.lower()
    if name == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
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

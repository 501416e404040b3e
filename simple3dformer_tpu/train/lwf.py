"""Learning-without-Forgetting training: 3D task loss + 2D teacher distillation.

Reference: /root/reference/train_cls_voxel.py:238-268 and
train_partseg_lwf.py:198-231. Per step, zip a 3D batch with an image batch;
loss = task_CE + lambda * CE(student.forward_images(imgs),
argmax(teacher(imgs))). The teacher is a frozen true-head-count DeiT
(models/DeIT.py); its forward runs under stop_gradient inside the same jit
program — no separate inference service, XLA overlaps both passes.

Scanned variant: both the 3D corpus and the ImageNet subset live HBM-resident;
each scan iteration gathers one batch from each by index (mirroring the
per-epoch random Subset of the reference, train_partseg_lwf.py:194-195).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import ShardingRules
from .loop import TrainState, cross_entropy
from .optim import apply_lr

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_images(u8_images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> normalized float (torchvision transform parity)."""
    x = u8_images.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


IMAGE_CANVAS = 256  # staged source resolution for the on-device crops


def load_images(imagenet_path: str, *, synthetic: int = 0, seed: int = 9,
                canvas: int = IMAGE_CANVAS, max_images: int = 20000):
    """ImageNet val as a uint8 [N,canvas,canvas,3] HBM canvas; synthetic
    fallback when synthetic > 0.

    The explicit LwF image-loading contract shared by BOTH LwF CLIs
    (train_partseg_lwf hydra surface and train_cls_voxel --lwf argparse
    surface) — an explicit signature rather than a config object, so the two
    callers can't drift apart on which keys exist.

    RandomResizedCrop(224)+flip run ON DEVICE inside the scanned step
    (data.image_augment.device_random_resized_crop_flip), fresh per step —
    the reference re-crops per epoch via torchvision
    (/root/reference/train_partseg_lwf.py:125-129); cropping from a
    `canvas`-sized staging copy instead of original resolution is the
    documented tunnel-bandwidth deviation.
    """
    import numpy as np

    if synthetic:
        rng = np.random.RandomState(int(seed) + 7)
        n = max(int(synthetic), 256)
        return (rng.rand(n, canvas, canvas, 3) * 255).astype(np.uint8)
    import os

    from PIL import Image

    valdir = os.path.join(imagenet_path, "val")
    paths = []
    for root, _, files in os.walk(valdir):
        paths.extend(os.path.join(root, f) for f in files
                     if f.lower().endswith((".jpeg", ".jpg", ".png")))
    rng = np.random.RandomState(int(seed))
    rng.shuffle(paths)
    out = []
    for p in paths[:max_images]:
        img = Image.open(p).convert("RGB").resize((canvas, canvas))
        out.append(np.asarray(img, dtype=np.uint8))
    return np.stack(out)


def make_scanned_lwf_train_steps(
    model,
    teacher,
    teacher_params,
    tx,
    task_ds,
    image_ds,
    rules: Optional[ShardingRules] = None,
    task_loss_fn: Callable = cross_entropy,
    lambda_weight: float = 0.1,
    has_batch_stats: bool = False,
    augment_fn: Optional[Callable] = None,
    image_augment_fn: Optional[Callable] = None,
    prepare_fn: Optional[Callable] = None,
    x_dtype=jnp.float32,
    x_key: str = "x",
    y_key: str = "y",
    state_shardings=None,
):
    """Jitted (state, task_idx [S,B], img_idx [S,M], lr, rng) -> (state, metrics).

    ``image_augment_fn(key, u8_images) -> images`` runs inside the step on
    the raw gathered canvas (fresh RandomResizedCrop+flip per STEP — the
    reference re-transforms per epoch, train_partseg_lwf.py:125-129); its
    output is then ImageNet-normalized.

    ``state_shardings``: optional TrainState-shaped pytree of NamedShardings
    replacing ``rules.params`` for the state operand/result — the ZeRO-1
    path (parallel/zero.zero1_state_shardings); most valuable here, where
    the deit_base student's Adam moments are the largest optimizer state in
    the framework.
    """

    def one_step(state: TrainState, t_params, task_arrays, img_arrays, task_idx, img_idx, lr, rng):
        batch = task_ds.gather_from(task_arrays, task_idx)
        if prepare_fn is not None:
            x, y = prepare_fn(batch)
            x = x.astype(x_dtype)
        else:
            x = batch[x_key].astype(x_dtype)
            y = batch[y_key]
        raw_images = image_ds.gather_from(img_arrays, img_idx)["images"]
        key = jax.random.fold_in(rng, state.step)
        if image_augment_fn is not None:
            kimg, key = jax.random.split(key)
            raw_images = image_augment_fn(kimg, raw_images)
        images = normalize_images(raw_images)
        if augment_fn is not None:
            kaug, key = jax.random.split(key)
            x = augment_fn(kaug, x)

        # teacher labels (frozen, no grad)
        t_logits = teacher.apply({"params": t_params}, images)
        t_labels = jax.lax.stop_gradient(jnp.argmax(t_logits, axis=-1))

        def compute_loss(params):
            variables = {"params": params}
            mut = []
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                mut = ["batch_stats"]
            out = model.apply(
                variables, x, deterministic=False,
                rngs={"dropout": key}, mutable=mut or False,
            )
            if mut:
                out, muts = out
                new_stats = muts["batch_stats"]
            else:
                new_stats = state.batch_stats
            task_loss = task_loss_fn(out, y)
            img_pred = model.apply(
                variables if not has_batch_stats else {
                    "params": params, "batch_stats": new_stats
                },
                images,
                deterministic=False,
                rngs={"dropout": key},
                method=model.forward_images,
            )
            lwf_loss = cross_entropy(img_pred, t_labels)
            return task_loss + lambda_weight * lwf_loss, (
                out, new_stats, task_loss, lwf_loss
            )

        (loss, (logits, new_stats, task_loss, lwf_loss)), grads = (
            jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, apply_lr(updates, lr))
        return (
            state.replace(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1),
            {"loss": loss, "task_loss": task_loss, "lwf_loss": lwf_loss},
        )

    def run(state, t_params, task_arrays, img_arrays, task_idx_matrix,
            img_idx_matrix, lr, rng):
        def body(carry, idxs):
            t_idx, i_idx = idxs
            return one_step(carry, t_params, task_arrays, img_arrays,
                            t_idx, i_idx, lr, rng)

        return jax.lax.scan(body, state, (task_idx_matrix, img_idx_matrix))

    # teacher params + corpora as jit ARGUMENTS: closure-captured arrays are
    # baked into the HLO as constants (a deit_base teacher alone is 344 MB,
    # overflowing compile payload limits; see train/loop.py note)
    if rules is None:
        jitted = jax.jit(run, donate_argnums=(0,))
    else:
        state_sh = (state_shardings if state_shardings is not None
                    else rules.params)
        jitted = jax.jit(
            run,
            in_shardings=(state_sh, rules.params, rules.params,
                          rules.params, None, None, None, None),
            out_shardings=(state_sh, rules.params),
            donate_argnums=(0,),
        )

    def call(state, task_idx_matrix, img_idx_matrix, lr, rng):
        return jitted(state, teacher_params, task_ds.arrays, image_ds.arrays,
                      task_idx_matrix, img_idx_matrix, lr, rng)

    return call

"""ShapeNetPart segmentation + LwF distillation — mirrors
/root/reference/train_partseg_lwf.py.

Recipe: class-balanced `portion` subsample of trainval (:70-88), frozen DeiT
teacher matched to the student backbone (:107-115), per-epoch fresh random
ImageNet-val subset batched at M (:194-195), joint loss
CE_seg + 0.1 * CE(forward_images(imgs), argmax(teacher(imgs))) (:216-227),
same LR/BN schedules and mIoU eval as train_partseg.

Without ImageNet on disk, `--synthetic` generates random uint8 images —
exercising the full dual-batch LwF step (the distillation target is then the
teacher's label on noise, which is still a well-defined training signal for
the pipeline's correctness).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt_lib
from ..data.pipeline import DeviceResidentDataset
from ..models.point_vit import frozen_mask_point
from ..models.registry import make_point_model
from ..nn.vit import make_teacher
from ..train.eval_metrics import PartSegMeter
from ..train.loop import create_train_state, make_scanned_eval, seg_cross_entropy
from ..train.lwf import make_scanned_lwf_train_steps
from ..utils.torch_convert import maybe_load_deit
from .train_partseg import load_arrays, make_prepare_fn, NUM_PART
from . import _common as C


def load_images(cfg):
    """Hydra-config adapter over the shared LwF image contract
    (train.lwf.load_images); see that docstring for the semantics. The
    canvas default comes from train.lwf.IMAGE_CANVAS — the single source —
    so the two LwF CLIs cannot drift."""
    from ..train import lwf

    return lwf.load_images(
        cfg.imagenet_data_path,
        synthetic=int(cfg.synthetic or 0),
        seed=int(cfg.seed),
        canvas=int(cfg.get("image_canvas", lwf.IMAGE_CANVAS)),
    )


def main(argv=None):
    cfg, mesh, rules = C.setup("partseg_lwf", argv)
    cfg.num_class = NUM_PART
    cfg.input_dim = (6 if cfg.normal else 3) + 16
    cfg.data_path = cfg.get("shapenetpart_data_path", cfg.get("data_path"))

    (tr_x, tr_c, tr_s), (te_x, te_c, te_s) = load_arrays(cfg)

    # class-balanced portion subsample (reference :70-88)
    portion = float(cfg.get("portion", 1.0))
    if portion < 1.0:
        rng = np.random.RandomState(int(cfg.seed))
        keep = []
        for c in np.unique(tr_c):
            ids = np.where(tr_c == c)[0]
            keep.extend(rng.choice(ids, int(len(ids) * portion), replace=False))
        keep = np.asarray(sorted(keep))
        tr_x, tr_c, tr_s = tr_x[keep], tr_c[keep], tr_s[keep]
    print(f"train {len(tr_x)} / test {len(te_x)}")

    train_ds = C.stage(mesh, x=tr_x, cls=tr_c, y=tr_s)
    test_ds = C.stage(mesh, x=te_x, cls=te_c, y=te_s)
    images = load_images(cfg)
    image_ds = DeviceResidentDataset({"images": images}, mesh=mesh)
    print(f"imagenet subset: {len(images)} images")

    model = make_point_model(cfg, task="seg", dtype=C.compute_dtype(cfg))
    variables, key = C.init_model(
        model, cfg, jnp.zeros((2, int(cfg.num_point), cfg.input_dim)),
        with_images=True,
    )
    params = variables["params"]
    if cfg.model.get("pretrained"):
        params = maybe_load_deit(params, str(cfg.model.transformer_backbone))

    teacher = make_teacher(str(cfg.model.transformer_backbone))
    t_vars = jax.jit(teacher.init)(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    t_params = maybe_load_deit(t_vars["params"], str(cfg.model.transformer_backbone))

    tx, base_lr = C.reference_optimizer(
        cfg, trainable_mask=frozen_mask_point(params, bool(cfg.model.get("pretrained")))
    )
    has_bn = "batch_stats" in variables
    state = jax.device_put(
        create_train_state(params, tx, variables.get("batch_stats")),
        rules.params,
    )
    prepare = make_prepare_fn()

    def task_loss(out, y):
        return seg_cross_entropy(out, y)

    from ..data.image_augment import device_random_resized_crop_flip
    from .train_partseg import seg_augment

    train_run = make_scanned_lwf_train_steps(
        model, teacher, t_params, tx, train_ds, image_ds, rules,
        task_loss_fn=task_loss, lambda_weight=float(cfg.get("lambda_weight", 0.1)),
        has_batch_stats=has_bn, prepare_fn=prepare, augment_fn=seg_augment,
        image_augment_fn=device_random_resized_crop_flip,
    )
    eval_run = make_scanned_eval(model, test_ds, rules, has_batch_stats=has_bn,
                                 prepare_fn=prepare)

    host_rng = np.random.RandomState(int(cfg.seed))
    batch, M = int(cfg.batch_size), int(cfg.get("M", 64))
    eval_idx = rules.put_scan_idx(test_ds.epoch_indices(batch, host_rng, shuffle=False,
                                          drop_last=False))
    ckpt = ckpt_lib.Checkpointer(f"{C.run_dir(cfg, 'partseg_lwf')}/ckpt")

    best_iou = 0.0
    for epoch in range(int(cfg.epoch)):
        lr = max(base_lr * (float(cfg.lr_decay) ** (epoch // int(cfg.step_size))),
                 1e-5)
        idx = train_ds.epoch_indices(batch, host_rng)
        # fresh random image subset per epoch (reference :194-195)
        img_idx = host_rng.randint(0, len(image_ds), size=(idx.shape[0], M))
        state, metrics = train_run(
            state,
            rules.put_scan_idx(idx),
            rules.put_scan_idx(img_idx.astype(np.int32)),
            lr, key,
        )
        print(
            f"Epoch {epoch + 1} lr {lr:f} loss "
            f"{float(jnp.mean(metrics['loss'])):.4f} "
            f"(task {float(jnp.mean(metrics['task_loss'])):.4f} "
            f"lwf {float(jnp.mean(metrics['lwf_loss'])):.4f})"
        )

        # NOTE: prepare_fn is applied inside eval; the LwF train path builds
        # the one-hot concat itself via the same prepare semantics
        logits = C.to_host(eval_run(state, eval_idx))
        logits = logits.reshape(-1, int(cfg.num_point), NUM_PART)[: len(te_s)]
        meter = PartSegMeter()
        meter.update(logits, te_s)
        acc, c_iou, i_iou = (meter.accuracy, meter.class_avg_iou,
                             meter.instance_avg_iou)
        print(f"test Accuracy: {acc:f}  Class avg mIOU: {c_iou:f}  "
              f"Inctance avg mIOU: {i_iou:f}")
        if i_iou >= best_iou:
            best_iou = i_iou
            ckpt.save(epoch, state, {"instance_avg_iou": i_iou})
    print(f"Best inctance avg mIOU is: {best_iou:f}")
    return best_iou


if __name__ == "__main__":
    main()

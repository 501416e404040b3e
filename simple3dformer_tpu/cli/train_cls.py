"""ModelNet40 point-cloud classification — mirrors /root/reference/train_cls.py.

Hydra-style surface: `python -m simple3dformer_tpu.cli.train_cls
model=Hengshuang learning_rate=0.05 batch_size=64` with configs/cls.yaml +
configs/model/<name>.yaml. Same recipe: per-batch dropout/scale/shift
augmentation (on device, inside the jitted step), Adam(wd)/SGD(0.01,m=0.9),
StepLR(50, 0.3), instance + class accuracy, best-model checkpoint + resume.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt_lib
from ..data import augment, datasets
from ..models.registry import make_point_model
from ..train import health
from ..train.eval_metrics import InstanceClassMeter
from ..train.loop import create_train_state, make_scanned_eval, make_scanned_train_steps
from . import _common as C

NUM_CLASS = 40


def load_arrays(cfg):
    npoint = int(cfg.num_point)
    channels = 6 if cfg.normal else 3
    if cfg.synthetic:
        tr = datasets.synthetic_points(int(cfg.synthetic), npoint, channels,
                                       NUM_CLASS, seed=int(cfg.seed))
        te = datasets.synthetic_points(max(int(cfg.synthetic) // 5, 64), npoint,
                                       channels, NUM_CLASS, seed=int(cfg.seed) + 1)
        return tr, te

    def stack(split):
        ds = datasets.ModelNetPointCloud(
            cfg.data_path, npoint=npoint, split=split,
            normal_channel=bool(cfg.normal),
        )
        xs, ys = zip(*(ds[i] for i in range(len(ds))))
        return np.stack(xs), np.concatenate(ys).astype(np.int32)

    return stack("train"), stack("test")


def main(argv=None):
    cfg, mesh, rules = C.setup("cls", argv, inject={"num_class": NUM_CLASS})
    cfg.num_class = NUM_CLASS
    cfg.input_dim = 6 if cfg.normal else 3

    (tr_x, tr_y), (te_x, te_y) = load_arrays(cfg)
    print(f"The size of train data is {len(tr_x)}; test {len(te_x)}")
    train_ds = C.stage(mesh, x=tr_x, y=tr_y)
    test_ds = C.stage(mesh, x=te_x, y=te_y)

    model = make_point_model(cfg, task="cls", dtype=C.compute_dtype(cfg))
    variables, key = C.init_model(model, cfg, jnp.zeros((2, int(cfg.num_point),
                                                         cfg.input_dim)))
    has_bn = "batch_stats" in variables

    tx, base_lr = C.reference_optimizer(cfg)
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"))
    state = jax.device_put(state, rules.params)

    train_run = make_scanned_train_steps(
        model, tx, train_ds, rules, has_batch_stats=has_bn,
        augment_fn=augment.device_cls_augment,
    )
    eval_run = make_scanned_eval(model, test_ds, rules, has_batch_stats=has_bn)
    sched = C.lr_schedule(cfg, base_lr)

    out = C.run_dir(cfg, "cls")
    ckpt = ckpt_lib.Checkpointer(f"{out}/ckpt")
    restored, best = ckpt.restore(state)
    start_epoch = 0
    best_instance_acc = 0.0
    best_class_acc = 0.0
    if restored is not None:
        state, start_epoch = restored, int(ckpt.latest_step()) + 1
        best_instance_acc = (best or {}).get("instance_acc", 0.0)
        print("Use pretrain model")

    host_rng = np.random.RandomState(int(cfg.seed))
    batch = int(cfg.batch_size)
    eval_idx = rules.put_scan_idx(test_ds.epoch_indices(batch, host_rng, shuffle=False,
                                          drop_last=False))

    for epoch in range(start_epoch, int(cfg.epoch)):
        idx = rules.put_scan_idx(train_ds.epoch_indices(batch, host_rng))
        timer = C.EpochTimer()
        state, metrics = train_run(state, idx, sched(epoch), key)
        health.check_finite({"loss": metrics["loss"]}, epoch)
        train_acc = float(jnp.mean(metrics["accuracy"]))
        rate = timer.lap(idx.shape[0] * idx.shape[1])
        print(f"Epoch {epoch + 1}: Train Instance Accuracy: {train_acc:f} ({rate})")

        logits = C.to_host(eval_run(state, eval_idx)).reshape(-1, NUM_CLASS)
        meter = InstanceClassMeter(NUM_CLASS)
        n = len(te_y)
        for s in range(0, n, batch):
            sl = slice(s, min(s + batch, n))
            meter.update(np.argmax(logits[sl], -1), te_y[sl])
        inst, cls_acc = meter.instance_accuracy, meter.class_accuracy
        if inst >= best_instance_acc:
            best_instance_acc = inst
            ckpt.save(epoch, state, {"instance_acc": inst, "class_acc": cls_acc})
            print("Save model...")
        best_class_acc = max(best_class_acc, cls_acc)
        print(f"Test Instance Accuracy: {inst:f}, Class Accuracy: {cls_acc:f}")
        print(f"Best Instance Accuracy: {best_instance_acc:f}, "
              f"Class Accuracy: {best_class_acc:f}")
    print("End of training...")
    return best_instance_acc


if __name__ == "__main__":
    main()

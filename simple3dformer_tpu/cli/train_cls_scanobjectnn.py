"""ScanObjectNN classification — mirrors /root/reference/train_cls_scanobjectnn.py.

Loads the h5 main_split (training_objectdataset_augmentedrot_scale75.h5 /
test_objectdataset_augmentedrot_scale75.h5, 15 classes, 2048 points —
reference lines 60-66), whole set in memory (the reference uses a RAM
TensorDataset), same train loop as train_cls. The reference's broken
`data.scanobjectnn_data_utils` import (its module does not exist) is replaced
by data.datasets.load_scanobjectnn_h5.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt_lib
from ..data import augment, datasets
from ..models.registry import make_point_model
from ..train.eval_metrics import InstanceClassMeter
from ..train.loop import create_train_state, make_scanned_eval, make_scanned_train_steps
from . import _common as C

NUM_CLASS = 15
TRAIN_H5 = "training_objectdataset_augmentedrot_scale75.h5"
TEST_H5 = "test_objectdataset_augmentedrot_scale75.h5"


def load_arrays(cfg):
    npoint = int(cfg.num_point)
    if cfg.synthetic:
        tr = datasets.synthetic_points(int(cfg.synthetic), npoint, 3, NUM_CLASS,
                                       seed=int(cfg.seed))
        te = datasets.synthetic_points(max(int(cfg.synthetic) // 5, 64), npoint,
                                       3, NUM_CLASS, seed=int(cfg.seed) + 1)
        return tr, te
    tr_x, tr_y = datasets.load_scanobjectnn_h5(os.path.join(cfg.data_path, TRAIN_H5))
    te_x, te_y = datasets.load_scanobjectnn_h5(os.path.join(cfg.data_path, TEST_H5))
    return (tr_x[:, :npoint], tr_y), (te_x[:, :npoint], te_y)


def main(argv=None):
    cfg, mesh, rules = C.setup("cls_scanobjectnn", argv)
    cfg.num_class = NUM_CLASS
    cfg.input_dim = 3  # real scans: xyz only (reference line 69)

    (tr_x, tr_y), (te_x, te_y) = load_arrays(cfg)
    print(f"train {len(tr_x)} / test {len(te_x)}")
    train_ds = C.stage(mesh, x=tr_x, y=tr_y)
    test_ds = C.stage(mesh, x=te_x, y=te_y)

    model = make_point_model(cfg, task="cls", dtype=C.compute_dtype(cfg))
    variables, key = C.init_model(
        model, cfg, jnp.zeros((2, int(cfg.num_point), 3))
    )
    has_bn = "batch_stats" in variables

    tx, base_lr = C.reference_optimizer(cfg)
    state = jax.device_put(
        create_train_state(variables["params"], tx, variables.get("batch_stats")),
        rules.params,
    )
    train_run = make_scanned_train_steps(
        model, tx, train_ds, rules, has_batch_stats=has_bn,
        augment_fn=augment.device_cls_augment,
    )
    eval_run = make_scanned_eval(model, test_ds, rules, has_batch_stats=has_bn)
    sched = C.lr_schedule(cfg, base_lr)

    ckpt = ckpt_lib.Checkpointer(f"{C.run_dir(cfg, 'cls_scanobjectnn')}/ckpt")
    host_rng = np.random.RandomState(int(cfg.seed))
    batch = int(cfg.batch_size)
    eval_idx = rules.put_scan_idx(test_ds.epoch_indices(batch, host_rng, shuffle=False,
                                          drop_last=False))

    best = 0.0
    for epoch in range(int(cfg.epoch)):
        idx = rules.put_scan_idx(train_ds.epoch_indices(batch, host_rng))
        timer = C.EpochTimer()
        state, metrics = train_run(state, idx, sched(epoch), key)
        float(jnp.mean(metrics["loss"]))  # sync BEFORE timing the lap
        rate = timer.lap(idx.shape[0] * idx.shape[1])
        logits = C.to_host(eval_run(state, eval_idx)).reshape(-1, NUM_CLASS)
        meter = InstanceClassMeter(NUM_CLASS)
        n = len(te_y)
        for s in range(0, n, batch):
            sl = slice(s, min(s + batch, n))
            meter.update(np.argmax(logits[sl], -1), te_y[sl])
        inst, cls_acc = meter.instance_accuracy, meter.class_accuracy
        if inst >= best:
            best = inst
            ckpt.save(epoch, state, {"instance_acc": inst, "class_acc": cls_acc})
        print(f"Epoch {epoch + 1} Test Instance Accuracy: {inst:f}, "
              f"Class Accuracy: {cls_acc:f} ({rate})")
    print(f"Best Instance Accuracy: {best:f}")
    return best


if __name__ == "__main__":
    main()

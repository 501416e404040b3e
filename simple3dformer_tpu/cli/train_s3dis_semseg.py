"""S3DIS semantic segmentation — mirrors /root/reference/train_s3dis_semseg.py.

13 classes, 4096-point 1m blocks, 9-dim features (xyz-centered, rgb/255,
normalized-room-xyz), plain per-point CE (reference :92,:168), LR
max(lr * decay^(epoch//step), 1e-5) + the same BN-momentum schedule as
partseg, point-accuracy / mAcc / mIoU eval (:190-231).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt_lib
from ..data import datasets
from ..models.registry import make_point_model
from ..train.eval_metrics import SemSegMeter
from ..train.loop import (
    create_train_state,
    make_scanned_eval,
    make_scanned_train_steps,
    seg_cross_entropy,
)
from . import _common as C

NUM_CLASS = 13
INPUT_DIM = 9


def load_arrays(cfg):
    npoint = int(cfg.num_point)
    if cfg.synthetic:
        def synth(n, seed):
            rng = np.random.RandomState(seed)
            return (rng.rand(n, npoint, INPUT_DIM).astype(np.float32),
                    rng.randint(0, NUM_CLASS, size=(n, npoint)).astype(np.int32))

        return synth(int(cfg.synthetic), int(cfg.seed)), synth(
            max(int(cfg.synthetic) // 5, 16), int(cfg.seed) + 1
        )

    def stack(split, n_blocks=None):
        rng = np.random.RandomState(int(cfg.seed))
        ds = datasets.S3DISDataset(cfg.data_path, split=split, num_point=npoint,
                                   rng=rng)
        n = len(ds) if n_blocks is None else min(n_blocks, len(ds))
        xs, ys = zip(*(ds[i] for i in range(n)))
        return np.stack(xs).astype(np.float32), np.stack(ys)

    return stack("train"), stack("test")


def main(argv=None):
    cfg, mesh, rules = C.setup("semseg", argv)
    cfg.num_class = NUM_CLASS
    cfg.input_dim = INPUT_DIM

    (tr_x, tr_y), (te_x, te_y) = load_arrays(cfg)
    print(f"train {len(tr_x)} / test {len(te_x)} blocks")
    train_ds = C.stage(mesh, x=tr_x, y=tr_y)
    test_ds = C.stage(mesh, x=te_x, y=te_y)

    tx = C.reference_optimizer(cfg)[0]
    base_lr = float(cfg.learning_rate)
    host_rng = np.random.RandomState(int(cfg.seed))
    batch = int(cfg.batch_size)
    eval_idx = rules.put_scan_idx(test_ds.epoch_indices(batch, host_rng, shuffle=False,
                                          drop_last=False))
    ckpt = ckpt_lib.Checkpointer(f"{C.run_dir(cfg, 'semseg')}/ckpt")

    state, key = None, jax.random.key(int(cfg.seed))
    model = train_run = eval_run = None
    cur_momentum = None
    best_miou = 0.0
    for epoch in range(int(cfg.epoch)):
        lr = max(base_lr * (float(cfg.lr_decay) ** (epoch // int(cfg.step_size))),
                 1e-5)
        torch_mom = max(0.9 * (0.5 ** (epoch // int(cfg.step_size))), 0.01)
        if torch_mom != cur_momentum:
            cur_momentum = torch_mom
            model = make_point_model(cfg, task="seg", bn_momentum=1.0 - torch_mom,
                                      dtype=C.compute_dtype(cfg))
            if state is None:
                variables, key = C.init_model(
                    model, cfg, jnp.zeros((2, npoint_of(cfg), INPUT_DIM))
                )
                state = jax.device_put(
                    create_train_state(variables["params"], tx,
                                       variables.get("batch_stats")),
                    rules.params,
                )
            has_bn = bool(state.batch_stats)
            train_run = make_scanned_train_steps(
                model, tx, train_ds, rules, loss_fn=seg_cross_entropy,
                has_batch_stats=has_bn,
            )
            eval_run = make_scanned_eval(model, test_ds, rules,
                                         has_batch_stats=has_bn)
            print(f"BN momentum updated to: {torch_mom:f}")

        idx = rules.put_scan_idx(train_ds.epoch_indices(batch, host_rng))
        timer = C.EpochTimer()
        state, metrics = train_run(state, idx, lr, key)
        loss = float(jnp.mean(metrics["loss"]))  # sync BEFORE timing the lap
        rate = timer.lap(idx.shape[0] * idx.shape[1])
        print(f"Epoch {epoch + 1} lr {lr:f} loss {loss:.4f} ({rate})")

        logits = C.to_host(eval_run(state, eval_idx))
        logits = logits.reshape(-1, npoint_of(cfg), NUM_CLASS)[: len(te_y)]
        meter = SemSegMeter(NUM_CLASS)
        meter.update(np.argmax(logits, -1), te_y)
        acc, macc, miou = meter.accuracy, meter.mean_class_accuracy, meter.miou
        inst_iou = meter.instance_avg_iou
        # the reference logs class-avg + "Inctance avg" IoU and saves best
        # checkpoints on the latter (train_s3dis_semseg.py:231-237); the
        # standard global mIoU is printed alongside for comparability
        print(f"eval accuracy: {acc:f}  mAcc: {macc:f}  mIoU: {miou:f}  "
              f"Class avg mIOU: {meter.class_avg_iou:f}  "
              f"Inctance avg mIOU: {inst_iou:f}")
        if inst_iou >= best_miou:
            best_miou = inst_iou
            ckpt.save(epoch, state, {"accuracy": acc, "mAcc": macc,
                                     "mIoU": miou,
                                     "instance_avg_iou": inst_iou})
    print(f"Best Inctance avg mIOU: {best_miou:f}")
    return best_miou


def npoint_of(cfg) -> int:
    return int(cfg.num_point)


if __name__ == "__main__":
    main()

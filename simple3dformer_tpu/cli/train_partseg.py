"""ShapeNetPart segmentation — mirrors /root/reference/train_partseg.py.

Recipe: per-point 50-way CE with the shape's 16-way category label one-hot
concatenated to every point (to_categorical, reference :41,:147), LR
max(lr * decay^(epoch//step), 1e-5), BN-momentum schedule
0.9 * 0.5^(epoch//step) clipped at 0.01 (reference :97-130; note flax BN
momentum = 1 - torch momentum), category-restricted argmax eval with
class-avg and instance-avg mIoU ("absent part counts as 1.0", :194-206).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt_lib
from ..data import augment, datasets
from ..models.registry import make_point_model
from ..train.eval_metrics import SEG_CLASSES, PartSegMeter
from ..train.loop import (
    create_train_state,
    make_scanned_eval,
    make_scanned_train_steps,
    seg_cross_entropy,
)
from . import _common as C

NUM_PART = 50
NUM_CATEGORY = 16


def make_prepare_fn(num_category=NUM_CATEGORY):
    def prepare(batch):
        pts = batch["x"]  # [..., N, C]
        label = batch["cls"]  # [...,] shape category
        onehot = jax.nn.one_hot(label, num_category, dtype=pts.dtype)
        onehot = jnp.broadcast_to(
            onehot[..., None, :], pts.shape[:-1] + (num_category,)
        )
        return jnp.concatenate([pts, onehot], axis=-1), batch["y"]

    return prepare


def seg_augment(key, x):
    """train_partseg.py:141-144: random scale + shift on xyz only."""
    k1, k2 = jax.random.split(key)
    xyz = x[..., :3]
    xyz = augment.device_random_scale(k1, xyz)
    xyz = augment.device_shift(k2, xyz)
    return jnp.concatenate([xyz, x[..., 3:]], axis=-1)


def load_arrays(cfg):
    npoint = int(cfg.num_point)
    base = 6 if cfg.normal else 3
    if cfg.synthetic:
        def synth(n, seed):
            rng = np.random.RandomState(seed)
            cats = rng.randint(0, NUM_CATEGORY, size=(n,)).astype(np.int32)
            pts = rng.randn(n, npoint, base).astype(np.float32)
            segs = np.stack([
                rng.choice(SEG_CLASSES[list(SEG_CLASSES)[c % 16]], size=npoint)
                for c in cats
            ]).astype(np.int32)
            return pts, cats, segs

        return synth(int(cfg.synthetic), int(cfg.seed)), synth(
            max(int(cfg.synthetic) // 5, 32), int(cfg.seed) + 1
        )

    def stack(split, portion=1.0):
        rng = np.random.RandomState(int(cfg.seed))
        ds = datasets.PartNormalDataset(
            cfg.data_path, npoints=npoint, split=split,
            normal_channel=bool(cfg.normal), rng=rng,
        )
        n = len(ds)
        take = range(n)
        xs, cs, ss = [], [], []
        for i in take:
            p, c, s = ds[i]
            xs.append(p)
            cs.append(c[0])
            ss.append(s)
        return np.stack(xs), np.asarray(cs, np.int32), np.stack(ss)

    return stack("trainval"), stack("test")


def main(argv=None):
    cfg, mesh, rules = C.setup("partseg", argv)
    cfg.num_class = NUM_PART
    cfg.input_dim = (6 if cfg.normal else 3) + NUM_CATEGORY

    (tr_x, tr_c, tr_s), (te_x, te_c, te_s) = load_arrays(cfg)
    print(f"train {len(tr_x)} / test {len(te_x)}")
    train_ds = C.stage(mesh, x=tr_x, cls=tr_c, y=tr_s)
    test_ds = C.stage(mesh, x=te_x, cls=te_c, y=te_s)

    prepare = make_prepare_fn()
    base_lr_cfg = float(cfg.learning_rate)
    tx = C.reference_optimizer(cfg)[0]

    host_rng = np.random.RandomState(int(cfg.seed))
    batch = int(cfg.batch_size)
    eval_idx = rules.put_scan_idx(test_ds.epoch_indices(batch, host_rng, shuffle=False,
                                          drop_last=False))

    ckpt = ckpt_lib.Checkpointer(f"{C.run_dir(cfg, 'partseg')}/ckpt")
    state = None
    best_inst_iou = 0.0
    key = jax.random.key(int(cfg.seed))
    cur_momentum = None
    model = train_run = eval_run = None

    for epoch in range(int(cfg.epoch)):
        lr = max(
            base_lr_cfg * (float(cfg.lr_decay) ** (epoch // int(cfg.step_size))),
            1e-5,
        )
        torch_mom = max(0.9 * (0.5 ** (epoch // int(cfg.step_size))), 0.01)
        if torch_mom != cur_momentum:
            cur_momentum = torch_mom
            model = make_point_model(cfg, task="seg", bn_momentum=1.0 - torch_mom,
                                      dtype=C.compute_dtype(cfg))
            if state is None:
                variables, key = C.init_model(
                    model, cfg,
                    jnp.zeros((2, int(cfg.num_point), cfg.input_dim)),
                )
                state = jax.device_put(
                    create_train_state(variables["params"], tx,
                                       variables.get("batch_stats")),
                    rules.params,
                )
            has_bn = bool(state.batch_stats)
            train_run = make_scanned_train_steps(
                model, tx, train_ds, rules, loss_fn=seg_cross_entropy,
                has_batch_stats=has_bn, augment_fn=seg_augment,
                prepare_fn=prepare,
            )
            eval_run = make_scanned_eval(
                model, test_ds, rules, has_batch_stats=has_bn, prepare_fn=prepare
            )
            print(f"BN momentum updated to: {torch_mom:f}")

        idx = rules.put_scan_idx(train_ds.epoch_indices(batch, host_rng))
        timer = C.EpochTimer()
        state, metrics = train_run(state, idx, lr, key)
        loss = float(jnp.mean(metrics["loss"]))  # sync BEFORE timing the lap
        rate = timer.lap(idx.shape[0] * idx.shape[1])
        print(f"Epoch {epoch + 1} lr {lr:f} train loss {loss:.4f} ({rate})")

        logits = C.to_host(eval_run(state, eval_idx))
        logits = logits.reshape(-1, int(cfg.num_point), NUM_PART)[: len(te_s)]
        meter = PartSegMeter()
        meter.update(logits, te_s)
        acc, c_iou, i_iou = meter.accuracy, meter.class_avg_iou, meter.instance_avg_iou
        print(f"Epoch {epoch + 1} test Accuracy: {acc:f}  Class avg mIOU: "
              f"{c_iou:f}  Inctance avg mIOU: {i_iou:f}")
        if i_iou >= best_inst_iou:
            best_inst_iou = i_iou
            ckpt.save(epoch, state, {
                "accuracy": acc, "class_avg_iou": c_iou, "instance_avg_iou": i_iou,
            })
    print(f"Best inctance avg mIOU is: {best_inst_iou:f}")
    return best_inst_iou


if __name__ == "__main__":
    main()

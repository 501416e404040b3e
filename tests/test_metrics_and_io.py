"""Eval-metric conventions, binvox codec roundtrip, config system."""

import io

import numpy as np

from simple3dformer_tpu.core.config import Config, load_task_config
from simple3dformer_tpu.data import binvox
from simple3dformer_tpu.train import eval_metrics as M
from simple3dformer_tpu.train.optim import (
    epoch_lr,
    steplr,
    untuned_linear_warmup_factor,
)


def test_classification_meter():
    m = M.ClassificationMeter(3)
    m.update(np.array([0, 1, 2, 0]), np.array([0, 1, 1, 0]))
    assert m.overall_accuracy == 0.75
    # class 0: 2/2, class 1: 1/2, class 2 unseen -> (1 + 0.5 + 0)/3
    assert abs(m.mean_class_accuracy - (1 + 0.5) / 3) < 1e-9


def test_partseg_meter_absent_part_convention():
    m = M.PartSegMeter()
    # one Laptop shape (parts 28, 29): predict part 28 everywhere, gt 28
    logits = np.zeros((1, 4, 50))
    logits[..., 28] = 5.0
    target = np.full((1, 4), 28)
    m.update(logits, target)
    # part 28 IoU = 1, part 29 absent in gt+pred -> counts as 1.0
    assert m.instance_avg_iou == 1.0
    assert m.accuracy == 1.0


def test_category_restricted_argmax():
    logits = np.zeros((2, 50))
    logits[:, 0] = 10.0  # Airplane part would win unrestricted
    logits[:, 29] = 5.0
    pred = M.category_restricted_argmax(logits, "Laptop")  # parts 28, 29
    np.testing.assert_array_equal(pred, [29, 29])


def test_semseg_meter():
    m = M.SemSegMeter(3)
    m.update(np.array([0, 1, 1]), np.array([0, 1, 2]))
    assert m.accuracy == 2 / 3
    assert abs(m.miou - np.nanmean([1.0, 0.5, 0.0])) < 1e-9


def test_semseg_meter_reference_iou_conventions():
    """class_avg_iou / instance_avg_iou against a literal transcription of
    the reference's bookkeeping (train_s3dis_semseg.py:181,201-231): a
    sample's 'category' is its FIRST point's label and the per-sample IoU
    is computed for that single class only."""
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 4, size=(8, 16))
    label = rng.randint(0, 4, size=(8, 16))
    m = M.SemSegMeter(4)
    m.update(pred[:5], label[:5])
    m.update(pred[5:], label[5:])

    shape_ious = {c: [] for c in range(4)}
    for i in range(8):
        segp, segl = pred[i], label[i]
        cat = segl[0]
        part_ious = []
        for l in [cat]:  # seg_classes[cat] is the single-label list [cat]
            if (np.sum(segl == l) == 0) and (np.sum(segp == l) == 0):
                part_ious.append(1.0)
            else:
                part_ious.append(np.sum((segl == l) & (segp == l))
                                 / float(np.sum((segl == l) | (segp == l))))
        shape_ious[cat].append(float(np.mean(part_ious)))
    all_ious = [x for v in shape_ious.values() for x in v]
    cls_avg = np.mean([np.mean(v) for v in shape_ious.values() if v])
    assert abs(m.instance_avg_iou - np.mean(all_ious)) < 1e-12
    assert abs(m.class_avg_iou - cls_avg) < 1e-12
    # 1-D (flat) updates keep feeding the global counters only
    m2 = M.SemSegMeter(4)
    m2.update(pred.reshape(-1), label.reshape(-1))
    assert m2.instance_avg_iou == 0.0 and m2.accuracy == m.accuracy


def test_binvox_roundtrip(rng):
    data = rng.rand(16, 16, 16) > 0.6
    v = binvox.Voxels(data, [16, 16, 16], [0.0, 0.0, 0.0], 1.0, "xyz")
    back = binvox.roundtrip_bytes(v)
    np.testing.assert_array_equal(back.data, data)
    assert back.dims == [16, 16, 16]

    # coord array agrees with dense nonzeros
    buf = io.BytesIO()
    binvox.write(v, buf)
    buf.seek(0)
    coords = binvox.read_as_coord_array(buf)
    dense = binvox.sparse_to_dense(coords.data, 16)
    np.testing.assert_array_equal(dense, data)


def test_binvox_long_runs():
    data = np.ones((8, 8, 8), dtype=bool)  # run length 512 > 255
    v = binvox.Voxels(data, [8, 8, 8], [0, 0, 0], 1.0, "xyz")
    back = binvox.roundtrip_bytes(v)
    np.testing.assert_array_equal(back.data, data)


def test_config_overrides(tmp_path):
    cfg = load_task_config("cls", ["model=Hengshuang", "learning_rate=0.5",
                                   "model.nblocks=2"])
    assert cfg.model.name == "Hengshuang"
    assert cfg.model.nblocks == 2
    assert cfg.learning_rate == 0.5
    assert cfg.batch_size == 64  # untouched default

    c = Config.from_dict({"a": {"b": 1}})
    c.set_dotted("a.c.d", 3)
    assert c.get_dotted("a.c.d") == 3
    assert c.get_dotted("a.zz", "fallback") == "fallback"
    assert Config.from_dict(c.to_dict()) == c


def test_schedules():
    assert steplr(1.0, 20, 0.5, 0) == 1.0
    assert steplr(1.0, 20, 0.5, 20) == 0.5
    assert steplr(1.0, 20, 0.5, 45) == 0.25
    # int(2 / (1 - 0.999)) == 1999 — float truncation, matching pytorch_warmup
    assert untuned_linear_warmup_factor(0) == 1 / 1999
    assert untuned_linear_warmup_factor(3000) == 1.0
    assert epoch_lr(1.0, 20, warmup=True) == 0.5 * (21 / 1999)


def test_health_check_finite():
    import pytest

    from simple3dformer_tpu.train import health

    health.check_finite({"loss": np.array([1.0, 2.0])})  # fine
    with pytest.raises(health.TrainingDiverged, match="step 1"):
        health.check_finite({"loss": np.array([1.0, np.nan])}, epoch=3)

    guard = health.DivergenceGuard(max_rollbacks=1)
    good, bad = "good_state", "bad_state"
    out = guard.check(bad, {"loss": np.array([np.inf])}, 0, good_state=good)
    assert out == good
    with pytest.raises(health.TrainingDiverged):
        guard.check(bad, {"loss": np.array([np.inf])}, 1, good_state=good)

"""Round-2 data-layer tail: S3DIS block/sample preppers, OBJ/bbox exporters,
ScanObjectNN h5 variants, ImageNet label table (VERDICT.md items 4-6)."""

import os

import numpy as np
import pytest

from simple3dformer_tpu.data import datasets
from simple3dformer_tpu.tools import indoor3d_blocks as ib


def _fake_room(rng, n=3000, extent=(3.0, 2.5, 2.0)):
    """[N,7] XYZRGBL with min corner at origin (collector convention)."""
    xyz = rng.rand(n, 3) * np.asarray(extent)
    xyz -= xyz.min(0)
    rgb = rng.randint(0, 256, size=(n, 3)).astype(float)
    lab = rng.randint(0, 13, size=(n, 1)).astype(float)
    return np.concatenate([xyz, rgb, lab], axis=1)


def test_room2blocks_normalized_shapes_and_ranges(tmp_path, rng):
    room = _fake_room(rng)
    np.save(tmp_path / "room.npy", room)
    data, label = ib.room2blocks_wrapper_normalized(
        str(tmp_path / "room.npy"), num_point=128, block_size=1.0, stride=1.0,
        rng=rng,
    )
    assert data.shape[1:] == (128, 9) and label.shape[1:] == (128,)
    assert data.shape[0] == label.shape[0] > 0
    # channels 3:6 are RGB/255, 6:9 are room-normalized xyz in [0,1]
    assert data[:, :, 3:6].min() >= 0 and data[:, :, 3:6].max() <= 1
    assert data[:, :, 6:9].min() >= 0 and data[:, :, 6:9].max() <= 1 + 1e-9
    # block xy recentered on the block middle: |x|,|y| <= block_size/2
    assert np.abs(data[:, :, 0:2]).max() <= 0.5 + 1e-6
    assert set(np.unique(label)) <= set(range(13))


def test_room2blocks_discards_sparse_and_pads_with_duplicates(rng):
    # two dense clusters 2m apart; middle blocks have < 100 points
    a = rng.rand(500, 6) * [0.5, 0.5, 2.0, 1, 1, 1]
    b = rng.rand(500, 6) * [0.5, 0.5, 2.0, 1, 1, 1] + [2.5, 0, 0, 0, 0, 0]
    data = np.concatenate([a, b])
    label = np.concatenate([np.zeros(500), np.ones(500)]).astype(np.uint8)
    blocks, labels = ib.room2blocks(data, label, num_point=1024,
                                    block_size=1.0, stride=1.0, rng=rng)
    # each returned block is one pure cluster, padded 500 -> 1024 with dups
    assert blocks.shape == (2, 1024, 6)
    for i in range(2):
        assert len(np.unique(labels[i])) == 1


def test_room2samples_covers_every_point(rng):
    room = _fake_room(rng, n=1000)
    data, label = ib.room2samples_plus_normalized(room, num_point=256, rng=rng)
    assert data.shape == (4, 256, 9)
    assert label.shape == (4, 256, 1)
    # all output x-values come from the room, and every original point is
    # covered (padding only duplicates existing points)
    norm_x = np.unique(room[:, 0] / room[:, 0].max())
    np.testing.assert_array_equal(np.unique(data[:, :, 6]), norm_x)


def test_obj_and_bbox_exporters(tmp_path, rng):
    room = _fake_room(rng, n=300)
    ib.data_to_obj(room, name=str(tmp_path / "room.obj"), no_wall=True)
    lines = open(tmp_path / "room.obj").read().splitlines()
    assert all(l.startswith("v ") for l in lines)
    kept = np.sum((room[:, -1] != 0) & (room[:, -1] != 2))
    assert len(lines) == kept

    np.savetxt(tmp_path / "room.txt", room)
    ib.point_label_to_obj(str(tmp_path / "room.txt"),
                          str(tmp_path / "room_color.obj"), easy_view=True)
    n_easy = np.sum(np.isin(room[:, -1].astype(int), ib.EASY_VIEW_LABELS))
    assert len(open(tmp_path / "room_color.obj").read().splitlines()) == n_easy

    # bbox collection from an Annotations dir
    anno = tmp_path / "Annotations"
    anno.mkdir()
    pts = rng.rand(50, 6)
    np.savetxt(anno / "chair_1.txt", pts)
    np.savetxt(anno / "staris_1.txt", rng.rand(20, 6) + 1.0)  # -> clutter
    bbox = ib.collect_bounding_box(str(anno), str(tmp_path / "bbox.txt"))
    assert bbox.shape == (2, 7)
    assert {int(b) for b in bbox[:, -1]} == {
        ib.CLASS2LABEL["chair"], ib.CLASS2LABEL["clutter"]}
    assert bbox[:, 0:3].min() == 0.0  # shifted to origin

    objs = ib.bbox_label_to_obj(str(tmp_path / "bbox.txt"),
                                str(tmp_path / "boxes"))
    assert len(objs) == 2
    content = open(objs[0]).read()
    assert content.count("\nv ") + content.startswith("v ") == 8
    assert content.count("\nf ") == 6
    assert os.path.exists(objs[0].replace(".obj", ".mtl"))

    pb = ib.collect_point_bounding_box(str(anno), str(tmp_path / "pb.npy"),
                                       "numpy")
    assert pb.shape == (70, 13)
    # center = point + offset lies inside the instance's half-dims
    centers = pb[:50, 0:3] + pb[:50, 7:10]
    assert np.allclose(centers, centers[0])  # one shared box center


def test_scanobjectnn_h5_variants(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    n, p = 6, 32
    data = rng.rand(n, p, 3).astype(np.float32)
    label = rng.randint(0, 15, size=(n,))
    mask = rng.randint(-1, 3, size=(n, p))
    parts = rng.randint(0, 4, size=(n, p))
    types = rng.randint(0, 2, size=(n,))
    path = str(tmp_path / "split.h5")
    with h5py.File(path, "w") as f:
        f["data"], f["label"], f["mask"] = data, label, mask
        f["parts"], f["type"] = parts, types

    d, l, m = datasets.load_withmask_h5(path)
    assert d.shape == (n, p, 3) and m.shape == (n, p)
    d, l, pr = datasets.load_parts_h5(path)
    assert pr.shape == (n, p)
    d, l, t = datasets.load_discriminator_h5(path)
    assert t.shape == (n,)

    s, sl, sm = datasets.get_current_data_withmask_h5(
        data, label, mask, 16, rng=np.random.RandomState(9))
    assert s.shape == (n, 16, 3) and sm.shape == (n, 16)
    # exact replication of the reference's two-shuffle recipe: one shared
    # point permutation, then a cloud-order shuffle — mask stays aligned
    r2 = np.random.RandomState(9)
    idx_pts = np.arange(p)
    r2.shuffle(idx_pts)
    idx = np.arange(n)
    r2.shuffle(idx)
    np.testing.assert_array_equal(s, data[:, idx_pts[:16]][idx])
    np.testing.assert_array_equal(sm, mask[:, idx_pts[:16]][idx])
    np.testing.assert_array_equal(sl, label[idx])

    # shuffle=False keeps order and the first num_points points
    s, sl, sm = datasets.get_current_data_withmask_h5(data, label, mask, 16,
                                                      shuffle=False)
    np.testing.assert_array_equal(s, data[:, :16])
    np.testing.assert_array_equal(sl, label)
    np.testing.assert_array_equal(sm, mask[:, :16])

    s, sl, sp = datasets.get_current_data_parts_h5(data, label, parts, 16,
                                                   rng=np.random.RandomState(1))
    assert sp.shape == (n, 16)
    s, sl, st = datasets.get_current_data_discriminator_h5(
        data, label, types, 16, rng=np.random.RandomState(1))
    assert st.shape == (n,)

    bm = datasets.convert_to_binary_mask(mask)
    np.testing.assert_array_equal(bm, (mask != -1).astype(float))
    np.testing.assert_array_equal(datasets.flip_types(types), types == 0)


def test_imagenet_class_names_and_serve_auto():
    from simple3dformer_tpu.data.classmaps import imagenet_class_names
    from simple3dformer_tpu.serve.server import default_class_names

    names = imagenet_class_names()
    assert len(names) == 1000
    assert names[0].startswith("tench")
    assert "toilet tissue" in names[999]

    assert default_class_names(1000) == names
    assert default_class_names(40)[0] == "airplane"
    assert default_class_names(13)[0] == "ceiling"
    assert default_class_names(15)[0] == "bag"
    assert default_class_names(7) is None

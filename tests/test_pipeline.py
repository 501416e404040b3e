"""HBM-resident pipeline + scanned multi-step training + augmentation."""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.data import augment, datasets
from simple3dformer_tpu.data.pipeline import (
    DeviceResidentDataset,
    collate,
    host_batches,
)
from simple3dformer_tpu.models.hengshuang import PointTransformerCls
from simple3dformer_tpu.nn.voxel_embed import make_embed_layer
from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh
from simple3dformer_tpu.train.loop import (
    create_train_state,
    make_scanned_train_steps,
)
from simple3dformer_tpu.train.optim import make_optimizer


def test_device_resident_gather_and_epoch(rng):
    x, y = datasets.synthetic_voxels(40, 8, 5)
    ds = DeviceResidentDataset({"x": x, "y": y})
    idx = jnp.asarray([3, 7, 1])
    b = ds.gather(idx)
    np.testing.assert_array_equal(np.asarray(b["x"]), x[[3, 7, 1]])
    np.testing.assert_array_equal(np.asarray(b["y"]), y[[3, 7, 1]])

    em = ds.epoch_indices(8, rng)
    assert em.shape == (5, 8)
    assert len(np.unique(em)) == 40  # full permutation, no repeats


def test_scanned_train_on_virtual_mesh(rng):
    """Full multi-step scanned training over the 8-device CPU mesh."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rules = ShardingRules(mesh)

    x, y = datasets.synthetic_voxels(64, 12, 4)
    ds = DeviceResidentDataset({"x": x, "y": y}, mesh=mesh)

    emb = make_embed_layer("VoxelEmbed", voxel_size=12, cell_size=4,
                           patch_size=3, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(0), jnp.zeros((2, 12, 12, 12)), jnp.zeros((2, 224, 224, 3)))

    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx)
    state = jax.device_put(state, rules.params)

    run = make_scanned_train_steps(model, tx, ds, rules)
    idx = jnp.asarray(ds.epoch_indices(16, rng))  # [4, 16]
    idx = jax.device_put(idx, rules.scan_batch)
    state2, metrics = run(state, idx, 1e-3, jax.random.key(1))
    assert metrics["loss"].shape == (4,)
    assert int(state2.step) == 4
    # second epoch continues from the new state
    state3, m2 = run(state2, idx, 1e-3, jax.random.key(2))
    assert float(m2["loss"][-1]) < float(metrics["loss"][0])


def test_scanned_train_with_augmentation(rng):
    x, y = datasets.synthetic_points(32, 24, 6, 5)
    ds = DeviceResidentDataset({"x": x, "y": y})
    model = PointTransformerCls(num_point=24, num_class=5, input_dim=6,
                                nblocks=1, nneighbor=4, transformer_dim=16)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 24, 6)))
    tx = make_optimizer("SGD")
    state = create_train_state(variables["params"], tx, variables["batch_stats"])
    run = make_scanned_train_steps(
        model, tx, ds, has_batch_stats=True,
        augment_fn=augment.device_cls_augment,
    )
    idx = jnp.asarray(ds.epoch_indices(8, rng))
    state, metrics = run(state, idx, 0.01, jax.random.key(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_host_batches_and_collate(rng):
    x, y = datasets.synthetic_voxels(10, 4, 3)

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"voxel": x[i], "cls_idx": y[i]}

    batches = list(host_batches(DS(), 4, rng=rng, shuffle=True))
    assert [len(b) for b in batches] == [4, 4, 2]
    cb = collate(batches[0])
    assert cb["voxel"].shape == (4, 4, 4, 4)
    assert cb["cls_idx"].shape == (4,)


def test_np_augment_shapes(rng):
    batch = rng.randn(3, 16, 3).astype(np.float32)
    for fn in (
        augment.rotate_point_cloud,
        augment.rotate_point_cloud_z,
        augment.rotate_perturbation_point_cloud,
        augment.jitter_point_cloud,
        augment.shift_point_cloud,
        augment.random_scale_point_cloud,
        augment.random_point_dropout,
    ):
        out = fn(batch, rng=rng) if "rng" in fn.__code__.co_varnames else fn(batch)
        assert out.shape == batch.shape

    # rotation preserves norms
    rot = augment.rotate_point_cloud(batch, rng=rng)
    np.testing.assert_allclose(
        np.linalg.norm(rot, axis=-1), np.linalg.norm(batch, axis=-1), rtol=1e-4
    )

    # dropout replaces with first point
    dropped = augment.random_point_dropout(batch, rng=np.random.RandomState(0))
    mask = ~np.all(dropped == batch, axis=-1)
    for b in range(3):
        assert np.all(dropped[b][mask[b]] == batch[b, 0])


def test_rotation_matrices_reference_exact(rng):
    """Exact provider.py parity: same seeded draws -> bitwise-equal outputs
    for the z-rotation (provider.py:66-84) and the xyz perturbation
    (provider.py:176-198). Round-2 fix: both matrices were transposed."""
    batch = rng.randn(3, 16, 3).astype(np.float32)

    r1, r2 = np.random.RandomState(5), np.random.RandomState(5)
    got = augment.rotate_point_cloud_z(batch, rng=r1)
    want = np.zeros_like(batch)
    for k in range(3):
        ang = r2.uniform() * 2 * np.pi
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
        want[k] = batch[k].reshape(-1, 3) @ R
    np.testing.assert_array_equal(got, want)

    r1, r2 = np.random.RandomState(6), np.random.RandomState(6)
    got = augment.rotate_perturbation_point_cloud(batch, rng=r1)
    want = np.zeros_like(batch)
    for k in range(3):
        a = np.clip(0.06 * r2.randn(3), -0.18, 0.18)
        Rx = np.array([[1, 0, 0],
                       [0, np.cos(a[0]), -np.sin(a[0])],
                       [0, np.sin(a[0]), np.cos(a[0])]])
        Ry = np.array([[np.cos(a[1]), 0, np.sin(a[1])],
                       [0, 1, 0],
                       [-np.sin(a[1]), 0, np.cos(a[1])]])
        Rz = np.array([[np.cos(a[2]), -np.sin(a[2]), 0],
                       [np.sin(a[2]), np.cos(a[2]), 0],
                       [0, 0, 1]])
        want[k] = batch[k].reshape(-1, 3) @ (Rz @ (Ry @ Rx))
    np.testing.assert_array_equal(got, want)


def test_device_augment_matches_host_semantics(rng):
    key = jax.random.key(3)
    pts = jnp.asarray(rng.randn(4, 32, 6).astype(np.float32))
    out = np.asarray(augment.device_cls_augment(key, pts))
    assert out.shape == pts.shape
    # normals (channels 3:6) are never scaled/shifted: each output normal is
    # either the point's own normal or (after dropout) the first point's
    src = np.asarray(pts)
    ok = np.isclose(out[..., 3:], src[..., 3:]).all(-1) | np.isclose(
        out[..., 3:], src[:, :1, 3:]
    ).all(-1)
    assert ok.all()


def test_scanned_train_unroll_matches_unroll1(rng):
    """unroll=3 (non-divisor of S=4) is semantically the same scan.

    Tolerance: XLA fuses the unrolled body differently, so results agree to
    rounding (measured 1 ulp on the loss trace), not bit-exactly.
    """
    x, y = datasets.synthetic_voxels(64, 12, 4)
    ds = DeviceResidentDataset({"x": x, "y": y})
    emb = make_embed_layer("VoxelEmbed", voxel_size=12, cell_size=4,
                           patch_size=3, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(0), jnp.zeros((2, 12, 12, 12)), jnp.zeros((2, 224, 224, 3)))
    tx = make_optimizer("Adam")
    idx = jnp.asarray(ds.epoch_indices(16, rng))  # [4, 16]

    outs = []
    for unroll in (1, 3):
        # fresh copies: the donated state would otherwise delete the shared
        # param buffers between loop iterations
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = create_train_state(params, tx)
        run = make_scanned_train_steps(model, tx, ds, unroll=unroll)
        state, metrics = run(state, idx, 1e-3, jax.random.key(1))
        outs.append((np.asarray(metrics["loss"]),
                     np.asarray(state.params["head"]["kernel"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)

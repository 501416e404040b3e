"""Data-parallel correctness: N-device training == 1-device training.

The SPMD claim is that sharding the batch over the mesh with replicated
params produces exactly the same parameter updates as a single device (XLA's
psum is the DDP allreduce). Verified numerically on the virtual 8-device CPU
mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset
from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed
from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh
from simple3dformer_tpu.train.loop import create_train_state, make_scanned_train_steps
from simple3dformer_tpu.train.optim import make_optimizer


def _run(n_devices, variables, x, y, rng_idx):
    mesh = make_mesh(n_data=n_devices, devices=jax.devices()[:n_devices])
    rules = ShardingRules(mesh)
    ds = DeviceResidentDataset({"x": x, "y": y}, mesh=mesh)
    emb = VoxelEmbed(voxel_size=8, cell_size=4, patch_size=2, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    tx = make_optimizer("SGD")  # linear in grad: Adam amplifies reduction-order eps
    params = jax.tree_util.tree_map(jnp.array, variables["params"])  # fresh copy
    state = jax.device_put(create_train_state(params, tx), rules.params)
    run = make_scanned_train_steps(model, tx, ds, rules)
    idx = rules.put_scan_idx(rng_idx)
    state, metrics = run(state, idx, 1e-2, jax.random.key(7))
    return (
        jax.device_get(state.params),
        np.asarray(jax.device_get(metrics["loss"])),
    )


def test_dp8_matches_single_device(rng):
    x = (rng.rand(64, 8, 8, 8) > 0.7).astype(np.uint8)
    y = rng.randint(0, 4, size=(64,)).astype(np.int32)
    emb = VoxelEmbed(voxel_size=8, cell_size=4, patch_size=2, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 8, 8, 8)))

    idx = rng.randint(0, 64, size=(3, 16)).astype(np.int32)
    p1, l1 = _run(1, variables, x, y, idx)
    p8, l8 = _run(8, variables, x, y, idx)

    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )

    jax.tree_util.tree_map_with_path(check, p1, p8)


def test_dcn_mesh_matches_single_device(rng):
    """Multi-slice story: a (dcn=2, data=4) mesh — batch sharded jointly over
    both axes, grads psum'd across slices — equals the 1-device step."""
    from simple3dformer_tpu.parallel.mesh import DCN_AXIS

    x = (rng.rand(32, 8, 8, 8) > 0.7).astype(np.uint8)
    y = rng.randint(0, 4, size=(32,)).astype(np.int32)
    emb = VoxelEmbed(voxel_size=8, cell_size=4, patch_size=2, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 8, 8, 8)))
    idx = rng.randint(0, 32, size=(2, 16)).astype(np.int32)

    p_ref, l_ref = _run(1, variables, x, y, idx)

    mesh = make_mesh(n_dcn=2, n_data=4)
    assert mesh.axis_names == (DCN_AXIS, "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 4, "model": 1}
    rules = ShardingRules(mesh)
    ds = DeviceResidentDataset({"x": x, "y": y}, mesh=mesh)
    tx = make_optimizer("SGD")
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    state = jax.device_put(create_train_state(params, tx), rules.params)
    run = make_scanned_train_steps(model, tx, ds, rules)
    state, metrics = run(state, rules.put_scan_idx(idx), 1e-2, jax.random.key(7))

    np.testing.assert_allclose(
        np.asarray(jax.device_get(metrics["loss"])), l_ref, rtol=1e-4, atol=1e-5
    )

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )

    jax.tree_util.tree_map_with_path(check, p_ref, jax.device_get(state.params))


def test_tp_sharded_step_matches_replicated(rng):
    """Tensor-parallel param shardings must not change the math: one SGD step
    on a (data=2, model=4) mesh equals the single-device step."""
    from simple3dformer_tpu.parallel.tp import device_put_tp, vit_tp_shardings

    x = (rng.rand(16, 8, 8, 8) > 0.7).astype(np.uint8)
    y = rng.randint(0, 4, size=(16,)).astype(np.int32)
    emb = VoxelEmbed(voxel_size=8, cell_size=4, patch_size=2, embed_dim=192)
    model = VoxelViT(voxel_embed=emb, n_classes=4,
                     transformer_backbone="deit_tiny_patch16_224")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 8, 8, 8)))
    idx = rng.randint(0, 16, size=(2, 8)).astype(np.int32)

    p_ref, l_ref = _run(1, variables, x, y, idx)

    mesh = make_mesh(n_data=2, n_model=4)
    rules = ShardingRules(mesh)
    ds = DeviceResidentDataset({"x": x, "y": y}, mesh=mesh)
    tx = make_optimizer("SGD")
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    state = device_put_tp(create_train_state(params, tx), "params", mesh)
    # sanity: qkv kernels actually sharded over the model axis
    shardings = vit_tp_shardings(params, mesh)
    qkv = shardings["core"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.spec)
    run = make_scanned_train_steps(model, tx, ds, rules=None)
    state, metrics = run(state, rules.put_scan_idx(idx), 1e-2, jax.random.key(7))

    np.testing.assert_allclose(
        np.asarray(jax.device_get(metrics["loss"])), l_ref, rtol=1e-4, atol=1e-5
    )
    p_tp = jax.device_get(state.params)

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )

    jax.tree_util.tree_map_with_path(check, p_ref, p_tp)

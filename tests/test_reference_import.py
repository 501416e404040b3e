"""theirs->ours checkpoint importers (utils/torch_convert reference_*).

VERDICT r4 #2: a reference-trained `epoch_best.pth` / `best_model.pth`
(Feature3D_ViT2D_V2, Hengshuang Cls/Seg, 3DViT family, ViP-3D — saved at
/root/reference/train_cls_voxel.py:333, train_partseg.py:224-237) must load
into this framework. Two evidence classes per family:

  * round-trip: our init -> refbridge exporter (the ours->theirs maps whose
    correctness is pinned by the forward-parity tests) -> importer ->
    BITWISE identity with the original tree, with full leaf coverage
    asserted (import_reference_state require_full).
  * train-theirs-then-import: the reference's own class (loaded from our
    exported init) trains a few real torch SGD steps, its state_dict is
    saved/loaded through load_reference_checkpoint in the reference's own
    on-disk schemes (DDP module.-prefixed bare dict / hydra
    model_state_dict wrapper), imported, and our forward must match the
    trained torch model's eval forward — weights AND BN running stats.

refbridge is imported read-only from scripts/ (test-side oracle machinery,
the repo's parity convention); the importers under test live in the
package (simple3dformer_tpu/utils/torch_convert.py).
"""

import importlib.util
import pathlib

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.hengshuang import PointTransformerSeg as HengSeg
from simple3dformer_tpu.models.point_vit import PointViT
from simple3dformer_tpu.models.vip3d import VisionPermutator3D
from simple3dformer_tpu.models.voxel_vit import VoxelViT
from simple3dformer_tpu.nn import vit as vit_mod
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed, VoxelEmbedNoAverage
from simple3dformer_tpu.utils import torch_convert as tc

_SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, _SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


refbridge = _load("refbridge")

V, CELL, P = 16, 4, 4
N_PT, NNB, TDIM = 64, 8, 64


def _np_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _save_and_load(tmp_path, sd, scheme):
    """Write the state dict in one of the reference's on-disk schemes and
    read it back through load_reference_checkpoint."""
    path = str(tmp_path / f"ckpt_{scheme}.pth")
    if scheme == "ddp":
        # train_cls_voxel.py:333 saves model.state_dict() of the DDP wrapper
        torch.save({f"module.{k}": v for k, v in sd.items()}, path)
    else:
        # train_partseg.py:224-237 scheme
        torch.save({"epoch": 3, "test_acc": 0.5, "model_state_dict": sd,
                    "optimizer_state_dict": {}}, path)
    out, meta = tc.load_reference_checkpoint(path)
    if scheme == "hydra":
        assert meta["epoch"] == 3 and meta["test_acc"] == 0.5
    return out


def _assert_bitwise(merged, original):
    def check(path, a, b):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            f"round-trip mismatch at {jax.tree_util.keystr(path)}")

    jax.tree_util.tree_map_with_path(check, merged, original)


def _torch_sgd_steps(model, make_loss, n_steps=3, lr=1e-2, seed=0):
    rng = np.random.RandomState(seed)
    opt = torch.optim.SGD(model.parameters(), lr=lr)
    model.train()
    for _ in range(n_steps):
        loss = make_loss(model, rng)
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()


# ---------------------------------------------------------------------------
# VoxelViT (Feature3D_ViT2D_V2) — default and group_embed routes
# ---------------------------------------------------------------------------


def _voxelvit_pair(route, rng, n_classes=7):
    ref_vit = refbridge.load_reference_module("models.vit_3d_2d_pretrain")
    ref_emb = refbridge.load_reference_module("models.embed_layer_3d_modality")
    D = vit_mod.BACKBONES["deit_tiny_patch16_224"]["embed_dim"]
    if route == "group_embed":
        emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=CELL, patch_size=P,
                                  embed_dim=D)
        model = VoxelViT(voxel_embed=emb, n_classes=n_classes,
                         transformer_backbone="deit_tiny_patch16_224",
                         pos_embedding="group_embed",
                         group_axes="reference_bug", group_pack=1)
        r_emb = ref_emb.VoxelEmbed_no_average(
            voxel_size=V, cell_size=CELL, patch_size=P, embed_dim=D)
    else:
        emb = VoxelEmbed(voxel_size=V, cell_size=CELL, patch_size=P,
                         embed_dim=D)
        model = VoxelViT(voxel_embed=emb, n_classes=n_classes,
                         transformer_backbone="deit_tiny_patch16_224",
                         pos_embedding="default")
        r_emb = ref_emb.VoxelEmbed(voxel_size=V, cell_size=CELL,
                                   patch_size=P, embed_dim=D)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(0), jnp.zeros((2, V, V, V)), jnp.zeros((1, 224, 224, 3)))
    torch.manual_seed(0)
    ref = ref_vit.Feature3D_ViT2D_V2(
        n_classes=n_classes, embed_layer=r_emb,
        transformer_backbone="deit_tiny_patch16_224", pretrained=False,
        pos_embedding=route)
    missing, unexpected = ref.load_state_dict(
        refbridge.export_voxelvit_state_dict(_np_tree(variables["params"]),
                                             cell_size=CELL), strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    return model, variables, ref


@pytest.mark.parametrize("route", ["default", "group_embed"])
def test_voxelvit_import_roundtrip_and_trained(route, rng, tmp_path):
    model, variables, ref = _voxelvit_pair(route, rng)

    # round-trip: export(init) -> import == init, every leaf covered
    sd0 = {k: v for k, v in refbridge.export_voxelvit_state_dict(
        _np_tree(variables["params"]), cell_size=CELL).items()}
    sd0 = _save_and_load(tmp_path, sd0, "ddp")
    merged = tc.import_reference_state(
        variables["params"], tc.reference_voxelvit_to_jax_tree(sd0))
    _assert_bitwise(merged, variables["params"])

    # train the reference 3 real steps, import, forward parity
    def make_loss(m, r):
        x = torch.from_numpy((r.rand(4, 1, V, V, V) > 0.7).astype(np.float32))
        y = torch.from_numpy(r.randint(0, 7, size=(4,)).astype(np.int64))
        return F.cross_entropy(m(x), y)

    _torch_sgd_steps(ref, make_loss)
    sd = _save_and_load(tmp_path, ref.state_dict(), "hydra")
    merged = tc.import_reference_state(
        variables["params"], tc.reference_voxelvit_to_jax_tree(sd))
    x = (rng.rand(2, V, V, V) > 0.7).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x[:, None])).numpy()
    got = np.asarray(model.apply({"params": merged}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Hengshuang seg (superset of cls: backbone + decoder + both MlpHeads)
# ---------------------------------------------------------------------------


def test_hengshuang_import_roundtrip_and_trained(rng, tmp_path):
    nblocks = 2
    model = HengSeg(num_point=N_PT, num_class=6, input_dim=6,
                    nblocks=nblocks, nneighbor=NNB, transformer_dim=TDIM)
    x0 = rng.randn(2, N_PT, 6).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x0))

    ref_mod = refbridge.load_reference_module("models.Hengshuang.model")
    cfg = refbridge.make_point_cfg(N_PT, 6, 6, nblocks=nblocks,
                                   nneighbor=NNB, transformer_dim=TDIM)
    torch.manual_seed(0)
    ref = ref_mod.PointTransformerSeg(cfg)
    missing, unexpected = ref.load_state_dict(
        refbridge.export_hengshuang_state_dict(
            _np_tree(variables["params"]), nblocks,
            variables.get("batch_stats"), seg=True), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    # round-trip (params AND batch_stats)
    sd0 = _save_and_load(tmp_path, ref.state_dict(), "ddp")
    p_tree, s_tree = tc.reference_hengshuang_to_jax_tree(sd0)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    merged_s = tc.import_reference_state(variables["batch_stats"], s_tree)
    _assert_bitwise(merged_p, variables["params"])
    _assert_bitwise(merged_s, variables["batch_stats"])

    # torch-train (updates BN running stats too), import, forward parity
    def make_loss(m, r):
        x = torch.from_numpy(r.randn(2, N_PT, 6).astype(np.float32))
        y = torch.from_numpy(r.randint(0, 6, size=(2, N_PT)).astype(np.int64))
        with refbridge.pinned_fps_start():
            out = m(x)
        return F.cross_entropy(out.reshape(-1, 6), y.reshape(-1))

    _torch_sgd_steps(ref, make_loss)
    sd = _save_and_load(tmp_path, ref.state_dict(), "hydra")
    p_tree, s_tree = tc.reference_hengshuang_to_jax_tree(sd)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    merged_s = tc.import_reference_state(variables["batch_stats"], s_tree)
    with refbridge.pinned_fps_start(), torch.no_grad():
        want = ref(torch.from_numpy(x0)).numpy()
    got = np.asarray(model.apply(
        {"params": merged_p, "batch_stats": merged_s}, jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * max(1.0, np.abs(want).max()))


# ---------------------------------------------------------------------------
# 3DViT family: plain cls (dead-2D-pathway mapping) + 1_layer seg (images)
# ---------------------------------------------------------------------------


def test_pointvit_plain_cls_import_roundtrip_and_trained(rng, tmp_path):
    model = PointViT(variant="3DViT", task="cls", num_point=N_PT,
                     num_class=5, input_dim=3, nneighbor=NNB,
                     transformer_backbone="deit_tiny_patch16_224")
    x0 = rng.randn(2, N_PT, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x0))

    ref_mod = refbridge.load_reference_module("models.3DViT.model")
    cfg = refbridge.make_point_cfg(
        N_PT, 5, 3, nblocks=4, nneighbor=NNB,
        transformer_backbone="deit_tiny_patch16_224", pretrained=False,
        head="Linear")
    torch.manual_seed(0)
    ref = ref_mod.PointTransformerCls(cfg)
    missing, unexpected = ref.load_state_dict(
        refbridge.export_pointvit_state_dict(
            _np_tree(variables["params"]), 3, variables.get("batch_stats")),
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    sd0 = _save_and_load(tmp_path, ref.state_dict(), "hydra")
    p_tree, s_tree = tc.reference_pointvit_to_jax_tree(sd0)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    merged_s = tc.import_reference_state(variables["batch_stats"], s_tree)
    _assert_bitwise(merged_p, variables["params"])
    _assert_bitwise(merged_s, variables["batch_stats"])

    def make_loss(m, r):
        x = torch.from_numpy(r.randn(2, N_PT, 3).astype(np.float32))
        y = torch.from_numpy(r.randint(0, 5, size=(2,)).astype(np.int64))
        with refbridge.pinned_fps_start():
            return F.cross_entropy(m(x), y)

    _torch_sgd_steps(ref, make_loss)
    sd = _save_and_load(tmp_path, ref.state_dict(), "ddp")
    p_tree, s_tree = tc.reference_pointvit_to_jax_tree(sd)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    merged_s = tc.import_reference_state(variables["batch_stats"], s_tree)
    with refbridge.pinned_fps_start(), torch.no_grad():
        want = ref(torch.from_numpy(x0)).numpy()
    got = np.asarray(model.apply(
        {"params": merged_p, "batch_stats": merged_s}, jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=5e-4 * max(1.0, np.abs(want).max()))


def test_pointvit_1layer_seg_import_trained_with_images(rng, tmp_path):
    model = PointViT(variant="3DViT_1_layer", task="seg", num_point=N_PT,
                     num_class=50, input_dim=22, nneighbor=NNB,
                     transformer_backbone="deit_tiny_patch16_224")
    x0 = rng.randn(2, N_PT, 22).astype(np.float32)
    img0 = (rng.randn(1, 224, 224, 3) * 0.5).astype(np.float32)
    variables = model.init(jax.random.key(1), jnp.asarray(x0),
                           jnp.asarray(img0), method=model.init_all)

    ref_mod = refbridge.load_reference_module("models.3DViT_1_layer.model")
    cfg = refbridge.make_point_cfg(
        N_PT, 50, 22, nblocks=4, nneighbor=NNB,
        transformer_backbone="deit_tiny_patch16_224", pretrained=False,
        head="Linear")
    torch.manual_seed(0)
    ref = ref_mod.PointTransformerSeg(cfg)
    missing, unexpected = ref.load_state_dict(
        refbridge.export_pointvit_state_dict(
            _np_tree(variables["params"]), 22, variables.get("batch_stats")),
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    sd0 = _save_and_load(tmp_path, ref.state_dict(), "ddp")
    p_tree, s_tree = tc.reference_pointvit_to_jax_tree(sd0)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    _assert_bitwise(merged_p, variables["params"])
    _assert_bitwise(tc.import_reference_state(variables["batch_stats"],
                                              s_tree),
                    variables["batch_stats"])

    def make_loss(m, r):
        x = torch.from_numpy(r.randn(2, N_PT, 22).astype(np.float32))
        y = torch.from_numpy(
            r.randint(0, 50, size=(2, N_PT)).astype(np.int64))
        with refbridge.pinned_fps_start():
            out = m(x)
        return F.cross_entropy(out.reshape(-1, 50), y.reshape(-1))

    _torch_sgd_steps(ref, make_loss)
    sd = _save_and_load(tmp_path, ref.state_dict(), "hydra")
    p_tree, s_tree = tc.reference_pointvit_to_jax_tree(sd)
    merged_p = tc.import_reference_state(variables["params"], p_tree)
    merged_s = tc.import_reference_state(variables["batch_stats"], s_tree)
    vs = {"params": merged_p, "batch_stats": merged_s}
    with refbridge.pinned_fps_start(), torch.no_grad():
        want = ref(torch.from_numpy(x0)).numpy()
    got = np.asarray(model.apply(vs, jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=5e-4 * max(1.0, np.abs(want).max()))
    # the LwF image pathway survives the import too
    with torch.no_grad():
        want_img = ref.forward_images(
            torch.from_numpy(img0.transpose(0, 3, 1, 2))).numpy()
    got_img = np.asarray(model.apply(vs, jnp.asarray(img0),
                                     method=model.forward_images))
    np.testing.assert_allclose(got_img, want_img, rtol=1e-3,
                               atol=5e-4 * max(1.0, np.abs(want_img).max()))


# ---------------------------------------------------------------------------
# ViP-3D (train_pure_mlp checkpoints), with and without PEG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("peg", [False, True])
def test_vip3d_import_roundtrip_and_trained(rng, tmp_path, peg):
    layers, trans = [2, 2], [True, False]
    seg_dim, mlpr, dims = [8, 4], [3, 3], [64, 128]
    v, cell = 16, 2
    model = VisionPermutator3D(
        embed_layer=VoxelEmbedNoAverage(voxel_size=v, cell_size=cell,
                                        patch_size=8, embed_dim=dims[0]),
        layers=layers, embed_dims=dims, transitions=trans,
        segment_dim=seg_dim, mlp_ratios=mlpr, num_classes=9,
        pos_embedding="PEG" if peg else None)
    x0 = (rng.rand(2, v, v, v) > 0.7).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x0))

    ref_vip = refbridge.load_reference_module("models.vip_3d")
    ref_emb = refbridge.load_reference_module("models.embed_layer_3d_modality")
    torch.manual_seed(0)
    ref = ref_vip.VisionPermutator3D(
        layers, embed_dims=dims, patch_size=cell, transitions=trans,
        segment_dim=seg_dim, mlp_ratios=mlpr,
        mlp_fn=ref_vip.WeightedPermuteMLP,
        embed_layer=ref_emb.VoxelEmbed_no_average(
            voxel_size=v, cell_size=cell, patch_size=8, in_chans=1,
            embed_dim=dims[0]),
        pos_embedding="PEG" if peg else None, num_classes=9)
    missing, unexpected = ref.load_state_dict(
        refbridge.export_vip3d_state_dict(
            _np_tree(variables["params"]), layers, trans, dims, cell,
            peg=peg), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    sd0 = _save_and_load(tmp_path, ref.state_dict(), "ddp")
    merged = tc.import_reference_state(
        variables["params"],
        tc.reference_vip3d_to_jax_tree(sd0, variables["params"]))
    _assert_bitwise(merged, variables["params"])

    def make_loss(m, r):
        x = torch.from_numpy((r.rand(2, 1, v, v, v) > 0.7).astype(np.float32))
        y = torch.from_numpy(r.randint(0, 9, size=(2,)).astype(np.int64))
        return F.cross_entropy(m(x), y)

    _torch_sgd_steps(ref, make_loss)
    sd = _save_and_load(tmp_path, ref.state_dict(), "hydra")
    merged = tc.import_reference_state(
        variables["params"],
        tc.reference_vip3d_to_jax_tree(sd, variables["params"]))
    with torch.no_grad():
        want = ref(torch.from_numpy(x0[:, None])).numpy()
    got = np.asarray(model.apply({"params": merged}, jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

"""Accuracy parity vs the REFERENCE'S OWN model code (torch, CPU).

The north star (BASELINE.json) is "ModelNet40 voxel OA / ShapeNetPart
instance mIoU within 0.3 pts of the reference". The real corpora cannot
exist in this environment, but the *frameworks* can still be compared on
the metric itself: train the reference's actual model classes (imported
read-only from /root/reference via scripts/refbridge) and our production
training loop side by side on identical synthetic corpora, with the
reference's training semantics (Adam + StepLR + per-epoch warmup dampening,
CE, best-epoch accuracy bookkeeping — /root/reference/train_cls_voxel.py:
195-198,234-333), and compare the converged test accuracies.

Voxel track (strongest form — identical initial weights):
  * our flax VoxelViT init is exported onto the reference
    Feature3D_ViT2D_V2's state dict (refbridge.export_voxelvit_state_dict;
    bit-exact weight correspondence is pinned by
    tests/test_reference_parity.py forward-parity bounds);
  * both sides then see identical batch index order and identical per-epoch
    learning rates; the only remaining differences are framework-internal
    (XLA vs eager kernels, tanh- vs erf-GELU, reduction orders).

Partseg track (--track partseg): the north star's SECOND metric — ShapeNetPart
instance mIoU — against the reference's own 3DViT_1_layer PointTransformerSeg,
with the full train_partseg.py recipe on both sides (category one-hot concat,
LR decay + BN-momentum schedules, category-restricted argmax bookkeeping) on a
synthetic task lifted into the real 50-part label space
(synthetic_tasks.make_partseg_parts).

Point track (Hengshuang cls, --track point): also identical initial weights
(refbridge.export_hengshuang_state_dict, 1:1 correspondence pinned in
tests/test_reference_parity.py) and identical batch order, with the
reference's train_cls.py:82-125 semantics (Adam + StepLR(50, 0.3), CE,
instance-accuracy eval). Trajectories diverge by design — the reference's
FPS start is torch.randint per forward (pointnet_util.py:65) while the
production scanned step runs FPS from index 0, and BN running stats use
torch's unbiased vs flax's biased variance — so the statement is the
converged-accuracy one, from a shared init.

Run:  python scripts/accuracy_parity.py [--track voxel|point] [--epochs 15]
CPU-only; ~10-15 min per full-depth voxel run. Results recorded in
BASELINE.md ("Accuracy parity" section); scaled-down versions run in
tests/test_reference_parity.py.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import refbridge  # noqa: E402
import synthetic_tasks  # noqa: E402

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.voxel_vit import VoxelViT  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import (  # noqa: E402
    VoxelEmbed,
    VoxelEmbedNoAverage,
)
from simple3dformer_tpu.train.loop import (  # noqa: E402
    create_train_state,
    make_scanned_eval,
    make_scanned_train_steps,
)
from simple3dformer_tpu.train.optim import epoch_lr, make_optimizer  # noqa: E402

V = synthetic_tasks.V


def _jax_accuracy(logits, ys):
    pred = np.asarray(logits).reshape(-1, logits.shape[-1]).argmax(-1)
    return float((pred == np.asarray(ys).reshape(-1)).mean())


def run_voxel(epochs=15, batch=32, lr=1e-3, n_train=2048, n_test=2048,
              seed=0, backbone="deit_tiny_patch16_224", noise=0.06,
              lr_step=20, lr_gamma=0.5, warmup=False, route="default",
              group_axes="pillar", side="both"):
    """``warmup``: the reference's UntunedLinearWarmup dampens PER EPOCH with
    period int(2/(1-0.999)) = 1999 (train_cls_voxel.py:198,294) — i.e. a
    ~2000-epoch linear ramp; at harness epoch counts the lr never leaves the
    noise floor. Default False uses the reference's other training recipe
    (plain Adam + StepLR, train_cls.py:82-93) on BOTH sides; pass True for
    the literal flagship schedule (both sides still see identical lrs).

    ``route``: "default" (flagship VoxelEmbed recipe) or "group_embed" (the
    ShapeNetV2 two-stage route, VoxelEmbed_no_average tokenizer — the last
    BASELINE config without a converged anchor, VERDICT r4 #1). The stage-1
    encoder weights export 1:1 (refbridge.export_voxelvit_state_dict).

    ``group_axes`` (group_embed route only): "pillar" runs OUR as-shipped
    stage-1 (per-pillar attention — the deliberate bug-fix deviation,
    models/voxel_vit.py docstring), so the gap vs reference code INCLUDES
    the deviation's accuracy effect; "reference_bug" replicates the
    reference's batch-mixing attention axes exactly (forward-parity-pinned
    in tests/test_reference_parity.py), isolating framework-internal
    differences. Running both quantifies what the bug-fix does to converged
    OA. NOTE: in bug mode attention mixes across the batch, so BOTH sides
    eval with the same batch size (eb) — predictions are batch-composition-
    dependent by the bug's nature.

    ``side``: jax|torch|both — both loops are seed-deterministic, so a
    single-side run reproduces exactly its half of a both run (resume an
    interrupted record, as in run_partseg_lwf).

    Flagship semantics: identical init, identical batches, both frameworks.
    Returns dict with per-epoch OA curves and best OA for both sides.
    """
    ref_vit = refbridge.load_reference_module("models.vit_3d_2d_pretrain")
    ref_emb = refbridge.load_reference_module("models.embed_layer_3d_modality")

    rng = np.random.RandomState(seed)
    xs, ys = synthetic_tasks.make_hard_shape_voxels(n_train, rng, noise=noise)
    xt, yt = synthetic_tasks.make_hard_shape_voxels(n_test, rng, noise=noise)
    n_classes = 8

    # ---- our side: init ----
    from simple3dformer_tpu.nn.vit import BACKBONES

    cfg = BACKBONES[backbone]
    D = cfg["embed_dim"]
    if route == "group_embed":
        emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=4, patch_size=4,
                                  embed_dim=D)
        model = VoxelViT(
            voxel_embed=emb, n_classes=n_classes,
            transformer_backbone=backbone, pos_embedding="group_embed",
            group_axes=group_axes,
            group_pack=1 if group_axes == "reference_bug" else 0)
    else:
        emb = VoxelEmbed(voxel_size=V, cell_size=4, patch_size=4, embed_dim=D)
        model = VoxelViT(voxel_embed=emb, n_classes=n_classes,
                         transformer_backbone=backbone,
                         pos_embedding="default")
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(seed), jnp.zeros((2, V, V, V)),
      jnp.zeros((1, 224, 224, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    # ---- reference side: same weights ----
    torch.manual_seed(seed)
    r_emb_cls = (ref_emb.VoxelEmbed_no_average if route == "group_embed"
                 else ref_emb.VoxelEmbed)
    r_emb = r_emb_cls(voxel_size=V, cell_size=4, patch_size=4, embed_dim=D)
    ref_model = ref_vit.Feature3D_ViT2D_V2(
        n_classes=n_classes, embed_layer=r_emb, transformer_backbone=backbone,
        pretrained=False,
        pos_embedding="group_embed" if route == "group_embed" else "default")
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_voxelvit_state_dict(params_np, cell_size=4),
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    # shared batch order
    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [epoch_lr(lr, e, lr_step, lr_gamma, warmup=warmup)
           for e in range(epochs)]
    eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)

    # ---- jax production loop ----
    jax_oa, t0 = [], time.time()
    if side != "torch":
        tx = make_optimizer("Adam")
        state = create_train_state(variables["params"], tx)
        ds = DeviceResidentDataset({"x": jnp.asarray(xs, jnp.float32),
                                    "y": jnp.asarray(ys)})
        run = make_scanned_train_steps(model, tx, ds)
        test_ds = DeviceResidentDataset({"x": jnp.asarray(xt, jnp.float32),
                                         "y": jnp.asarray(yt)})
        evaluate = make_scanned_eval(model, test_ds)
        eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    for e in range(epochs if side != "torch" else 0):
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        logits = evaluate(state, eval_idx)
        jax_oa.append(_jax_accuracy(logits, yt))
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} OA {jax_oa[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- reference loop (train_cls_voxel.py:234-333 semantics) ----
    ref_oa = []
    if side != "jax":
        opt = torch.optim.Adam(ref_model.parameters(), lr=lrs[0],
                               betas=(0.9, 0.999), eps=1e-8)
        tx_all = torch.from_numpy(xs[:, None].astype(np.float32))
        ty_all = torch.from_numpy(ys.astype(np.int64))
        tt_all = torch.from_numpy(xt[:, None].astype(np.float32))
        for e in range(epochs):
            for g in opt.param_groups:
                g["lr"] = lrs[e]
            ref_model.train()
            for s in range(steps_per_epoch):
                bi = epoch_idx[e][s]
                loss = F.cross_entropy(ref_model(tx_all[bi]), ty_all[bi])
                opt.zero_grad()
                loss.backward()
                opt.step()
            ref_model.eval()
            preds = []
            with torch.no_grad():
                for i in range(0, n_test, eb):
                    preds.append(
                        ref_model(tt_all[i:i + eb]).argmax(-1).numpy())
            ref_oa.append(float((np.concatenate(preds) == yt).mean()))
            print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} OA {ref_oa[-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = dict(jax_oa=np.array(jax_oa), ref_oa=np.array(ref_oa),
               best_jax=max(jax_oa, default=float("nan")),
               best_ref=max(ref_oa, default=float("nan")))
    out["gap_pts"] = abs(out["best_jax"] - out["best_ref"]) * 100.0
    if side == "both":
        print(f"\nbest OA ours {out['best_jax']:.4f} vs reference-code "
              f"{out['best_ref']:.4f}  |gap| = {out['gap_pts']:.2f} pts")
    else:
        print(f"\n[{side} side only] best OA "
              f"{max(list(jax_oa) + list(ref_oa)):.4f}")
    return out


def run_weight_sharing(epochs=24, batch=32, lr=1e-3, n_train=1024,
                       n_test=1024, seed=0, backbone="deit_tiny_patch16_224",
                       noise=0.02, lr_step=10, lr_gamma=0.3, side="both"):
    """weight_sharing route converged accuracy — vs a HAND-WRITTEN torch
    mirror, not the reference's own code: the reference's weight_sharing
    __init__ raises TypeError under its own pinned timm semantics (tuple
    patch_size ** 2, vit_3d_2d_pretrain.py:386-388) and its forward
    hardcodes .cuda() (:502) — pinned in tests/test_reference_parity.py::
    test_reference_weight_sharing_route_is_broken_as_documented as the
    recorded reason reference code can't be the bar here (VERDICT r4 #3).

    The mirror follows the reference's declared semantics (one full block
    stack per z slice, averaged cls, vit_3d_2d_pretrain.py:498-519) with
    the intended p^2+1 voxel_pos_embed, built on the refbridge timm-shim
    VisionTransformer (the same spec-faithful backbone the reference
    classes run on in every other track) and loaded from OUR exported
    init — forward parity is asserted at start of every run. Training
    semantics match the voxel track (plain Adam + StepLR, identical batch
    order/lrs)."""
    import torch.nn as tnn

    refbridge.install_timm_shim()
    import timm.models.vision_transformer as shim_vt

    from simple3dformer_tpu.nn.vit import BACKBONES

    rng = np.random.RandomState(seed)
    xs, ys = synthetic_tasks.make_hard_shape_voxels(n_train, rng, noise=noise)
    xt, yt = synthetic_tasks.make_hard_shape_voxels(n_test, rng, noise=noise)
    n_classes = 8
    cfg = BACKBONES[backbone]
    D, p, cell = cfg["embed_dim"], 4, 4

    emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=cell, patch_size=p,
                              embed_dim=D)
    model = VoxelViT(voxel_embed=emb, n_classes=n_classes,
                     transformer_backbone=backbone,
                     pos_embedding="weight_sharing")
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(seed), jnp.zeros((2, V, V, V)),
      jnp.zeros((1, 224, 224, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    class WeightSharingMirror(tnn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(seed)
            self.vit = shim_vt.VisionTransformer(
                embed_dim=D, depth=cfg["depth"], num_heads=cfg["num_heads"],
                mlp_ratio=cfg["mlp_ratio"], qkv_bias=cfg["qkv_bias"],
                norm_layer=lambda d: tnn.LayerNorm(d, eps=1e-6))
            self.voxel_embed = tnn.Conv3d(1, D, cell, stride=cell)
            self.voxel_pos_embed = tnn.Parameter(
                torch.zeros(1, p * p + 1, D))
            self.voxel_head = tnn.Linear(D, n_classes)

        def forward(self, x):
            x = self.voxel_embed(x)  # [B, D, px, py, pz]
            B, _, px, py, pz = x.shape
            x = x.flatten(2, 3).permute(0, 2, 1, 3)  # [B, (px py), D, pz]
            avg = torch.zeros(B, D)
            for i in range(pz):
                z = x[:, :, :, i]
                cls = self.vit.cls_token.expand(B, -1, -1)
                z = torch.cat((cls, z), dim=1) + self.voxel_pos_embed
                for blk in self.vit.blocks:
                    z = blk(z)
                avg = avg + self.vit.norm(z)[:, 0]
            return self.voxel_head(avg / pz)

    ref_model = WeightSharingMirror()
    missing, unexpected = ref_model.vit.load_state_dict(
        refbridge.export_backbone_state_dict(params_np), strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    with torch.no_grad():
        k = params_np["voxel_embed"]["kernel"]  # [(cell^3), D]
        ref_model.voxel_embed.weight.copy_(torch.from_numpy(
            np.ascontiguousarray(k.T.reshape(D, 1, cell, cell, cell))))
        ref_model.voxel_embed.bias.copy_(
            torch.from_numpy(params_np["voxel_embed"]["bias"]))
        ref_model.voxel_pos_embed.copy_(
            torch.from_numpy(params_np["voxel_pos_embed"]))
        ref_model.voxel_head.weight.copy_(torch.from_numpy(
            np.ascontiguousarray(params_np["voxel_head"]["kernel"].T)))
        ref_model.voxel_head.bias.copy_(
            torch.from_numpy(params_np["voxel_head"]["bias"]))

    # self-validate the mirror: forward parity at init (GELU-band tol)
    ref_model.eval()
    probe = (rng.rand(2, V, V, V) > 0.7).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(probe[:, None])).numpy()
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(probe)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [epoch_lr(lr, e, lr_step, lr_gamma) for e in range(epochs)]
    eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)

    jax_oa, t0 = [], time.time()
    if side != "torch":
        tx = make_optimizer("Adam")
        state = create_train_state(variables["params"], tx)
        ds = DeviceResidentDataset({"x": jnp.asarray(xs, jnp.float32),
                                    "y": jnp.asarray(ys)})
        run = make_scanned_train_steps(model, tx, ds)
        test_ds = DeviceResidentDataset({"x": jnp.asarray(xt, jnp.float32),
                                         "y": jnp.asarray(yt)})
        evaluate = make_scanned_eval(model, test_ds)
        eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    for e in range(epochs if side != "torch" else 0):
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        jax_oa.append(_jax_accuracy(evaluate(state, eval_idx), yt))
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} OA {jax_oa[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    ref_oa = []
    if side != "jax":
        opt = torch.optim.Adam(ref_model.parameters(), lr=lrs[0],
                               betas=(0.9, 0.999), eps=1e-8)
        tx_all = torch.from_numpy(xs[:, None].astype(np.float32))
        ty_all = torch.from_numpy(ys.astype(np.int64))
        tt_all = torch.from_numpy(xt[:, None].astype(np.float32))
        for e in range(epochs):
            for g in opt.param_groups:
                g["lr"] = lrs[e]
            ref_model.train()
            for s in range(steps_per_epoch):
                bi = epoch_idx[e][s]
                loss = F.cross_entropy(ref_model(tx_all[bi]), ty_all[bi])
                opt.zero_grad()
                loss.backward()
                opt.step()
            ref_model.eval()
            preds = []
            with torch.no_grad():
                for i in range(0, n_test, eb):
                    preds.append(
                        ref_model(tt_all[i:i + eb]).argmax(-1).numpy())
            ref_oa.append(float((np.concatenate(preds) == yt).mean()))
            print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} OA {ref_oa[-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = dict(jax_oa=np.array(jax_oa), ref_oa=np.array(ref_oa),
               best_jax=max(jax_oa, default=float("nan")),
               best_ref=max(ref_oa, default=float("nan")))
    out["gap_pts"] = abs(out["best_jax"] - out["best_ref"]) * 100.0
    if side == "both":
        print(f"\nbest OA ours {out['best_jax']:.4f} vs torch-mirror "
              f"{out['best_ref']:.4f}  |gap| = {out['gap_pts']:.2f} pts")
    else:
        print(f"\n[{side} side only] best OA "
              f"{max(list(jax_oa) + list(ref_oa)):.4f}")
    return out


def run_point(epochs=12, batch=32, lr=1e-3, n_train=1536, n_test=1024,
              seed=0, npoint=96, nblocks=2, nneighbor=8, tdim=64,
              n_classes=6, noise=0.04, lr_step=50, lr_gamma=0.3):
    """Hengshuang cls: identical init + batches, reference train_cls.py
    semantics on the torch side (its actual models/Hengshuang code)."""
    from simple3dformer_tpu.models.hengshuang import PointTransformerCls

    ref_mod = refbridge.load_reference_module("models.Hengshuang.model")

    rng = np.random.RandomState(seed)
    xs, ys = synthetic_tasks.make_hard_shape_points(n_train, npoint, rng,
                                                    noise=noise)
    xt, yt = synthetic_tasks.make_hard_shape_points(n_test, npoint, rng,
                                                    noise=noise)

    model = PointTransformerCls(num_point=npoint, num_class=n_classes,
                                input_dim=3, nblocks=nblocks,
                                nneighbor=nneighbor, transformer_dim=tdim)
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((2, npoint, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    cfg = refbridge.make_point_cfg(npoint, n_classes, 3, nblocks=nblocks,
                                   nneighbor=nneighbor, transformer_dim=tdim)
    torch.manual_seed(seed)
    ref_model = ref_mod.PointTransformerCls(cfg)
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_hengshuang_state_dict(
            params_np, nblocks, variables.get("batch_stats")), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [epoch_lr(lr, e, lr_step, lr_gamma) for e in range(epochs)]

    # ---- jax production loop ----
    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"))
    ds = DeviceResidentDataset({"x": jnp.asarray(xs, jnp.float32),
                                "y": jnp.asarray(ys)})
    run = make_scanned_train_steps(model, tx, ds, has_batch_stats=True)
    test_ds = DeviceResidentDataset({"x": jnp.asarray(xt, jnp.float32),
                                     "y": jnp.asarray(yt)})
    evaluate = make_scanned_eval(model, test_ds, has_batch_stats=True)
    eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)
    eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    jax_oa, t0 = [], time.time()
    for e in range(epochs):
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        jax_oa.append(_jax_accuracy(evaluate(state, eval_idx), yt))
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} OA {jax_oa[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- reference loop (train_cls.py:103-157 semantics) ----
    opt = torch.optim.Adam(ref_model.parameters(), lr=lrs[0],
                           betas=(0.9, 0.999), eps=1e-8)
    tx_all = torch.from_numpy(xs.astype(np.float32))
    ty_all = torch.from_numpy(ys.astype(np.int64))
    tt_all = torch.from_numpy(xt.astype(np.float32))
    ref_oa = []
    for e in range(epochs):
        for g in opt.param_groups:
            g["lr"] = lrs[e]
        ref_model.train()
        for s in range(steps_per_epoch):
            bi = epoch_idx[e][s]
            loss = F.cross_entropy(ref_model(tx_all[bi]), ty_all[bi])
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref_model.eval()
        preds = []
        with torch.no_grad():
            for i in range(0, n_test, 64):
                preds.append(ref_model(tt_all[i:i + 64]).argmax(-1).numpy())
        ref_oa.append(float((np.concatenate(preds) == yt).mean()))
        print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} OA {ref_oa[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    out = dict(jax_oa=np.array(jax_oa), ref_oa=np.array(ref_oa),
               best_jax=max(jax_oa), best_ref=max(ref_oa),
               gap_pts=abs(max(jax_oa) - max(ref_oa)) * 100.0)
    print(f"\nbest OA ours {out['best_jax']:.4f} vs reference-code "
          f"{out['best_ref']:.4f}  |gap| = {out['gap_pts']:.2f} pts")
    return out


def run_partseg(epochs=10, batch=32, lr=1e-3, n_train=1024, n_test=512,
                seed=0, npoint=128, nneighbor=8,
                backbone="deit_tiny_patch16_224", lr_step=4, lr_gamma=0.5,
                noise=0.0):
    """ShapeNetPart semantics vs the reference's OWN 3DViT_1_layer
    PointTransformerSeg (train_partseg.py:86-152): identical init (refbridge
    exporter, correspondence pinned in tests/test_reference_parity.py) and
    batch order; per-point CE over the 16-way category one-hot concat
    (to_categorical, :41,147); the reference's LR decay
    max(lr*gamma^(e//step), 1e-5) and BN-momentum schedule
    max(0.9*0.5^(e//step), 0.01) applied on BOTH sides (:121-130); converged
    best INSTANCE mIoU compared — the north star's second metric — with the
    category-restricted-argmax / absent-part-counts-1.0 bookkeeping
    (oracle-tested PartSegMeter) applied to both sides' logits.

    Trajectories diverge by design (torch.randint FPS start vs scanned FPS
    from index 0; unbiased vs biased BN variance), hence converged-accuracy
    comparison, as in the point track.

    Deliberate deviations from the literal train_partseg.py recipe, applied
    IDENTICALLY on both sides so the parity statement is unaffected (ADVICE
    round-3): no per-batch random scale/shift augmentation
    (train_partseg.py:141-144 — the synthetic parts task needs none and
    shared augmentation would just add matched noise), and plain Adam without
    the config's weight_decay=1e-4 (config/partseg.yaml) — matching the
    point/voxel tracks' plain-Adam convention."""
    from simple3dformer_tpu.cli.train_partseg import make_prepare_fn
    from simple3dformer_tpu.models.point_vit import PointViT
    from simple3dformer_tpu.train.eval_metrics import PartSegMeter
    from simple3dformer_tpu.train.loop import seg_cross_entropy

    ref_mod = refbridge.load_reference_module("models.3DViT_1_layer.model")
    rng = np.random.RandomState(seed)
    # noise = label_noise (plane-boundary jitter): 0.0 reproduces the
    # recorded round-4 task exactly; nonzero de-saturates the mIoU ceiling
    # (VERDICT r4 weak #2), see synthetic_tasks.make_catplane_seg.
    xs, cs, ss = synthetic_tasks.make_partseg_parts(n_train, npoint, rng,
                                                    label_noise=noise)
    xt, ct, st_ = synthetic_tasks.make_partseg_parts(n_test, npoint, rng,
                                                     label_noise=noise)
    input_dim = 3 + 16

    def build_model(torch_mom):
        return PointViT(variant="3DViT_1_layer", task="seg",
                        num_point=npoint, num_class=50, input_dim=input_dim,
                        nneighbor=nneighbor, transformer_backbone=backbone,
                        bn_momentum=1.0 - torch_mom)

    model = build_model(0.9)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(seed), jnp.zeros((2, npoint, input_dim)),
      jnp.zeros((1, 224, 224, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    cfg = refbridge.make_point_cfg(npoint, 50, input_dim, nblocks=4,
                                   nneighbor=nneighbor,
                                   transformer_backbone=backbone,
                                   pretrained=False, head="Linear")
    torch.manual_seed(seed)
    ref_model = ref_mod.PointTransformerSeg(cfg)
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_pointvit_state_dict(
            params_np, input_dim, variables.get("batch_stats")),
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [max(lr * (lr_gamma ** (e // lr_step)), 1e-5)
           for e in range(epochs)]
    moms = [max(0.9 * (0.5 ** (e // lr_step)), 0.01) for e in range(epochs)]

    # ---- jax production loop (cli/train_partseg.py structure) ----
    tx = make_optimizer("Adam")
    prepare = make_prepare_fn()
    ds = DeviceResidentDataset({"x": xs, "cls": cs, "y": ss})
    test_ds = DeviceResidentDataset({"x": xt, "cls": ct, "y": st_})
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"))
    # largest eval batch <= 64 that divides n_test (the scanned eval needs
    # equal-length rows; a hardcoded 64 raised for indivisible n_test)
    eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)
    eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    jax_iou, cur, t0 = [], None, time.time()
    for e in range(epochs):
        if moms[e] != cur:
            cur = moms[e]
            model = build_model(cur)
            run = make_scanned_train_steps(
                model, tx, ds, None, loss_fn=seg_cross_entropy,
                has_batch_stats=True, prepare_fn=prepare)
            evaluate = make_scanned_eval(model, test_ds, None,
                                         has_batch_stats=True,
                                         prepare_fn=prepare)
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        logits = np.asarray(evaluate(state, eval_idx)).reshape(-1, npoint, 50)
        meter = PartSegMeter()
        meter.update(logits, st_)
        jax_iou.append(meter.instance_avg_iou)
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} bn_mom {moms[e]:.3f} "
              f"inst mIoU {jax_iou[-1]:.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    # ---- reference loop (train_partseg.py:121-152 semantics) ----
    def cat_onehot(labels):
        return np.eye(16, dtype=np.float32)[labels]

    x_tr = np.concatenate(
        [xs, np.repeat(cat_onehot(cs)[:, None], npoint, 1)], -1)
    x_te = np.concatenate(
        [xt, np.repeat(cat_onehot(ct)[:, None], npoint, 1)], -1)
    tx_all = torch.from_numpy(x_tr)
    ty_all = torch.from_numpy(ss.astype(np.int64))
    tt_all = torch.from_numpy(x_te)
    opt = torch.optim.Adam(ref_model.parameters(), lr=lrs[0],
                           betas=(0.9, 0.999), eps=1e-8)
    ref_iou = []
    for e in range(epochs):
        for g in opt.param_groups:
            g["lr"] = lrs[e]
        for m in ref_model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.momentum = moms[e]
        ref_model.train()
        for s in range(steps_per_epoch):
            bi = epoch_idx[e][s]
            out = ref_model(tx_all[bi])
            loss = F.cross_entropy(out.reshape(-1, 50), ty_all[bi].reshape(-1))
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref_model.eval()
        meter = PartSegMeter()
        with torch.no_grad():
            for i in range(0, n_test, 64):
                meter.update(ref_model(tt_all[i:i + 64]).numpy(),
                             st_[i:i + 64])
        ref_iou.append(meter.instance_avg_iou)
        print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} bn_mom {moms[e]:.3f} "
              f"inst mIoU {ref_iou[-1]:.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    out = dict(jax_iou=np.array(jax_iou), ref_iou=np.array(ref_iou),
               best_jax=max(jax_iou), best_ref=max(ref_iou),
               gap_pts=abs(max(jax_iou) - max(ref_iou)) * 100.0)
    print(f"\nbest instance mIoU ours {out['best_jax']:.4f} vs "
          f"reference-code {out['best_ref']:.4f}  |gap| = "
          f"{out['gap_pts']:.2f} pts")
    return out


def run_partseg_lwf(epochs=10, batch=16, lr=1e-3, n_train=512, n_test=256,
                    seed=0, npoint=128, nneighbor=8, M=16, lam=0.1,
                    backbone="deit_tiny_patch16_224", lr_step=4,
                    lr_gamma=0.5, teacher_factory=None, side="both"):
    """LwF joint objective vs the reference's OWN code end to end: the
    3DViT_1_layer PointTransformerSeg student AND the reference's DeiT
    teacher class (models/DeIT.py factory through the timm shim), both
    initialized from OUR exported weights (export_pointvit_state_dict /
    export_backbone_state_dict), trained under the joint loss of
    /root/reference/train_partseg_lwf.py:208-227:

        CE_seg(points) + lambda * CE(student.forward_images(imgs),
                                     argmax(teacher(imgs)))

    against our production `make_scanned_lwf_train_steps` scan path.
    Identical synthetic parts corpus, identical image pool (uint8 noise at
    224 — no ImageNet on disk; the distillation target is the frozen
    teacher's label on that noise, a well-defined signal either way),
    identical batch orders for BOTH streams, the reference's LR clip and
    BN-momentum schedules on both sides. Converged best instance mIoU
    compared (the LwF run's seg metric, train_partseg_lwf.py:298-303).

    Deliberate deviations, identical on both sides: no RandomResizedCrop /
    flip (the pool is noise; the production crop path is exercised by
    tests/test_lwf and the trajectory harness), no per-epoch re-sampling
    of the image subset (a fixed pool with per-epoch shuffled order
    replaces train_partseg_lwf.py:194-195's fresh Subset), and the
    partseg track's no-augmentation/plain-Adam conventions."""
    from simple3dformer_tpu.cli.train_partseg import make_prepare_fn
    from simple3dformer_tpu.models.point_vit import PointViT
    from simple3dformer_tpu.nn.vit import make_teacher
    from simple3dformer_tpu.train.eval_metrics import PartSegMeter
    from simple3dformer_tpu.train.loop import seg_cross_entropy
    from simple3dformer_tpu.train.lwf import make_scanned_lwf_train_steps

    ref_mod = refbridge.load_reference_module("models.3DViT_1_layer.model")
    deit_mod = refbridge.load_reference_module("models.DeIT")
    rng = np.random.RandomState(seed)
    xs, cs, ss = synthetic_tasks.make_partseg_parts(n_train, npoint, rng)
    xt, ct, st_ = synthetic_tasks.make_partseg_parts(n_test, npoint, rng)
    input_dim = 3 + 16
    steps_per_epoch = n_train // batch
    n_images = steps_per_epoch * M
    imgs_u8 = (rng.rand(n_images, 224, 224, 3) * 255).astype(np.uint8)

    def build_model(torch_mom):
        return PointViT(variant="3DViT_1_layer", task="seg",
                        num_point=npoint, num_class=50, input_dim=input_dim,
                        nneighbor=nneighbor, transformer_backbone=backbone,
                        bn_momentum=1.0 - torch_mom)

    model = build_model(0.9)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(seed), jnp.zeros((2, npoint, input_dim)),
      jnp.zeros((1, 224, 224, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    # frozen teacher: OUR init exported onto the reference's DeiT class
    teacher = make_teacher(backbone)
    t_params = jax.jit(teacher.init)(
        jax.random.key(seed + 2), jnp.zeros((1, 224, 224, 3)))["params"]
    t_params_np = jax.tree_util.tree_map(np.asarray, t_params)

    # ---- reference-side models from identical weights ----
    cfg = refbridge.make_point_cfg(npoint, 50, input_dim, nblocks=4,
                                   nneighbor=nneighbor,
                                   transformer_backbone=backbone,
                                   pretrained=False, head="Linear")
    torch.manual_seed(seed)
    ref_model = ref_mod.PointTransformerSeg(cfg)
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_pointvit_state_dict(
            params_np, input_dim, variables.get("batch_stats")),
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    if teacher_factory is None:
        teacher_factory = {
            "deit_tiny_patch16_224": deit_mod.deit_tiny_patch16_224,
            "deit_small_patch16_224": deit_mod.deit_small_patch16_224,
            "deit_base_patch16_224": deit_mod.deit_base_patch16_224,
        }[backbone]
    ref_teacher = teacher_factory(pretrained=False)
    missing, unexpected = ref_teacher.load_state_dict(
        refbridge.export_backbone_state_dict(t_params_np), strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    ref_teacher.eval()

    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    img_idx = [
        order_rng.permutation(n_images).reshape(steps_per_epoch, M)
        for _ in range(epochs)
    ]
    lrs = [max(lr * (lr_gamma ** (e // lr_step)), 1e-5)
           for e in range(epochs)]
    moms = [max(0.9 * (0.5 ** (e // lr_step)), 0.01) for e in range(epochs)]

    # ---- jax production LwF scan path ----
    # side="jax"/"torch" runs one framework only: every input to either
    # loop (init weights, corpora, batch orders, schedules) is derived
    # deterministically from the seeds above, so single-side runs are
    # bitwise-identical to their half of a side="both" run — used to
    # resume the torch half of an interrupted full-depth record.
    jax_iou, cur, t0 = [], None, time.time()
    if side != "torch":
        tx = make_optimizer("Adam")
        prepare = make_prepare_fn()
        ds = DeviceResidentDataset({"x": xs, "cls": cs, "y": ss})
        image_ds = DeviceResidentDataset({"images": imgs_u8})
        test_ds = DeviceResidentDataset({"x": xt, "cls": ct, "y": st_})
        state = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"))
        eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)
        eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    for e in range(epochs if side != "torch" else 0):
        if moms[e] != cur:
            cur = moms[e]
            model = build_model(cur)
            run = make_scanned_lwf_train_steps(
                model, teacher, t_params, tx, ds, image_ds, None,
                task_loss_fn=seg_cross_entropy, lambda_weight=lam,
                has_batch_stats=True, prepare_fn=prepare)
            evaluate = make_scanned_eval(model, test_ds, None,
                                         has_batch_stats=True,
                                         prepare_fn=prepare)
        state, _ = run(state, jnp.asarray(epoch_idx[e]),
                       jnp.asarray(img_idx[e]), lrs[e], jax.random.key(e))
        logits = np.asarray(evaluate(state, eval_idx)).reshape(-1, npoint, 50)
        meter = PartSegMeter()
        meter.update(logits, st_)
        jax_iou.append(meter.instance_avg_iou)
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} bn_mom {moms[e]:.3f} "
              f"inst mIoU {jax_iou[-1]:.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    # ---- reference joint loop (train_partseg_lwf.py:198-231 semantics) ---
    ref_iou = []
    if side != "jax":
        def cat_onehot(labels):
            return np.eye(16, dtype=np.float32)[labels]

        x_tr = np.concatenate(
            [xs, np.repeat(cat_onehot(cs)[:, None], npoint, 1)], -1)
        x_te = np.concatenate(
            [xt, np.repeat(cat_onehot(ct)[:, None], npoint, 1)], -1)
        tx_all = torch.from_numpy(x_tr)
        ty_all = torch.from_numpy(ss.astype(np.int64))
        tt_all = torch.from_numpy(x_te)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        imgs_n = (imgs_u8.astype(np.float32) / 255.0 - mean) / std
        timg_all = torch.from_numpy(imgs_n.transpose(0, 3, 1, 2).copy())
        opt = torch.optim.Adam(ref_model.parameters(), lr=lrs[0],
                               betas=(0.9, 0.999), eps=1e-8)
        for e in range(epochs):
            for g in opt.param_groups:
                g["lr"] = lrs[e]
            for m in ref_model.modules():
                if isinstance(m,
                              (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.momentum = moms[e]
            ref_model.train()
            for s in range(steps_per_epoch):
                bi = epoch_idx[e][s]
                out = ref_model(tx_all[bi])
                loss = F.cross_entropy(out.reshape(-1, 50),
                                       ty_all[bi].reshape(-1))
                imgs_b = timg_all[img_idx[e][s]]
                img_pred = ref_model.forward_images(imgs_b)
                with torch.no_grad():
                    label_teacher = ref_teacher(imgs_b).data.max(1)[1]
                loss = loss + lam * F.cross_entropy(img_pred, label_teacher)
                opt.zero_grad()
                loss.backward()
                opt.step()
            ref_model.eval()
            meter = PartSegMeter()
            with torch.no_grad():
                for i in range(0, n_test, 64):
                    meter.update(ref_model(tt_all[i:i + 64]).numpy(),
                                 st_[i:i + 64])
            ref_iou.append(meter.instance_avg_iou)
            print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} "
                  f"bn_mom {moms[e]:.3f} "
                  f"inst mIoU {ref_iou[-1]:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    out = dict(jax_iou=np.array(jax_iou), ref_iou=np.array(ref_iou),
               best_jax=max(jax_iou, default=float("nan")),
               best_ref=max(ref_iou, default=float("nan")))
    out["gap_pts"] = abs(out["best_jax"] - out["best_ref"]) * 100.0
    if side == "both":
        print(f"\nbest instance mIoU (LwF joint) ours {out['best_jax']:.4f} "
              f"vs reference-code {out['best_ref']:.4f}  |gap| = "
              f"{out['gap_pts']:.2f} pts")
    else:
        print(f"\n[{side} side only] best instance mIoU "
              f"{max(jax_iou + ref_iou):.4f}")
    return out


def run_scanobjectnn(epochs=16, batch=32, lr=0.01, n_train=1536, n_test=1024,
                     seed=0, npoint=128, nneighbor=16, n_classes=6,
                     backbone="deit_tiny_patch16_224", lr_step=8,
                     lr_gamma=0.3, side="both", noise=0.04):
    """ScanObjectNN cls vs the reference's OWN 3DViT PointTransformerCls
    (the config/cls_scanobjectnn.yaml default model), exercising the SGD
    branch the other tracks don't: torch.optim.SGD(lr=0.01, momentum=0.9) +
    StepLR(50, 0.3) (train_cls_scanobjectnn.py:106-108; step scaled to
    harness epoch counts). Identical init (refbridge.export_pointvit_
    state_dict, correspondence pinned for this exact cls variant in
    tests/test_reference_parity.py) and identical batch order; best
    INSTANCE accuracy + class accuracy bookkeeping (:144-157).

    Deliberate deviations, identical on both sides: no per-batch random
    dropout/scale/shift augmentation (:123-126), 6-class hard-shape
    synthetic clouds instead of the absent real scans (so class accuracy
    averages over 6 populated classes), xyz-only input_dim=3 (:69).

    ``noise``: per-point jitter sigma of the synthetic clouds. The round-4
    record ran the default 0.04 and BOTH sides saturated >=0.998, where a
    real 0.3-pt divergence has no room to show (VERDICT r4 weak #2) —
    pass a higher value so both frameworks plateau in a discriminative
    band (~0.85-0.95), mirroring the voxel track's --noise calibration."""
    from simple3dformer_tpu.models.point_vit import PointViT
    from simple3dformer_tpu.train.eval_metrics import InstanceClassMeter

    ref_mod = refbridge.load_reference_module("models.3DViT.model")
    rng = np.random.RandomState(seed)
    xs, ys = synthetic_tasks.make_hard_shape_points(n_train, npoint, rng,
                                                    noise=noise)
    xt, yt = synthetic_tasks.make_hard_shape_points(n_test, npoint, rng,
                                                    noise=noise)

    model = PointViT(variant="3DViT", task="cls", num_point=npoint,
                     num_class=n_classes, input_dim=3, nneighbor=nneighbor,
                     transformer_backbone=backbone)
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((2, npoint, 3)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    cfg = refbridge.make_point_cfg(npoint, n_classes, 3, nblocks=4,
                                   nneighbor=nneighbor,
                                   transformer_backbone=backbone,
                                   pretrained=False, head="Linear")
    torch.manual_seed(seed)
    ref_model = ref_mod.PointTransformerCls(cfg)
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_pointvit_state_dict(
            params_np, 3, variables.get("batch_stats")), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [lr * (lr_gamma ** (e // lr_step)) for e in range(epochs)]

    # ---- jax production loop (SGD+momentum direction, lr in the step) ----
    # side gating: see run_partseg_lwf — both loops are deterministic in
    # the seeds, so one-sided runs resume an interrupted full-depth record.
    def meter_of(logits):
        m = InstanceClassMeter(n_classes)
        m.update(np.asarray(logits).reshape(-1, n_classes).argmax(-1),
                 np.asarray(yt).reshape(-1))
        return m

    jax_inst, jax_cls, t0 = [], [], time.time()
    if side != "torch":
        tx = make_optimizer("SGD")
        state = create_train_state(variables["params"], tx,
                                   variables.get("batch_stats"))
        ds = DeviceResidentDataset({"x": jnp.asarray(xs, jnp.float32),
                                    "y": jnp.asarray(ys)})
        run = make_scanned_train_steps(model, tx, ds, has_batch_stats=True)
        test_ds = DeviceResidentDataset({"x": jnp.asarray(xt, jnp.float32),
                                         "y": jnp.asarray(yt)})
        evaluate = make_scanned_eval(model, test_ds, has_batch_stats=True)
        eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)
        eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    for e in range(epochs if side != "torch" else 0):
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        m = meter_of(evaluate(state, eval_idx))
        jax_inst.append(m.instance_accuracy)
        jax_cls.append(m.class_accuracy)
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} inst "
              f"{jax_inst[-1]:.4f} cls {jax_cls[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- reference loop (train_cls_scanobjectnn.py:106-157 semantics) ----
    ref_inst, ref_cls = [], []
    if side != "jax":
        opt = torch.optim.SGD(ref_model.parameters(), lr=lrs[0],
                              momentum=0.9)
        tx_all = torch.from_numpy(xs.astype(np.float32))
        ty_all = torch.from_numpy(ys.astype(np.int64))
        tt_all = torch.from_numpy(xt.astype(np.float32))
        for e in range(epochs):
            for g in opt.param_groups:
                g["lr"] = lrs[e]
            ref_model.train()
            for s in range(steps_per_epoch):
                bi = epoch_idx[e][s]
                loss = F.cross_entropy(ref_model(tx_all[bi]), ty_all[bi])
                opt.zero_grad()
                loss.backward()
                opt.step()
            ref_model.eval()
            preds = []
            with torch.no_grad():
                for i in range(0, n_test, 64):
                    preds.append(ref_model(tt_all[i:i + 64]).numpy())
            m = meter_of(np.concatenate(preds))
            ref_inst.append(m.instance_accuracy)
            ref_cls.append(m.class_accuracy)
            print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} inst "
                  f"{ref_inst[-1]:.4f} cls {ref_cls[-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = dict(best_jax=max(jax_inst, default=float("nan")),
               best_ref=max(ref_inst, default=float("nan")),
               best_jax_cls=max(jax_cls, default=float("nan")),
               best_ref_cls=max(ref_cls, default=float("nan")),
               jax_inst=np.array(jax_inst), ref_inst=np.array(ref_inst))
    out["gap_pts"] = abs(out["best_jax"] - out["best_ref"]) * 100.0
    if side == "both":
        print(f"\nbest instance acc ours {out['best_jax']:.4f} vs "
              f"reference-code {out['best_ref']:.4f}  |gap| = "
              f"{out['gap_pts']:.2f} pts  (class acc "
              f"{out['best_jax_cls']:.4f} vs {out['best_ref_cls']:.4f})")
    else:
        print(f"\n[{side} side only] best instance acc "
              f"{max(jax_inst + ref_inst):.4f}")
    return out


def run_s3dis(epochs=12, batch=16, lr=0.05, n_train=1024, n_test=512,
              seed=0, npoint=128, nneighbor=16,
              backbone="deit_tiny_patch16_224", lr_step=4, lr_gamma=0.8):
    """S3DIS semseg vs the reference's OWN 3DViT PointTransformerSeg (the
    3DViT_s3dis config aliases the 3DViT model — the reference's
    models.3DViT_s3dis module does not exist), with the
    train_s3dis_semseg.py recipe: SGD(momentum=0.9), LR decay
    max(lr*0.8^(e//step), 1e-5) (:139-143), BN-momentum schedule
    max(0.1*0.5^(e//step), 0.01) — note ORIGINAL momentum 0.1 here vs
    partseg's 0.9 (:118-120,144-149) — and the eval conventions of
    :175-231 (13 single-label 'categories', per-sample category from the
    FIRST point's label, point accuracy / class-avg accuracy / class-avg +
    instance-avg IoU) via the oracle-tested SemSegMeter on both sides'
    logits. Best INSTANCE-avg IoU compared.

    Deliberate deviations, identical on both sides: no per-batch random
    scale/shift augmentation (:155-157), harness lr 0.05 instead of the
    yaml's 0.5 (synthetic-task stability; both sides see identical lrs),
    synthetic 9-dim blocks (make_semseg_points) instead of the absent
    real rooms."""
    from simple3dformer_tpu.models.point_vit import PointViT
    from simple3dformer_tpu.train.eval_metrics import SemSegMeter
    from simple3dformer_tpu.train.loop import seg_cross_entropy

    ref_mod = refbridge.load_reference_module("models.3DViT.model")
    rng = np.random.RandomState(seed)
    xs, ss = synthetic_tasks.make_semseg_points(n_train, npoint, rng)
    xt, st_ = synthetic_tasks.make_semseg_points(n_test, npoint, rng)

    def build_model(torch_mom):
        return PointViT(variant="3DViT_s3dis", task="seg", num_point=npoint,
                        num_class=13, input_dim=9, nneighbor=nneighbor,
                        transformer_backbone=backbone,
                        bn_momentum=1.0 - torch_mom)

    model = build_model(0.1)
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((2, npoint, 9)))
    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])

    cfg = refbridge.make_point_cfg(npoint, 13, 9, nblocks=4,
                                   nneighbor=nneighbor,
                                   transformer_backbone=backbone,
                                   pretrained=False, head="Linear")
    torch.manual_seed(seed)
    ref_model = ref_mod.PointTransformerSeg(cfg)
    missing, unexpected = ref_model.load_state_dict(
        refbridge.export_pointvit_state_dict(
            params_np, 9, variables.get("batch_stats")), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    steps_per_epoch = n_train // batch
    order_rng = np.random.RandomState(seed + 1)
    epoch_idx = [
        order_rng.permutation(n_train)[: steps_per_epoch * batch]
        .reshape(steps_per_epoch, batch)
        for _ in range(epochs)
    ]
    lrs = [max(lr * (lr_gamma ** (e // lr_step)), 1e-5)
           for e in range(epochs)]
    moms = [max(0.1 * (0.5 ** (e // lr_step)), 0.01) for e in range(epochs)]

    # ---- jax production loop ----
    tx = make_optimizer("SGD")
    ds = DeviceResidentDataset({"x": xs, "y": ss})
    test_ds = DeviceResidentDataset({"x": xt, "y": st_})
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"))
    eb = next(b for b in range(min(64, n_test), 0, -1) if n_test % b == 0)
    eval_idx = jnp.asarray(np.arange(n_test).reshape(-1, eb))

    jax_iou, cur, t0 = [], None, time.time()
    for e in range(epochs):
        if moms[e] != cur:
            cur = moms[e]
            model = build_model(cur)
            run = make_scanned_train_steps(
                model, tx, ds, None, loss_fn=seg_cross_entropy,
                has_batch_stats=True)
            evaluate = make_scanned_eval(model, test_ds, None,
                                         has_batch_stats=True)
        state, _ = run(state, jnp.asarray(epoch_idx[e]), lrs[e],
                       jax.random.key(e))
        logits = np.asarray(evaluate(state, eval_idx)).reshape(-1, npoint, 13)
        meter = SemSegMeter()
        meter.update(logits.argmax(-1), st_)
        jax_iou.append(meter.instance_avg_iou)
        print(f"[jax]   epoch {e:2d} lr {lrs[e]:.2e} bn_mom {moms[e]:.3f} "
              f"inst mIoU {jax_iou[-1]:.4f} acc {meter.accuracy:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- reference loop (train_s3dis_semseg.py:100-231 semantics) ----
    tx_all = torch.from_numpy(xs)
    ty_all = torch.from_numpy(ss.astype(np.int64))
    tt_all = torch.from_numpy(xt)
    opt = torch.optim.SGD(ref_model.parameters(), lr=lrs[0], momentum=0.9)
    ref_iou = []
    for e in range(epochs):
        for g in opt.param_groups:
            g["lr"] = lrs[e]
        for m in ref_model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.momentum = moms[e]
        ref_model.train()
        for s in range(steps_per_epoch):
            bi = epoch_idx[e][s]
            out = ref_model(tx_all[bi])
            loss = F.cross_entropy(out.reshape(-1, 13), ty_all[bi].reshape(-1))
            opt.zero_grad()
            loss.backward()
            opt.step()
        ref_model.eval()
        meter = SemSegMeter()
        with torch.no_grad():
            for i in range(0, n_test, 64):
                meter.update(ref_model(tt_all[i:i + 64]).numpy().argmax(-1),
                             st_[i:i + 64])
        ref_iou.append(meter.instance_avg_iou)
        print(f"[torch] epoch {e:2d} lr {lrs[e]:.2e} bn_mom {moms[e]:.3f} "
              f"inst mIoU {ref_iou[-1]:.4f} acc {meter.accuracy:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    out = dict(jax_iou=np.array(jax_iou), ref_iou=np.array(ref_iou),
               best_jax=max(jax_iou), best_ref=max(ref_iou),
               gap_pts=abs(max(jax_iou) - max(ref_iou)) * 100.0)
    print(f"\nbest instance-avg mIoU ours {out['best_jax']:.4f} vs "
          f"reference-code {out['best_ref']:.4f}  |gap| = "
          f"{out['gap_pts']:.2f} pts")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", default="voxel",
                    choices=["voxel", "point", "partseg", "partseg_lwf",
                             "scanobjectnn", "s3dis", "weight_sharing"])
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-test", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backbone", default="deit_tiny_patch16_224")
    ap.add_argument("--side", default="both", choices=["both", "jax",
                                                       "torch"],
                    help="run one framework only (voxel/partseg_lwf/"
                         "scanobjectnn tracks): both loops are "
                         "seed-deterministic, so a single-side run "
                         "reproduces exactly its half of a --side both run "
                         "— resume an interrupted record")
    ap.add_argument("--route", default="default",
                    choices=["default", "group_embed"],
                    help="voxel track: which pos-embedding route to train "
                         "(group_embed = the ShapeNetV2 two-stage route)")
    ap.add_argument("--group-axes", default="pillar",
                    choices=["pillar", "reference_bug"],
                    help="voxel/group_embed: our as-shipped per-pillar "
                         "stage-1 (the deliberate bug-fix) vs an exact "
                         "replication of the reference's batch-mixing "
                         "attention axes — run both to quantify the "
                         "deviation (VERDICT r4 #1)")
    # StepLR knobs, scaled to harness epoch counts (the reference's
    # StepLR(50/20) never fires inside a <=20-epoch synthetic run, leaving
    # both frameworks oscillating at lr0 — the recorded point-track run used
    # --epochs 18 --lr-step 8 so both sides converge before comparison).
    ap.add_argument("--lr-step", type=int, default=None,
                    help="StepLR period in epochs (default: track-native "
                         "20 voxel / 50 point)")
    ap.add_argument("--lr-gamma", type=float, default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="base learning rate, identical on both sides "
                         "(default: track-native — 1e-3 Adam tracks, 0.01 "
                         "SGD tracks). The group_embed/pillar architecture "
                         "does not train at the voxel track's 1e-3 (loss "
                         "pinned at chance for 3+ epochs, probed in "
                         "scripts/debug_ge_pillar.py) but converges "
                         "cleanly at 3e-4 — pass --lr 3e-4 for that route.")
    ap.add_argument("--noise", type=float, default=None,
                    help="synthetic-task noise level (voxel track: fraction "
                         "of bits flipped, default 0.06; scanobjectnn "
                         "track: per-point jitter sigma, default 0.04). "
                         "The first 18-epoch full-depth voxel run showed "
                         "BOTH frameworks still climbing at 0.06, and the "
                         "round-4 scanobjectnn record saturated >=0.998 at "
                         "0.04 — converged comparison needs a level where "
                         "both sides plateau in a discriminative band.")
    args = ap.parse_args()
    if args.track == "voxel":
        run_voxel(epochs=args.epochs, batch=args.batch, n_train=args.n_train,
                  n_test=args.n_test, seed=args.seed, backbone=args.backbone,
                  lr=args.lr if args.lr is not None else 1e-3,
                  noise=args.noise if args.noise is not None else 0.06,
                  lr_step=args.lr_step or 20, lr_gamma=args.lr_gamma or 0.5,
                  route=args.route, group_axes=args.group_axes,
                  side=args.side)
    elif args.track == "weight_sharing":
        run_weight_sharing(
            epochs=args.epochs, batch=args.batch, n_train=args.n_train,
            n_test=args.n_test, seed=args.seed, backbone=args.backbone,
            lr=args.lr if args.lr is not None else 1e-3,
            noise=args.noise if args.noise is not None else 0.02,
            lr_step=args.lr_step or 10, lr_gamma=args.lr_gamma or 0.3,
            side=args.side)
    elif args.track == "partseg":
        run_partseg(epochs=args.epochs, batch=args.batch, seed=args.seed,
                    n_train=args.n_train, n_test=args.n_test,
                    backbone=args.backbone,
                    lr_step=args.lr_step or 4, lr_gamma=args.lr_gamma or 0.5,
                    noise=args.noise if args.noise is not None else 0.0)
    elif args.track == "partseg_lwf":
        run_partseg_lwf(epochs=args.epochs, batch=args.batch, seed=args.seed,
                        n_train=args.n_train, n_test=args.n_test,
                        backbone=args.backbone,
                        lr_step=args.lr_step or 4,
                        lr_gamma=args.lr_gamma or 0.5, side=args.side)
    elif args.track == "scanobjectnn":
        run_scanobjectnn(epochs=args.epochs, batch=args.batch,
                         seed=args.seed, n_train=args.n_train,
                         n_test=args.n_test, backbone=args.backbone,
                         lr=args.lr if args.lr is not None else 0.01,
                         lr_step=args.lr_step or 8,
                         lr_gamma=args.lr_gamma or 0.3, side=args.side,
                         noise=args.noise if args.noise is not None
                         else 0.04)
    elif args.track == "s3dis":
        run_s3dis(epochs=args.epochs, batch=args.batch, seed=args.seed,
                  n_train=args.n_train, n_test=args.n_test,
                  backbone=args.backbone, lr_step=args.lr_step or 4,
                  lr_gamma=args.lr_gamma or 0.8)
    else:
        run_point(epochs=args.epochs, batch=args.batch, seed=args.seed,
                  lr_step=args.lr_step or 50, lr_gamma=args.lr_gamma or 0.3)


if __name__ == "__main__":
    main()

"""Trajectory-parity harness: does our training loop behave like the reference's?

Per-layer torch oracles (tests/test_vit.py, tests/test_point_oracles.py) prove
every component matches in isolation. This harness composes them into FULL
torch mirrors of two models and trains both frameworks side by side —
identical initial weights (copied from the jax init), identical synthetic
data, identical batch order, identical Adam(lr) hyperparameters — then
compares the loss/accuracy trajectories:

  * flagship VoxelViT at a tiny config
    (mirrors /root/reference/train_cls_voxel.py:234-268 semantics:
    Adam + CE on voxel occupancy grids)
  * Hengshuang PointTransformerCls at a tiny config
    (mirrors /root/reference/train_cls.py:103-157: Adam + CE on point clouds;
    includes FPS/kNN/BatchNorm set abstraction, the numerically hardest part)

The jax side runs the PRODUCTION path: the same make_scanned_train_steps /
make_optimizer used by the CLIs, on CPU. The torch side is a hand-written
mirror using the same math (tanh-GELU like flax nn.gelu; erf-vs-tanh differs
by <2e-4 relative, tests/test_vit.py tolerance) and torch.optim.Adam, the
reference's optimizer.

What "tracks" means (f32 training is chaotic — bit-equality over hundreds of
steps is impossible for two different executors; tolerances are justified in
BASELINE.md round-3):
  phase A (exactness): per-step |loss_jax - loss_torch| stays tiny over the
      first EXACT_STEPS steps — evidence that init transfer, forward, grads,
      and the Adam update rule are the same computation.
  phase B (trend): over the full run, windowed mean losses stay within a few
      percent and final train accuracies agree — evidence the optimization
      *trajectory* is the same even after FP chaos decorrelates the iterates.

Usage:
    python scripts/trajectory_parity.py [--steps 300] [--model voxel|hengshuang|both]
"""

from __future__ import annotations

import argparse
import math

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from simple3dformer_tpu.data.pipeline import DeviceResidentDataset  # noqa: E402
from simple3dformer_tpu.models.hengshuang import PointTransformerCls  # noqa: E402
from simple3dformer_tpu.models.voxel_vit import VoxelViT  # noqa: E402
from simple3dformer_tpu.nn import vit as vit_mod  # noqa: E402
from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed  # noqa: E402
from simple3dformer_tpu.train.loop import (  # noqa: E402
    create_train_state, cross_entropy, make_scanned_train_steps,
    seg_cross_entropy)
from simple3dformer_tpu.train.optim import make_optimizer  # noqa: E402

N_TRAIN = 256   # synthetic corpus size
EXACT_STEPS = 40

# synthetic learnable tasks — single source shared with
# tests/test_learnability.py (a drifted task definition would read as a
# framework parity bug)
import pathlib  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from synthetic_tasks import (  # noqa: E402,F401
    V, make_catplane_seg, make_shape_points, make_shape_voxels)


# --------------------------------------------------------------------------
# jax params -> torch parameter tree (same layout: kernels are [in, out])
# --------------------------------------------------------------------------

def tree_to_torch(tree):
    if isinstance(tree, dict):
        return {k: tree_to_torch(v) for k, v in tree.items()}
    return torch.nn.Parameter(
        torch.tensor(np.asarray(tree), dtype=torch.float32))


def torch_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from torch_leaves(v)
    else:
        yield tree


# --------------------------------------------------------------------------
# torch mirrors of our flax primitives (identical math, flax layouts)
# --------------------------------------------------------------------------

def t_dense(p, x):
    return x @ p["kernel"] + p["bias"]


def t_layernorm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * p["scale"] + p["bias"]


def t_block(p, x, heads):
    """nn/layers.Block: pre-norm attn + pre-norm tanh-GELU MLP."""
    B, N, C = x.shape
    hd = C // heads
    h = t_layernorm(p["norm1"], x)
    qkv = t_dense(p["attn"]["qkv"], h).reshape(B, N, 3, heads, hd)
    q, k, v = qkv.unbind(2)
    attn = torch.einsum("bnhd,bmhd->bhnm", q * hd ** -0.5, k).softmax(-1)
    h = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
    x = x + t_dense(p["attn"]["proj"], h)
    h = t_layernorm(p["norm2"], x)
    h = F.gelu(t_dense(p["mlp"]["fc1"], h), approximate="tanh")
    return x + t_dense(p["mlp"]["fc2"], h)


def t_patchify3d(x, cell):
    B, X, Y, Z = x.shape
    p = X // cell
    x = x[:, : p * cell, : p * cell, : p * cell]
    x = x.reshape(B, p, cell, p, cell, p, cell)
    x = x.permute(0, 1, 3, 5, 2, 4, 6)
    return x.reshape(B, p, p, p, cell ** 3), p


def t_voxel_forward(tree, x, heads, depth, cell):
    """models/voxel_vit.VoxelViT forward, mode='default'."""
    patches, _ = t_patchify3d(x, cell)
    tok = patches @ tree["voxel_embed"]["kernel"] + tree["voxel_embed"]["bias"]
    tok = tok.mean(3)  # mean over pz
    B, D = tok.shape[0], tok.shape[-1]
    tok = tok.reshape(B, -1, D)
    cls = tree["cls_token"].expand(B, -1, -1)
    tok = torch.cat([cls, tok], 1) + tree["voxel_pos_embed"]
    for i in range(depth):
        tok = t_block(tree["core"][f"blocks_{i}"], tok, heads)
    tok = t_layernorm(tree["core"]["norm"], tok)
    return t_dense(tree["voxel_head"], tok[:, 0])


# ---- Hengshuang mirror pieces ----

def t_square_distance(src, dst):
    """ops/pointops.square_distance (exact=False form, clamped)."""
    s2 = (src * src).sum(-1, keepdim=True)
    d2 = (dst * dst).sum(-1).unsqueeze(1)
    cross = torch.einsum("bnc,bmc->bnm", src, dst)
    return torch.clamp(s2 + d2 - 2.0 * cross, min=0.0)


def t_knn(query, points, k):
    d = t_square_distance(query, points)
    # ops/pointops.knn_indices clamps k (torch argsort[:k] semantics)
    return torch.topk(-d, min(k, points.shape[1]), dim=-1).indices


def t_index_points(points, idx):
    B = points.shape[0]
    bidx = torch.arange(B).view(B, *([1] * (idx.dim() - 1))).expand(idx.shape)
    return points[bidx, idx]


def t_fps_start0(xyz, npoint):
    """ops/pointops.farthest_point_sample with key=None (start index 0)."""
    B, N, _ = xyz.shape
    distance = torch.full((B, N), 1e10)
    farthest = torch.zeros(B, dtype=torch.long)
    out = torch.zeros(B, npoint, dtype=torch.long)
    with torch.no_grad():
        for i in range(npoint):
            out[:, i] = farthest
            centroid = xyz[torch.arange(B), farthest].unsqueeze(1)
            distance = torch.minimum(
                distance, ((xyz - centroid) ** 2).sum(-1))
            farthest = distance.argmax(-1)
    return out


def t_mlp2(p, x):
    return t_dense(p["fc2"], torch.relu(t_dense(p["fc1"], x)))


def t_vector_attention(p, xyz, feats, k, d_model):
    """nn/vector_attention.VectorAttentionBlock (XLA path)."""
    idx = t_knn(xyz, xyz, k)
    knn_xyz = t_index_points(xyz, idx)
    pre = feats
    x = t_dense(p["fc1"], feats)
    q = x @ p["w_qs"]["kernel"]
    k_all = x @ p["w_ks"]["kernel"]
    v_all = x @ p["w_vs"]["kernel"]
    kk = t_index_points(k_all, idx)
    vv = t_index_points(v_all, idx)
    pos = t_mlp2(p["fc_delta"], xyz[:, :, None, :] - knn_xyz)
    attn = t_mlp2(p["fc_gamma"], q[:, :, None, :] - kk + pos)
    attn = torch.softmax(attn / math.sqrt(d_model), dim=-2)
    res = (attn * (vv + pos)).sum(2)
    return t_dense(p["fc2"], res) + pre


def t_bn_relu_dense(p, x, eps=1e-5):
    """nn/set_abstraction.BNReLUDense in training mode (batch statistics)."""
    h = t_dense(p["conv"], x)
    ax = tuple(range(h.dim() - 1))
    mu = h.mean(ax, keepdim=True)
    var = h.var(ax, unbiased=False, keepdim=True)
    h = (h - mu) / torch.sqrt(var + eps) * p["bn"]["scale"] + p["bn"]["bias"]
    return torch.relu(h)


def t_transition_down(p, xyz, points, npoint, nneighbor, n_mlp):
    fps_idx = t_fps_start0(xyz, npoint)
    new_xyz = t_index_points(xyz, fps_idx)
    idx = t_knn(new_xyz, xyz, nneighbor)
    grouped_xyz = t_index_points(xyz, idx)
    norm = grouped_xyz - new_xyz[:, :, None, :]
    h = torch.cat([norm, t_index_points(points, idx)], -1)
    for i in range(n_mlp):
        h = t_bn_relu_dense(p["sa"][f"mlp_{i}"], h)
    return new_xyz, h.max(2).values


def t_hengshuang_forward(tree, x, nblocks, nneighbor, num_point, d_model):
    """models/hengshuang.PointTransformerCls forward (training mode)."""
    bb = tree["backbone"]
    xyz = x[..., :3]
    h = torch.relu(t_dense(bb["fc1_1"], x))
    h = t_dense(bb["fc1_2"], h)
    points = t_vector_attention(bb["transformer1"], xyz, h, nneighbor, d_model)
    for i in range(nblocks):
        xyz, points = t_transition_down(
            bb[f"transition_downs_{i}"], xyz, points,
            num_point // 4 ** (i + 1), nneighbor, n_mlp=2)
        points = t_vector_attention(
            bb[f"transformers_{i}"], xyz, points, nneighbor, d_model)
    h = points.mean(1)
    head = tree["fc2"]
    h = torch.relu(t_dense(head["fc1"], h))
    h = torch.relu(t_dense(head["fc2"], h))
    return t_dense(head["fc3"], h)


# ---- 3DViT (PointViT) seg mirror pieces ----

def t_linear_bn_relu(p, x, eps=1e-5):
    """models/hengshuang.LinearBNReLU in training mode (batch statistics)."""
    h = t_dense(p["fc"], x)
    ax = tuple(range(h.dim() - 1))
    mu = h.mean(ax, keepdim=True)
    var = h.var(ax, unbiased=False, keepdim=True)
    h = (h - mu) / torch.sqrt(var + eps) * p["bn"]["scale"] + p["bn"]["bias"]
    return torch.relu(h)


def t_three_interp(xyz1, xyz2, feats2):
    """ops/pointops.three_nn_interpolate (pointnet_util.py:398-408 math)."""
    d = t_square_distance(xyz1, xyz2)
    neg, idx = torch.topk(-d, 3, dim=-1)
    recip = 1.0 / (-neg + 1e-8)
    w = recip / recip.sum(-1, keepdim=True)
    return (t_index_points(feats2, idx) * w[..., None]).sum(2)


def t_transition_up(p, xyz_coarse, h_coarse, xyz_fine, f_fine):
    """models/hengshuang.TransitionUp: interp(fc1(coarse)) + fc2(fine)."""
    f1 = t_linear_bn_relu(p["fc1"], h_coarse)
    f2 = t_linear_bn_relu(p["fc2"], f_fine)
    return t_three_interp(xyz_fine, xyz_coarse, f1) + f2


def t_point_vit_seg_forward(tree, x, heads, depth, num_point, nneighbor):
    """models/point_vit.PointViT seg forward, variant 3DViT_1_layer
    (/root/reference/models/3DViT_1_layer/model.py:292-319,349): stem + pos
    stem, one TransitionDown to N/4, cls token + ViT core, strip cls, one
    TransitionUp back to N, per-point head."""
    xyz = x[..., :3]
    f = t_mlp2(tree["fc1"], x) + t_mlp2(tree["fc_pos_embed"], xyz)
    xyz1, f1 = t_transition_down(
        tree["transition_downs_0"], xyz, f, num_point // 4, nneighbor, n_mlp=2)
    cls = tree["cls_token"].expand(f1.shape[0], -1, -1)
    tok = torch.cat([cls, f1], 1)
    for i in range(depth):
        tok = t_block(tree["core"][f"blocks_{i}"], tok, heads)
    tok = t_layernorm(tree["core"]["norm"], tok)
    h = t_transition_up(tree["transition_ups_0"], xyz1, tok[:, 1:], xyz, f)
    return t_dense(tree["new_head"], h)


# --------------------------------------------------------------------------
# side-by-side training
# --------------------------------------------------------------------------

def _train_both(model, variables, xs, ys, torch_forward, steps, batch, lr,
                has_bn=False, cs=None, n_cat=0, seg=False):
    """Train the jax production loop and the torch mirror on identical
    batches from identical weights; return per-step loss/acc for both.

    ``cs``/``n_cat``: per-sample shape categories — routes the jax side
    through the partseg one-hot prepare_fn (cli.train_partseg.make_prepare_fn)
    while the torch side concatenates the same one-hot channels up front.
    ``seg``: per-point CE (train_partseg.py:165 semantics) instead of
    per-sample CE."""
    # snapshot the init BEFORE the jax run donates (and frees) its buffers
    tree = tree_to_torch(variables["params"])

    # ---- jax side: the CLIs' scanned train path ----
    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx,
                               variables.get("batch_stats"))
    arrays = {"x": xs, "y": ys}
    prepare = None
    if cs is not None:
        from simple3dformer_tpu.cli.train_partseg import make_prepare_fn

        arrays["cls"] = cs
        prepare = make_prepare_fn(n_cat)
    ds = DeviceResidentDataset(arrays)
    run = make_scanned_train_steps(
        model, tx, ds, has_batch_stats=has_bn,
        loss_fn=seg_cross_entropy if seg else cross_entropy,
        prepare_fn=prepare)
    idx = np.random.RandomState(1).randint(0, len(xs), size=(steps, batch))
    _, metrics = run(state, jnp.asarray(idx), lr, jax.random.key(0))
    jl = np.asarray(metrics["loss"], np.float64)
    ja = np.asarray(metrics["accuracy"], np.float64)

    # ---- torch side: reference-style loop (train_cls.py:103-157) ----
    params = [p for p in torch_leaves(tree)]
    opt = torch.optim.Adam(params, lr=lr, betas=(0.9, 0.999), eps=1e-8)
    x_host = np.asarray(xs, np.float32)
    if cs is not None:
        onehot = np.eye(n_cat, dtype=np.float32)[np.asarray(cs)]
        onehot = np.broadcast_to(
            onehot[:, None, :], x_host.shape[:-1] + (n_cat,))
        x_host = np.concatenate([x_host, onehot], axis=-1)
    tx_all = torch.from_numpy(x_host)
    ty_all = torch.from_numpy(np.asarray(ys)).long()
    tl, ta = [], []
    for s in range(steps):
        bx, by = tx_all[idx[s]], ty_all[idx[s]]
        logits = torch_forward(tree, bx)
        if seg:
            loss = F.cross_entropy(
                logits.reshape(-1, logits.shape[-1]), by.reshape(-1))
        else:
            loss = F.cross_entropy(logits, by)
        opt.zero_grad()
        loss.backward()
        opt.step()
        tl.append(float(loss.detach()))
        ta.append(float((logits.argmax(-1) == by).float().mean()))
    return dict(jax_loss=jl, torch_loss=np.array(tl),
                jax_acc=ja, torch_acc=np.array(ta))


def run_voxel(steps=300, batch=16, lr=3e-4, seed=0):
    """Flagship VoxelViT (mode=default, VoxelEmbed) at a tiny backbone."""
    torch.manual_seed(0)
    rng = np.random.RandomState(seed)
    xs, ys = make_shape_voxels(N_TRAIN, rng)
    # tiny 3-deep backbone registered just for this harness (the production
    # BACKBONES are all depth-12; trajectory dynamics don't need 12 layers).
    # Overwrite-with-conflict-check rather than setdefault: a foreign
    # 'traj_tiny' left by another caller would silently build the wrong
    # model while the torch mirror still assumes depth=3/heads=3.
    _tiny = dict(patch_size=16, embed_dim=96, depth=3, num_heads=3,
                 mlp_ratio=4.0, qkv_bias=True)
    existing = vit_mod.BACKBONES.get("traj_tiny")
    if existing is not None and existing != _tiny:
        raise RuntimeError(f"BACKBONES['traj_tiny'] already registered with "
                           f"a different config: {existing}")
    vit_mod.BACKBONES["traj_tiny"] = _tiny
    emb = VoxelEmbed(voxel_size=V, cell_size=4, patch_size=4, embed_dim=96)
    model = VoxelViT(voxel_embed=emb, n_classes=3,
                     transformer_backbone="traj_tiny")
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, V, V, V)))

    def fwd(tree, bx):
        return t_voxel_forward(tree, bx, heads=3, depth=3, cell=4)

    return _train_both(model, variables, xs, ys, fwd, steps, batch, lr)


def t_permute_mlp(p, x, seg):
    """models/vip3d.WeightedPermuteMLP (vip_3d.py:43-88 semantics incl. the
    z-mix-reuses-mlp_w quirk and the 4-way softmax reweight gate)."""
    B, H, W, Z, C = x.shape
    S, T = C // seg, C // H

    def lin(name, v):
        out = v @ p[name]["kernel"]
        return out + p[name]["bias"] if "bias" in p[name] else out

    h = x.reshape(B, H, W, Z, seg, S).permute(0, 4, 3, 2, 1, 5)
    h = lin("mlp_h", h.reshape(B, seg, Z, W, H * S))
    # reference's exact restore (vip_3d.py:71): W/Z-swapped, not the inverse
    h = h.reshape(B, seg, Z, W, H, T).permute(0, 4, 2, 3, 1, 5)
    h = h.reshape(B, H, W, Z, C)
    w = x.reshape(B, H, W, Z, seg, S).permute(0, 1, 4, 3, 2, 5)
    w = lin("mlp_w", w.reshape(B, H, seg, Z, W * S))
    w = w.reshape(B, H, seg, Z, W, T).permute(0, 1, 4, 3, 2, 5)
    w = w.reshape(B, H, W, Z, C)
    z = x.reshape(B, H, W, Z, seg, S).permute(0, 2, 1, 4, 3, 5)
    z = lin("mlp_w", z.reshape(B, W, H, seg, Z * S))  # quirk: mlp_w, not mlp_z
    z = z.reshape(B, W, H, seg, Z, T).permute(0, 2, 1, 4, 3, 5)
    z = z.reshape(B, H, W, Z, C)
    c = lin("mlp_c", x)

    a = (h + w + z + c).reshape(B, -1, C).mean(1)
    a = F.gelu(t_dense(p["reweight"]["fc1"], a), approximate="tanh")
    a = t_dense(p["reweight"]["fc2"], a)
    a = a.reshape(B, C, 4).permute(2, 0, 1).softmax(0)[:, :, None, None, None, :]
    out = h * a[0] + w * a[1] + z * a[2] + c * a[3]
    return t_dense(p["proj"], out)


def t_perm_block(p, x, seg):
    h = t_layernorm(p["norm1"], x)
    x = x + t_permute_mlp(p["attn"], h, seg)
    h = t_layernorm(p["norm2"], x)
    h = F.gelu(t_dense(p["mlp"]["fc1"], h), approximate="tanh")
    return x + t_dense(p["mlp"]["fc2"], h)


def t_vip3d_forward(tree, x, layers, segs, transitions, cell):
    """models/vip3d.VisionPermutator3D forward (VoxelEmbedNoAverage embed,
    stages, transition-2 downsamples, LN + mean-pool head)."""
    patches, _ = t_patchify3d(x, cell)
    tok = (patches @ tree["embed_layer"]["kernel"]
           + tree["embed_layer"]["bias"])
    for i, n in enumerate(layers):
        for b in range(n):
            tok = t_perm_block(tree[f"stage{i}_block{b}"], tok, segs[i])
        if i < len(layers) - 1 and transitions[i]:
            B, H, W, Z, C = tok.shape
            g = H // 2
            t2 = tok.reshape(B, g, 2, g, 2, g, 2, C)
            t2 = t2.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, g, g, g, 8 * C)
            tok = t2 @ tree[f"downsample{i}"]["proj"]["kernel"]  # bias-free
    B = tok.shape[0]
    tok = tok.reshape(B, -1, tok.shape[-1])
    tok = t_layernorm(tree["norm"], tok)
    return t_dense(tree["head"], tok.mean(1))


def run_vip3d(steps=300, batch=16, lr=3e-4, seed=0):
    """ViP-3D at a tiny 2-stage config (with a real transition-2 downsample);
    mirrors /root/reference/train_pure_mlp.py's Adam + CE loop semantics."""
    from simple3dformer_tpu.models.vip3d import VisionPermutator3D
    from simple3dformer_tpu.nn.voxel_embed import VoxelEmbedNoAverage

    torch.manual_seed(0)
    rng = np.random.RandomState(seed)
    xs, ys = make_shape_voxels(N_TRAIN, rng)
    layers, segs, transitions = [2, 2], [4, 2], [True, False]
    emb = VoxelEmbedNoAverage(voxel_size=V, cell_size=4, patch_size=4,
                              embed_dim=96)
    model = VisionPermutator3D(
        embed_layer=emb, layers=layers, embed_dims=[96, 96],
        transitions=transitions, segment_dim=segs, mlp_ratios=[3, 3],
        num_classes=3)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, V, V, V)))

    def fwd(tree, bx):
        return t_vip3d_forward(tree, bx, layers, segs, transitions, cell=4)

    return _train_both(model, variables, xs, ys, fwd, steps, batch, lr)


def t_patchify2d(x, P):
    B, H, W, C = x.shape
    gh, gw = H // P, W // P
    x = x.reshape(B, gh, P, gw, P, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, P * P * C)


def t_vit2d_forward(tree, x, heads, depth, patch):
    """nn/vit.ViT2D forward (also VoxelViT.forward_images — same param
    names: patch_embed/cls_token/pos_embed/core/head)."""
    tok = (t_patchify2d(x, patch) @ tree["patch_embed"]["kernel"]
           + tree["patch_embed"]["bias"])
    B = tok.shape[0]
    cls = tree["cls_token"].expand(B, -1, -1)
    tok = torch.cat([cls, tok], 1) + tree["pos_embed"]
    for i in range(depth):
        tok = t_block(tree["core"][f"blocks_{i}"], tok, heads)
    tok = t_layernorm(tree["core"]["norm"], tok)
    return t_dense(tree["head"], tok[:, 0])


_IMNET_MEAN = torch.tensor([0.485, 0.456, 0.406])
_IMNET_STD = torch.tensor([0.229, 0.224, 0.225])


def run_lwf(steps=300, batch=16, lr=3e-4, seed=0, lam=0.1, img=32):
    """LwF: task CE + lambda * CE(student.forward_images, argmax(teacher)).

    Mirrors the reference's central mechanism
    (/root/reference/train_cls_voxel.py:238-268): the jax side runs the
    production make_scanned_lwf_train_steps (teacher forward under
    stop_gradient inside the same jit program); the torch side runs the
    same two-term loss with a frozen torch teacher. Both students start
    from the same init, see the same voxel AND image batches.
    """
    from simple3dformer_tpu.train.lwf import make_scanned_lwf_train_steps

    torch.manual_seed(0)
    rng = np.random.RandomState(seed)
    xs, ys = make_shape_voxels(N_TRAIN, rng)
    imgs_u8 = (rng.rand(N_TRAIN, img, img, 3) * 255).astype(np.uint8)

    _tiny = dict(patch_size=16, embed_dim=96, depth=3, num_heads=3,
                 mlp_ratio=4.0, qkv_bias=True)
    existing = vit_mod.BACKBONES.get("traj_tiny")
    if existing is not None and existing != _tiny:
        raise RuntimeError("BACKBONES['traj_tiny'] conflict")
    vit_mod.BACKBONES["traj_tiny"] = _tiny

    emb = VoxelEmbed(voxel_size=V, cell_size=4, patch_size=4, embed_dim=96)
    model = VoxelViT(voxel_embed=emb, n_classes=3,
                     transformer_backbone="traj_tiny", img_size=img)
    x0 = jnp.zeros((2, V, V, V))
    img0 = jnp.zeros((2, img, img, 3))
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=model.init_all)
    )(jax.random.key(0), x0, img0)

    teacher = vit_mod.ViT2D(embed_dim=96, depth=3, num_heads=3,
                            mlp_ratio=4.0, qkv_bias=True, patch_size=16,
                            num_classes=1000, img_size=img)
    t_vars = jax.jit(teacher.init)(jax.random.key(5), img0)
    t_params = t_vars["params"]

    s_tree = tree_to_torch(variables["params"])
    t_tree = tree_to_torch(t_params)

    # ---- jax side: the production LwF scan path ----
    tx = make_optimizer("Adam")
    state = create_train_state(variables["params"], tx)
    task_ds = DeviceResidentDataset({"x": xs, "y": ys})
    image_ds = DeviceResidentDataset({"images": imgs_u8})
    run = make_scanned_lwf_train_steps(model, teacher, t_params, tx,
                                       task_ds, image_ds,
                                       lambda_weight=lam)
    idx_rng = np.random.RandomState(1)
    task_idx = idx_rng.randint(0, N_TRAIN, size=(steps, batch))
    img_idx = idx_rng.randint(0, N_TRAIN, size=(steps, batch))
    _, metrics = run(state, jnp.asarray(task_idx), jnp.asarray(img_idx),
                     lr, jax.random.key(0))
    jl = np.asarray(metrics["loss"], np.float64)
    j_task = np.asarray(metrics["task_loss"], np.float64)
    j_lwf = np.asarray(metrics["lwf_loss"], np.float64)

    # ---- torch side ----
    opt = torch.optim.Adam(list(torch_leaves(s_tree)), lr=lr,
                           betas=(0.9, 0.999), eps=1e-8)
    tx_all = torch.from_numpy(np.asarray(xs, np.float32))
    ty_all = torch.from_numpy(np.asarray(ys)).long()
    tim_all = torch.from_numpy(imgs_u8.astype(np.float32)) / 255.0
    tim_all = (tim_all - _IMNET_MEAN) / _IMNET_STD
    tl, t_task_l, t_lwf_l, ta = [], [], [], []
    for s in range(steps):
        bx, by = tx_all[task_idx[s]], ty_all[task_idx[s]]
        bimg = tim_all[img_idx[s]]
        with torch.no_grad():
            t_lab = t_vit2d_forward(t_tree, bimg, 3, 3, 16).argmax(-1)
        logits = t_voxel_forward(s_tree, bx, heads=3, depth=3, cell=4)
        img_pred = t_vit2d_forward(s_tree, bimg, 3, 3, 16)
        task_loss = F.cross_entropy(logits, by)
        lwf_loss = F.cross_entropy(img_pred, t_lab)
        loss = task_loss + lam * lwf_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        tl.append(float(loss.detach()))
        t_task_l.append(float(task_loss.detach()))
        t_lwf_l.append(float(lwf_loss.detach()))
        ta.append(float((logits.argmax(-1) == by).float().mean()))
    nan = np.full(steps, np.nan)
    return dict(jax_loss=jl, torch_loss=np.array(tl),
                jax_task=j_task, torch_task=np.array(t_task_l),
                jax_lwf=j_lwf, torch_lwf=np.array(t_lwf_l),
                jax_acc=nan, torch_acc=np.array(ta))


def run_partseg(steps=300, batch=16, lr=1e-3, seed=0, npoint=64, n_cat=4):
    """Part segmentation: PointViT 3DViT_1_layer + one-hot category concat +
    per-point CE — the /root/reference/train_partseg.py:160-171 loop shape
    (via the production prepare_fn/seg_cross_entropy path the partseg CLI
    uses). Completes the trajectory matrix across the seg task family."""
    from simple3dformer_tpu.models.point_vit import PointViT

    torch.manual_seed(0)
    rng = np.random.RandomState(seed)
    xs, cs, ys = make_catplane_seg(N_TRAIN, npoint, n_cat, rng)

    _tiny = dict(patch_size=16, embed_dim=96, depth=3, num_heads=3,
                 mlp_ratio=4.0, qkv_bias=True)
    existing = vit_mod.BACKBONES.get("traj_tiny")
    if existing is not None and existing != _tiny:
        raise RuntimeError("BACKBONES['traj_tiny'] conflict")
    vit_mod.BACKBONES["traj_tiny"] = _tiny

    model = PointViT(variant="3DViT_1_layer", task="seg", num_point=npoint,
                     num_class=2, input_dim=3 + n_cat, nneighbor=8,
                     transformer_backbone="traj_tiny")
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, npoint, 3 + n_cat)))

    def fwd(tree, bx):
        return t_point_vit_seg_forward(tree, bx, heads=3, depth=3,
                                       num_point=npoint, nneighbor=8)

    return _train_both(model, variables, xs, ys, fwd, steps, batch, lr,
                       has_bn=True, cs=cs, n_cat=n_cat, seg=True)


def run_hengshuang(steps=300, batch=16, lr=1e-3, seed=0, npoint=64):
    """Hengshuang cls at the learnability-test tiny config."""
    torch.manual_seed(0)
    rng = np.random.RandomState(seed)
    xs, ys = make_shape_points(N_TRAIN, npoint, rng)
    model = PointTransformerCls(num_point=npoint, num_class=3, input_dim=3,
                                nblocks=2, nneighbor=8, transformer_dim=64)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, npoint, 3)))

    def fwd(tree, bx):
        return t_hengshuang_forward(tree, bx, nblocks=2, nneighbor=8,
                                    num_point=npoint, d_model=64)

    return _train_both(model, variables, xs, ys, fwd, steps, batch, lr,
                       has_bn=True)


# --------------------------------------------------------------------------
# reporting
# --------------------------------------------------------------------------

def summarize(name, r, exact_steps=EXACT_STEPS, window=50):
    jl, tl = r["jax_loss"], r["torch_loss"]
    n = len(jl)
    exact = np.abs(jl[:exact_steps] - tl[:exact_steps])
    rel = exact / np.maximum(np.abs(tl[:exact_steps]), 1e-9)
    lines = [f"== {name} ({n} steps) =="]
    lines.append(f"phase A (first {exact_steps} steps): "
                 f"max |dloss| = {exact.max():.2e}  max rel = {rel.max():.2e}")
    lines.append(f"{'step':>6} {'jax_loss':>10} {'torch_loss':>11} {'|d|':>9}")
    for s in [0, 1, 4, 9, 19, 39, 74, 149, 224, n - 1]:
        if s < n:
            lines.append(f"{s:>6} {jl[s]:>10.5f} {tl[s]:>11.5f} "
                         f"{abs(jl[s] - tl[s]):>9.2e}")
    stats = {}
    for lo in range(0, n - window + 1, window):
        mj = jl[lo:lo + window].mean()
        mt = tl[lo:lo + window].mean()
        stats[lo] = (mj, mt)
        lines.append(f"window [{lo:>4},{lo + window:>4}): mean jax "
                     f"{mj:.4f}  torch {mt:.4f}  rel gap "
                     f"{abs(mj - mt) / max(mt, 1e-9):.3%}")
    fj = r["jax_acc"][-window:].mean()
    ft = r["torch_acc"][-window:].mean()
    if math.isnan(fj):  # LwF metrics carry losses only
        lines.append(f"final-{window}-step train acc: torch {ft:.3f} "
                     f"(jax LwF metrics carry losses only)")
    else:
        lines.append(f"final-{window}-step train acc: jax {fj:.3f} torch {ft:.3f}")
    return "\n".join(lines), dict(exact_max=float(exact.max()),
                                  exact_rel=float(rel.max()),
                                  windows=stats, acc=(float(fj), float(ft)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--model", default="both",
                    choices=["voxel", "hengshuang", "lwf", "vip3d",
                             "partseg", "both"])
    args = ap.parse_args()
    if args.model in ("voxel", "both"):
        txt, _ = summarize("flagship VoxelViT (tiny)", run_voxel(args.steps))
        print(txt)
    if args.model in ("hengshuang", "both"):
        txt, _ = summarize("Hengshuang cls (tiny)",
                           run_hengshuang(args.steps))
        print(txt)
    if args.model in ("vip3d", "both"):
        txt, _ = summarize("ViP-3D permutator (tiny)", run_vip3d(args.steps))
        print(txt)
    if args.model in ("partseg", "both"):
        txt, _ = summarize("3DViT_1_layer partseg (tiny)",
                           run_partseg(args.steps))
        print(txt)
    if args.model in ("lwf", "both"):
        r = run_lwf(args.steps)
        txt, _ = summarize("LwF VoxelViT + frozen teacher (tiny)", r)
        print(txt)
        d_task = np.abs(r["jax_task"][:EXACT_STEPS]
                        - r["torch_task"][:EXACT_STEPS]).max()
        d_lwf = np.abs(r["jax_lwf"][:EXACT_STEPS]
                       - r["torch_lwf"][:EXACT_STEPS]).max()
        print(f"per-term exactness (first {EXACT_STEPS}): max |d task_loss| "
              f"= {d_task:.2e}  max |d lwf_loss| = {d_lwf:.2e}")


if __name__ == "__main__":
    main()

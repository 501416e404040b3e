"""Hand-written torch oracles for the point-model core (VERDICT round-1 #6).

Each test builds one set of numpy weights, loads them into BOTH a torch
re-implementation of the reference math (Hengshuang/transformer.py:7-44,
pointnet_util.py:191-244, Hengshuang/model.py:7-47) and our flax module, and
asserts per-layer allclose — making vector attention / set abstraction /
TransitionDown/Up correctness independent of the learnability tests.

Conventions mirrored: kNN = argsort of squared distances (smallest k);
FPS start index 0 (key=None); torch BatchNorm momentum 0.1 == flax 0.9;
1x1 Conv2d == Dense over the channel axis.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from simple3dformer_tpu.models.hengshuang import TransitionDown, TransitionUp
from simple3dformer_tpu.nn.set_abstraction import PointNetSetAbstraction
from simple3dformer_tpu.nn.vector_attention import VectorAttentionBlock

B, N, K = 2, 64, 8
DP, DM = 16, 32  # d_points, d_model


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def _w(rng, *shape):
    return (rng.randn(*shape) * 0.1).astype(np.float32)


# --- torch-side reference primitives (pointnet_util.py:22-96) --------------

def torch_square_distance(src, dst):
    return torch.cdist(src, dst) ** 2


def torch_knn_idx(q, p, k):
    return torch_square_distance(q, p).argsort()[:, :, :k]


def torch_index_points(points, idx):
    b = points.shape[0]
    flat = idx.reshape(b, -1)
    out = torch.gather(points, 1,
                       flat[..., None].expand(-1, -1, points.shape[-1]))
    return out.reshape(*idx.shape, points.shape[-1])


def torch_fps_start0(xyz, npoint):
    """farthest_point_sample (pointnet_util.py:55-74) with start index 0."""
    b, n, _ = xyz.shape
    idx = torch.zeros(b, npoint, dtype=torch.long)
    distance = torch.full((b, n), 1e10)
    farthest = torch.zeros(b, dtype=torch.long)
    batch = torch.arange(b)
    for i in range(npoint):
        idx[:, i] = farthest
        centroid = xyz[batch, farthest][:, None]
        dist = torch.sum((xyz - centroid) ** 2, -1)
        distance = torch.minimum(distance, dist)
        farthest = distance.argmax(-1)
    return idx


# ---------------------------------------------------------------------------
# 1. subtraction vector attention (Hengshuang/transformer.py:7-44)
# ---------------------------------------------------------------------------

def torch_vector_attention(w, xyz, feats, k):
    x = feats @ _t(w["fc1_w"]) + _t(w["fc1_b"])
    knn_idx = torch_knn_idx(xyz, xyz, k)
    knn_xyz = torch_index_points(xyz, knn_idx)

    q = x @ _t(w["wq"])
    kk = torch_index_points(x @ _t(w["wk"]), knn_idx)
    v = torch_index_points(x @ _t(w["wv"]), knn_idx)

    def mlp2(h, p):
        h = F.relu(h @ _t(w[f"{p}1_w"]) + _t(w[f"{p}1_b"]))
        return h @ _t(w[f"{p}2_w"]) + _t(w[f"{p}2_b"])

    pos_enc = mlp2(xyz[:, :, None] - knn_xyz, "delta")
    attn = mlp2(q[:, :, None] - kk + pos_enc, "gamma")
    attn = F.softmax(attn / np.sqrt(kk.size(-1)), dim=-2)
    res = torch.einsum("bmnf,bmnf->bmf", attn, v + pos_enc)
    res = res @ _t(w["fc2_w"]) + _t(w["fc2_b"]) + feats
    return res, attn


def test_vector_attention_matches_torch(rng):
    w = {
        "fc1_w": _w(rng, DP, DM), "fc1_b": _w(rng, DM),
        "wq": _w(rng, DM, DM), "wk": _w(rng, DM, DM), "wv": _w(rng, DM, DM),
        "delta1_w": _w(rng, 3, DM), "delta1_b": _w(rng, DM),
        "delta2_w": _w(rng, DM, DM), "delta2_b": _w(rng, DM),
        "gamma1_w": _w(rng, DM, DM), "gamma1_b": _w(rng, DM),
        "gamma2_w": _w(rng, DM, DM), "gamma2_b": _w(rng, DM),
        "fc2_w": _w(rng, DM, DP), "fc2_b": _w(rng, DP),
    }
    xyz = rng.rand(B, N, 3).astype(np.float32)
    feats = _w(rng, B, N, DP)

    ref_res, ref_attn = torch_vector_attention(w, _t(xyz), _t(feats), K)

    params = {
        "fc1": {"kernel": w["fc1_w"], "bias": w["fc1_b"]},
        "w_qs": {"kernel": w["wq"]},
        "w_ks": {"kernel": w["wk"]},
        "w_vs": {"kernel": w["wv"]},
        "fc_delta": {"fc1": {"kernel": w["delta1_w"], "bias": w["delta1_b"]},
                     "fc2": {"kernel": w["delta2_w"], "bias": w["delta2_b"]}},
        "fc_gamma": {"fc1": {"kernel": w["gamma1_w"], "bias": w["gamma1_b"]},
                     "fc2": {"kernel": w["gamma2_w"], "bias": w["gamma2_b"]}},
        "fc2": {"kernel": w["fc2_w"], "bias": w["fc2_b"]},
    }
    model = VectorAttentionBlock(d_model=DM, k=K)
    res, attn = model.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                              params)},
                            jnp.asarray(xyz), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(res), ref_res.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. PointNetSetAbstraction incl. BN running-stats update
#    (pointnet_util.py:191-244 forward; dead knn_idx/:233-235 omitted)
# ---------------------------------------------------------------------------

def torch_sample_and_group_knn(npoint, nsample, xyz, points):
    fps_idx = torch_fps_start0(xyz, npoint)
    new_xyz = torch_index_points(xyz, fps_idx)
    idx = torch_knn_idx(new_xyz, xyz, nsample)
    grouped_xyz = torch_index_points(xyz, idx)
    grouped_norm = grouped_xyz - new_xyz[:, :, None]
    grouped_points = torch_index_points(points, idx)
    return new_xyz, torch.cat([grouped_norm, grouped_points], dim=-1)


@torch.no_grad()
def torch_set_abstraction(w, bns, xyz, points, npoint, nsample, training):
    new_xyz, new_points = torch_sample_and_group_knn(npoint, nsample, xyz,
                                                     points)
    h = new_points.permute(0, 3, 2, 1)  # [B, C, K, S]
    for i, bn in enumerate(bns):
        conv_w = _t(w[f"conv{i}_w"].T).unsqueeze(-1).unsqueeze(-1)
        h = F.conv2d(h, conv_w, _t(w[f"conv{i}_b"]))
        bn.train(training)
        h = F.relu(bn(h))
    return new_xyz, torch.max(h, 2)[0].transpose(1, 2)


def test_set_abstraction_matches_torch(rng):
    mlp = (24, 40)
    in_ch = 3 + DP
    w = {}
    widths = [in_ch] + list(mlp)
    bns = []
    for i, width in enumerate(mlp):
        w[f"conv{i}_w"] = _w(rng, widths[i], width)
        w[f"conv{i}_b"] = _w(rng, width)
        bn = torch.nn.BatchNorm2d(width)  # momentum 0.1 == flax 0.9
        with torch.no_grad():
            bn.weight.copy_(_t(1.0 + 0.1 * rng.randn(width).astype(np.float32)))
            bn.bias.copy_(_t(_w(rng, width)))
        bns.append(bn)

    xyz = rng.rand(B, N, 3).astype(np.float32)
    points = _w(rng, B, N, DP)

    params = {}
    batch_stats = {}
    for i, width in enumerate(mlp):
        params[f"mlp_{i}"] = {
            "conv": {"kernel": w[f"conv{i}_w"], "bias": w[f"conv{i}_b"]},
            "bn": {"scale": bns[i].weight.detach().numpy(),
                   "bias": bns[i].bias.detach().numpy()},
        }
        batch_stats[f"mlp_{i}"] = {"bn": {
            "mean": np.zeros(width, np.float32),
            "var": np.ones(width, np.float32),
        }}
    model = PointNetSetAbstraction(npoint=16, radius=0.0, nsample=K, mlp=mlp,
                                   knn=True)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
    }

    # train mode: outputs + BN running stats after one step
    ref_xyz, ref_feats = torch_set_abstraction(w, bns, _t(xyz), _t(points),
                                               16, K, training=True)
    (new_xyz, feats), mut = model.apply(
        variables, jnp.asarray(xyz), jnp.asarray(points),
        deterministic=False, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(new_xyz), ref_xyz.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(),
                               rtol=1e-4, atol=1e-5)
    for i in range(len(mlp)):
        got = mut["batch_stats"][f"mlp_{i}"]["bn"]
        np.testing.assert_allclose(np.asarray(got["mean"]),
                                   bns[i].running_mean.numpy(),
                                   rtol=1e-4, atol=1e-6)
        # torch folds the UNbiased batch var into running stats, flax the
        # biased one: flax_var = 0.9 + 0.1*biased, torch rv = 0.9 +
        # 0.1*unbiased, biased = unbiased*(c-1)/c with c elems per channel
        c = B * 16 * K
        expected = 0.9 + (bns[i].running_var.numpy() - 0.9) * (c - 1) / c
        np.testing.assert_allclose(np.asarray(got["var"]), expected,
                                   rtol=1e-4, atol=1e-6)

    # eval mode with non-trivial running stats
    for bn in bns:
        with torch.no_grad():
            bn.running_mean.copy_(_t(_w(rng, bn.num_features)))
            bn.running_var.copy_(_t(1.0 + 0.5 * rng.rand(bn.num_features)
                                    .astype(np.float32)))
    stats2 = {f"mlp_{i}": {"bn": {"mean": bns[i].running_mean.numpy(),
                                  "var": bns[i].running_var.numpy()}}
              for i in range(len(mlp))}
    ref_xyz, ref_feats = torch_set_abstraction(w, bns, _t(xyz), _t(points),
                                               16, K, training=False)
    new_xyz, feats = model.apply(
        {"params": variables["params"],
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats2)},
        jnp.asarray(xyz), jnp.asarray(points), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# 3. TransitionDown / TransitionUp (Hengshuang/model.py:7-47)
# ---------------------------------------------------------------------------

def test_transition_down_matches_torch(rng):
    """TransitionDown is SA(npoint=k, knn=True) with channels (in, mid, out)."""
    channels = (DP + 3, 24, 24)
    w = {f"conv{i}_w": _w(rng, [channels[0], 24][i], channels[i + 1])
         for i in range(2)}
    w.update({f"conv{i}_b": _w(rng, channels[i + 1]) for i in range(2)})
    bns = [torch.nn.BatchNorm2d(c) for c in channels[1:]]

    xyz = rng.rand(B, N, 3).astype(np.float32)
    points = _w(rng, B, N, DP)
    ref_xyz, ref_feats = torch_set_abstraction(w, bns, _t(xyz), _t(points),
                                               16, K, training=False)

    params = {"sa": {}}
    stats = {"sa": {}}
    for i in range(2):
        params["sa"][f"mlp_{i}"] = {
            "conv": {"kernel": w[f"conv{i}_w"], "bias": w[f"conv{i}_b"]},
            "bn": {"scale": np.ones(channels[i + 1], np.float32),
                   "bias": np.zeros(channels[i + 1], np.float32)},
        }
        stats["sa"][f"mlp_{i}"] = {"bn": {
            "mean": np.zeros(channels[i + 1], np.float32),
            "var": np.ones(channels[i + 1], np.float32),
        }}
    td = TransitionDown(k=16, nneighbor=K, channels=channels)
    new_xyz, feats = td.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(xyz), jnp.asarray(points), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(new_xyz), ref_xyz.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(),
                               rtol=1e-4, atol=1e-5)


def torch_transition_up(w, coarse_xyz, coarse_f, fine_xyz, fine_f):
    """fc1/fc2 Linear+BN1d(eval)+ReLU; 3-NN inverse-distance upsample of the
    coarse branch onto the fine xyz (Hengshuang/model.py:16-47 with
    PointNetFeaturePropagation(-1, []) semantics, pointnet_util.py:398-417)."""
    def branch(x, p):
        h = x @ _t(w[f"{p}_w"]) + _t(w[f"{p}_b"])
        return F.relu(h)  # BN is identity at init stats (scale 1, bias 0)

    feats1 = branch(coarse_f, "fc1")
    feats2 = branch(fine_f, "fc2")
    d = torch_square_distance(fine_xyz, coarse_xyz)
    dists, idx = d.sort(dim=-1)
    dists, idx = dists[:, :, :3], idx[:, :, :3]
    recip = 1.0 / (dists + 1e-8)
    weight = recip / recip.sum(-1, keepdim=True)
    up = torch.sum(torch_index_points(feats1, idx) * weight[..., None], dim=2)
    return up + feats2


def test_transition_up_matches_torch(rng):
    S = 16
    dim_out = 24
    w = {"fc1_w": _w(rng, 40, dim_out), "fc1_b": _w(rng, dim_out),
         "fc2_w": _w(rng, DP, dim_out), "fc2_b": _w(rng, dim_out)}
    coarse_xyz = rng.rand(B, S, 3).astype(np.float32)
    coarse_f = _w(rng, B, S, 40)
    fine_xyz = rng.rand(B, N, 3).astype(np.float32)
    fine_f = _w(rng, B, N, DP)

    ref = torch_transition_up(w, _t(coarse_xyz), _t(coarse_f),
                              _t(fine_xyz), _t(fine_f))

    def lin(p):
        return {"fc": {"kernel": w[f"{p}_w"], "bias": w[f"{p}_b"]},
                "bn": {"scale": np.ones(dim_out, np.float32),
                       "bias": np.zeros(dim_out, np.float32)}}

    stats = {p: {"bn": {"mean": np.zeros(dim_out, np.float32),
                        "var": np.ones(dim_out, np.float32)}}
             for p in ("fc1", "fc2")}
    tu = TransitionUp(dim_out=dim_out)
    out = tu.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray,
                                          {"fc1": lin("fc1"), "fc2": lin("fc2")}),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(coarse_xyz), jnp.asarray(coarse_f),
        jnp.asarray(fine_xyz), jnp.asarray(fine_f), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-4, atol=1e-5)

"""Set-abstraction module variants: ball query, RelPos, multi-scale, group_all."""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.nn.set_abstraction import (
    PointNetFeaturePropagation,
    PointNetSetAbstraction,
    PointNetSetAbstractionMsg,
    PointNetSetAbstractionRelPos,
)


def _data(rng, B=2, N=64, D=8):
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    return xyz, feats


def test_sa_ball_query(rng):
    xyz, feats = _data(rng)
    sa = PointNetSetAbstraction(npoint=16, radius=0.4, nsample=8,
                                mlp=(16, 32), group_all=False, knn=False)
    variables = jax.jit(sa.init)(jax.random.key(0), xyz, feats)
    new_xyz, out = sa.apply(variables, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 32)


def test_sa_group_all(rng):
    xyz, feats = _data(rng)
    sa = PointNetSetAbstraction(npoint=0, radius=0.0, nsample=0,
                                mlp=(16,), group_all=True)
    variables = jax.jit(sa.init)(jax.random.key(0), xyz, feats)
    new_xyz, out = sa.apply(variables, xyz, feats)
    assert new_xyz.shape == (2, 1, 3)
    assert out.shape == (2, 1, 16)


def test_sa_relpos(rng):
    xyz, feats = _data(rng)
    sa = PointNetSetAbstractionRelPos(npoint=16, radius=0.0, nsample=8,
                                      mlp=(16, 32), group_all=False, knn=True)
    variables = jax.jit(sa.init)(jax.random.key(0), xyz, feats)
    new_xyz, out = sa.apply(variables, xyz, feats)
    assert out.shape == (2, 16, 32)
    # per-layer pos-embed MLPs exist (pointnet_util.py:298)
    assert "pos_embed_0" in variables["params"]
    assert "pos_embed_1" in variables["params"]


def test_sa_msg_multi_scale(rng):
    xyz, feats = _data(rng)
    sa = PointNetSetAbstractionMsg(
        npoint=16, radius_list=(0.2, 0.4), nsample_list=(4, 8),
        mlp_list=((8, 16), (8, 32)),
    )
    variables = jax.jit(sa.init)(jax.random.key(0), xyz, feats)
    new_xyz, out = sa.apply(variables, xyz, feats)
    assert out.shape == (2, 16, 16 + 32)  # concat over scales


def test_feature_propagation_with_mlp(rng):
    xyz1, feats1 = _data(rng, N=64)
    xyz2, feats2 = _data(rng, N=16)
    fp = PointNetFeaturePropagation(mlp=(24,))
    variables = jax.jit(fp.init)(jax.random.key(0), xyz1, xyz2, feats1, feats2)
    out = fp.apply(variables, xyz1, xyz2, feats1, feats2)
    assert out.shape == (2, 64, 24)
    # without skip features (separate init: concat width differs)
    v2 = jax.jit(fp.init)(jax.random.key(0), xyz1, xyz2, None, feats2)
    out2 = fp.apply(v2, xyz1, xyz2, None, feats2)
    assert out2.shape == (2, 64, 24)

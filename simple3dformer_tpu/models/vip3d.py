"""ViP-3D: Vision Permutator for voxel grids (3D MLP-mixer).

Reference: /root/reference/models/vip_3d.py. WeightedPermuteMLP mixes along
H / W / Z / C with segment reshapes and a softmax reweight gate; stages of
PermutatorBlocks with optional Conv3d Downsample between them; optional PEG
positional conv (PosCNN) after the first block of each stage; mean-pool head.

Reference quirks mirrored on purpose:
  * the Z-axis mix reuses mlp_w — mlp_z exists but is never called
    (vip_3d.py:76). We replicate (and do not create the dead mlp_z params).
  * the H-mix un-permute is NOT the inverse of its forward permute: the
    reference restores with permute(0, 4, 2, 3, 1, 5) (vip_3d.py:71) where
    the true inverse is (0, 4, 3, 2, 1, 5) — the h-branch output lands with
    its W and Z axes swapped (silent because W == Z in size; the w/z
    branches use proper involutions). Mirrored for exact checkpoint/forward
    parity — verified against the reference's own code in
    tests/test_reference_parity.py.
  * the axis-mix reshape chain assumes a cubic token grid (H == W == Z) and
    H * (C // segment_dim) == C, i.e. H == segment_dim at each stage
    (true for every published vip3d_* config).

TPU notes: every mix is a reshape + one Dense over the folded last axis — all
MXU matmuls; the downsample convs have kernel == stride and lower to
patchify-matmul like the voxel tokenizers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import DropPath, Mlp, dense, trunc_normal_init
from ..ops.pointops import _env_switch


class _DenseParams(nn.Module):
    """Declare an nn.Dense-shaped parameter set (kernel [in, out] + optional
    bias) without the Dense forward, so einsum paths can share the exact
    param tree (same names/shapes/init) with the reference-shaped path."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init,
                       (self.in_features, self.out_features))
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,))
             if self.use_bias else None)
        return k, b


def _chain_h(x, k2, seg):
    """Literal h-branch transpose chain (vip_3d.py:57-71), bias-free:
    linear in x for fixed k2 and linear in k2 for fixed x."""
    B, H, W, Z, C = x.shape
    S, T = C // seg, C // H
    h = (x.reshape(B, H, W, Z, seg, S).transpose(0, 4, 3, 2, 1, 5)
         .reshape(B, seg, Z, W, H * S) @ k2)
    # W/Z-swapped restore (vip_3d.py:71)
    return (h.reshape(B, seg, Z, W, H, T).transpose(0, 4, 2, 3, 1, 5)
            .reshape(B, H, W, Z, C))


def _chain_w(x, k2, seg):
    B, H, W, Z, C = x.shape
    S, T = C // seg, C // W
    w = (x.reshape(B, H, W, Z, seg, S).transpose(0, 1, 4, 3, 2, 5)
         .reshape(B, H, seg, Z, W * S) @ k2)
    return (w.reshape(B, H, seg, Z, W, T).transpose(0, 1, 4, 3, 2, 5)
            .reshape(B, H, W, Z, C))


def _chain_z(x, k2, seg):
    B, H, W, Z, C = x.shape
    S, T = C // seg, C // Z
    z = (x.reshape(B, H, W, Z, seg, S).transpose(0, 2, 1, 4, 3, 5)
         .reshape(B, W, H, seg, Z * S) @ k2)
    return (z.reshape(B, W, H, seg, Z, T).transpose(0, 2, 1, 4, 3, 5)
            .reshape(B, H, W, Z, C))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _axis_mixes_hybrid(seg, x6, w4h, w4w):
    """Hybrid-VJP axis mixes (default ON; S3F_VIP_MIXVJP=0 opts out —
    BASELINE round-4a, interleaved A/B won every trial):
    FORWARD is the einsum formulation (measured −28% vs the transpose
    chain); BACKWARD is `jax.linear_transpose` of the literal chain — the
    cotangent program autodiff-of-einsum produced measured ~1.6 ms slower
    than the chain's own backward at vip3d_s7 stage-0 shapes, so each
    direction uses its measured-faster formulation. Both formulations are
    the same linear map (FP reassociation aside), so gradients match
    autodiff to float tolerance (tests/test_vip3d.py)."""
    h6 = jnp.einsum("bhwzsi,higt->bgzwst", x6, w4h)
    w6 = jnp.einsum("bhwzsi,wigt->bhgzst", x6, w4w)
    z6 = jnp.einsum("bhwzsi,zigt->bhwgst", x6, w4w)
    return h6, w6, z6


def _axis_mixes_fwd(seg, x6, w4h, w4w):
    return _axis_mixes_hybrid(seg, x6, w4h, w4w), (x6, w4h, w4w)


def _axis_mixes_bwd(seg, res, g):
    x6, w4h, w4w = res
    B, H, W, Z, s_, S = x6.shape
    C = s_ * S
    x = x6.reshape(B, H, W, Z, C)
    kh2 = w4h.reshape(C, C)
    kw2 = w4w.reshape(C, C)
    # the 6-D einsum outputs are bit-identical memory layouts of the
    # chain's [B,H,W,Z,C] outputs — reshape the cotangents accordingly
    dh, dw_, dz = (t.reshape(B, H, W, Z, C) for t in g)
    lt = jax.linear_transpose
    dx = (lt(lambda xx: _chain_h(xx, kh2, seg), x)(dh)[0]
          + lt(lambda xx: _chain_w(xx, kw2, seg), x)(dw_)[0]
          + lt(lambda xx: _chain_z(xx, kw2, seg), x)(dz)[0])
    dkh = lt(lambda kk: _chain_h(x, kk, seg), kh2)(dh)[0]
    dkw = (lt(lambda kk: _chain_w(x, kk, seg), kw2)(dw_)[0]
           + lt(lambda kk: _chain_z(x, kk, seg), kw2)(dz)[0])
    return (dx.reshape(x6.shape), dkh.reshape(w4h.shape),
            dkw.reshape(w4w.shape))


_axis_mixes_hybrid.defvjp(_axis_mixes_fwd, _axis_mixes_bwd)


class WeightedPermuteMLP(nn.Module):
    """Axis-mixing MLP with a 4-way softmax reweight gate (vip_3d.py:43-88).

    Two mathematically identical execution paths (same params, same sums,
    FP reassociation aside):

      * einsum (default on): each axis mix is ONE two-axis-contraction
        einsum over the unfolded [B,H,W,Z,seg,S] tensor — the reference's
        6-D transpose -> fold -> dense -> unfold -> transpose chain is
        expressed as output-axis placement inside the einsum (the W/Z-swap
        quirk becomes the 'bgzwst' output order of the h branch), letting
        XLA fuse the layout work into the contraction instead of
        materializing transposed copies. Round-4 attribution measured the
        explicit-transpose branch at ~3x the cost of its same-FLOP channel
        dense (0.28 vs 0.09 ms at stage-0 shapes) — pure data movement.
      * reference-shaped (S3F_VIP_EINSUM=0): the literal transpose chain,
        kept for readable parity with vip_3d.py:57-76 and as the oracle
        for the equality test (tests/test_vip3d.py).
    """

    segment_dim: int = 8
    qkv_bias: bool = False
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, H, W, Z, C = x.shape
        seg = self.segment_dim
        # Both execution paths (and the reference's own chain, vip_3d.py:
        # 57-76) fold [axis, S] onto a [C, C] dense, which only type-checks
        # when the token grid is cubic with H == segment_dim — the implicit
        # constraint of every published vip3d_* config (8^3 grid at stage 0,
        # 4^3 after the transition). Assert it here so a non-conforming grid
        # fails with a clear message instead of an opaque einsum shape error
        # (ADVICE r4).
        assert H == W == Z == seg, (
            f"WeightedPermuteMLP needs a cubic token grid with "
            f"H == W == Z == segment_dim; got grid {H}x{W}x{Z}, "
            f"segment_dim {seg} (see models/vip3d.py docstring)")
        S = C // seg
        T = C // H

        use_einsum = _env_switch("S3F_VIP_EINSUM")
        if use_einsum is None:
            use_einsum = True

        if use_einsum:
            kh, bh = _DenseParams(C, C, self.qkv_bias, name="mlp_h")()
            kw, bw = _DenseParams(C, C, self.qkv_bias, name="mlp_w")()
            cdt = self.dtype or x.dtype
            x6 = x.reshape(B, H, W, Z, seg, S).astype(cdt)
            # kernel [C_in, C_out] unfolds to [axis, S, axis_out, T] (the
            # folded token axis is major: in = h*S + i, out = g*T + t)
            w4h = kh.reshape(H, S, H, T).astype(cdt)
            w4w = kw.reshape(W, S, W, T).astype(cdt)
            # h mix: output order bgzwst IS the reference's W/Z-swapped
            # restore (vip_3d.py:71) — g lands on the H axis, z on W, w on Z
            # Z mix reuses mlp_w — reference quirk (vip_3d.py:75-76)
            if _env_switch("S3F_VIP_MIXVJP") is not False:
                # default ON: einsum forward + chain-transpose backward —
                # interleaved A/B (scripts/ab_vip3d_mixvjp.py, 2026-08-19)
                # won every trial: production 18.25 vs 18.41 ms, fwd+bwd
                # 16.85 vs 17.69 ms. S3F_VIP_MIXVJP=0 opts out.
                h6, w6, z6 = _axis_mixes_hybrid(seg, x6, w4h, w4w)
            else:
                h6 = jnp.einsum("bhwzsi,higt->bgzwst", x6, w4h)
                w6 = jnp.einsum("bhwzsi,wigt->bhgzst", x6, w4w)
                z6 = jnp.einsum("bhwzsi,zigt->bhwgst", x6, w4w)
            if self.qkv_bias:
                # dense bias indexes the folded output features (g, t):
                # broadcast against each branch's g-axis position
                h6 = h6 + bh.reshape(1, H, 1, 1, 1, T).astype(cdt)
                w6 = w6 + bw.reshape(1, 1, W, 1, 1, T).astype(cdt)
                z6 = z6 + bw.reshape(1, 1, 1, Z, 1, T).astype(cdt)
            h = h6.reshape(B, H, W, Z, C)
            w = w6.reshape(B, H, W, Z, C)
            z = z6.reshape(B, H, W, Z, C)
        else:
            mlp_h = dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                          name="mlp_h")
            mlp_w = dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                          name="mlp_w")

            h = x.reshape(B, H, W, Z, seg, S).transpose(0, 4, 3, 2, 1, 5)
            h = mlp_h(h.reshape(B, seg, Z, W, H * S))
            # (0,4,2,3,1,5), not the true inverse (0,4,3,2,1,5): the
            # reference's W/Z-swapped h-branch restore (vip_3d.py:71).
            h = h.reshape(B, seg, Z, W, H, T).transpose(0, 4, 2, 3, 1, 5)
            h = h.reshape(B, H, W, Z, C)

            w = x.reshape(B, H, W, Z, seg, S).transpose(0, 1, 4, 3, 2, 5)
            w = mlp_w(w.reshape(B, H, seg, Z, W * S))
            w = w.reshape(B, H, seg, Z, W, T).transpose(0, 1, 4, 3, 2, 5)
            w = w.reshape(B, H, W, Z, C)

            # Z mix reuses mlp_w — reference quirk (vip_3d.py:75-76)
            z = x.reshape(B, H, W, Z, seg, S).transpose(0, 2, 1, 4, 3, 5)
            z = mlp_w(z.reshape(B, W, H, seg, Z * S))
            z = z.reshape(B, W, H, seg, Z, T).transpose(0, 2, 1, 4, 3, 5)
            z = z.reshape(B, H, W, Z, C)

        mlp_c = dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="mlp_c")
        c = mlp_c(x)

        a = jnp.mean((h + w + z + c).reshape(B, -1, C), axis=1)  # [B, C]
        a = Mlp(hidden_features=C // 3, out_features=C * 4, dtype=self.dtype,
                name="reweight")(a, deterministic=deterministic)
        a = a.reshape(B, C, 4).transpose(2, 0, 1)
        a = jax.nn.softmax(a, axis=0)[:, :, None, None, None, :]

        out = h * a[0] + w * a[1] + z * a[2] + c * a[3]
        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class PermutatorBlock(nn.Module):
    segment_dim: int
    mlp_ratio: float = 3.0
    qkv_bias: bool = False
    drop_path: float = 0.0
    skip_lam: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        C = x.shape[-1]
        h = nn.LayerNorm(name="norm1")(x)
        h = WeightedPermuteMLP(
            segment_dim=self.segment_dim, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic) / self.skip_lam
        h = nn.LayerNorm(name="norm2")(x)
        h = Mlp(hidden_features=int(C * self.mlp_ratio), out_features=C,
                dtype=self.dtype, name="mlp")(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic) / self.skip_lam
        return x


class Downsample(nn.Module):
    """Conv3d(k=s=patch) between stages (vip_3d.py:125-136) as patchify-matmul."""

    out_dim: int
    patch: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, Z, C = x.shape
        p = self.patch
        if p == 1:
            return dense(self.out_dim, use_bias=False, dtype=self.dtype,
                         name="proj")(x)
        g = H // p
        x = x.reshape(B, g, p, g, p, g, p, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, g, g, g, p ** 3 * C)
        return dense(self.out_dim, use_bias=False, dtype=self.dtype, name="proj")(x)


class PosCNN(nn.Module):
    """PEG positional encoding: depthwise Conv3d k3 s1 + residual
    (vip_3d.py:155-169, from Twins)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, Z, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, 1, C)
        )
        bias = self.param("bias", nn.initializers.zeros, (C,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C,
        ) + bias
        return y + x


VIP3D_CONFIGS = {
    # layers, transitions, segment_dim, mlp_ratios, embed_dims (vip_3d.py:269-318)
    "vip3d_s7": dict(layers=[4, 3, 8, 3], transitions=[True, False, False, False],
                     segment_dim=[8, 4, 4, 4], mlp_ratios=[3, 3, 3, 3],
                     embed_dims=[192, 384, 384, 384]),
    "vip3d_s14": dict(layers=[4, 3, 8, 3], transitions=[False, False, False, False],
                      segment_dim=[8, 8, 8, 8], mlp_ratios=[3, 3, 3, 3],
                      embed_dims=[384, 384, 384, 384]),
    "vip3d_m7": dict(layers=[4, 3, 14, 3], transitions=[False, True, False, False],
                     segment_dim=[8, 8, 4, 4], mlp_ratios=[3, 3, 3, 3],
                     embed_dims=[256, 256, 512, 512]),
    "vip3d_l7": dict(layers=[8, 8, 16, 4], transitions=[True, False, False, False],
                     segment_dim=[8, 4, 4, 4], mlp_ratios=[3, 3, 3, 3],
                     embed_dims=[256, 512, 512, 512]),
}


class VisionPermutator3D(nn.Module):
    """Stages of PermutatorBlocks over a [B,H,W,Z,C] voxel-token volume."""

    embed_layer: Any  # VoxelEmbedNoAverage-like module -> [B,p,p,p,C]
    layers: Sequence[int]
    embed_dims: Sequence[int]
    transitions: Sequence[bool]
    segment_dim: Sequence[int]
    mlp_ratios: Sequence[float]
    num_classes: int = 1000
    skip_lam: float = 1.0
    qkv_bias: bool = False
    drop_path_rate: float = 0.0
    pos_embedding: Optional[str] = None  # None | 'PEG'
    dtype: Optional[jnp.dtype] = None

    @classmethod
    def from_name(cls, name: str, embed_layer, num_classes: int, **kw):
        return cls(embed_layer=embed_layer, num_classes=num_classes,
                   **VIP3D_CONFIGS[name], **kw)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x [B, V, V, V] occupancy -> [B, num_classes]."""
        x = self.embed_layer(x)  # [B, p, p, p, C]
        total = sum(self.layers)
        done = 0
        for i, n_blocks in enumerate(self.layers):
            for b in range(n_blocks):
                dpr = self.drop_path_rate * (done + b) / max(total - 1, 1)
                x = PermutatorBlock(
                    segment_dim=self.segment_dim[i],
                    mlp_ratio=self.mlp_ratios[i],
                    qkv_bias=self.qkv_bias,
                    drop_path=dpr,
                    skip_lam=self.skip_lam,
                    dtype=self.dtype,
                    name=f"stage{i}_block{b}",
                )(x, deterministic=deterministic)
                if self.pos_embedding == "PEG" and b == 0:
                    x = PosCNN(dtype=self.dtype, name=f"stage{i}_peg")(x)
            done += n_blocks
            if i < len(self.layers) - 1 and (
                self.transitions[i] or self.embed_dims[i] != self.embed_dims[i + 1]
            ):
                patch = 2 if self.transitions[i] else 1
                x = Downsample(self.embed_dims[i + 1], patch, dtype=self.dtype,
                               name=f"downsample{i}")(x)
        B = x.shape[0]
        x = x.reshape(B, -1, x.shape[-1])
        x = nn.LayerNorm(name="norm")(x)
        return dense(self.num_classes, dtype=self.dtype, name="head")(
            jnp.mean(x, axis=1)
        )

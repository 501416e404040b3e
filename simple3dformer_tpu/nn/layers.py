"""Shared NN building blocks (internalizing the reference's timm dependency).

The reference pulls VisionTransformer internals from timm (SURVEY §2.7):
Mlp / Attention / Block / DropPath / trunc_normal init. Rebuilt here as flax
modules designed for the MXU: attention is plain batched matmuls (seq lengths
are tiny — ≤197 image tokens, ≤1025 point tokens, SURVEY §5.7 — so dense
[B,H,N,N] attention is the right TPU shape; no flash/ring machinery needed).

Compute dtype is configurable (bfloat16 on TPU); parameters stay float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# timm-style initializers: trunc_normal(std=0.02) weights, zero bias.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def dense(features: int, use_bias: bool = True, dtype=None, name=None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=trunc_normal_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> drop -> fc2 -> drop."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Optional[jnp.dtype] = None
    act: Callable = nn.gelu

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


# Flash-attention switch: OPT-IN via S3F_FLASH=1 (or USE_FLASH = True).
# Measured on v5e at the S3DIS core shape (B=4, 1025 tokens, deit_base,
# bf16, honest protocol): stock Pallas flash f/b 43.6 ms (block 384; 90.7 at
# block 128) vs 30.5 ms for the einsum path — at seq ~1k with head_dim 64
# and B*H=48-way parallelism the [B,H,N,N] materialization XLA emits is
# cheaper than flash's blocked recomputation, so flash stays off by default
# on this hardware. The path is kept (and still auto-guarded to seq >= 256)
# for long-sequence work on bigger chips. Skipped regardless when attention
# dropout is active or the caller asked for the attention matrix
# (mutable=['intermediates'] rollout capture) — flash never materializes it.
USE_FLASH: bool | None = None
_FLASH_BLOCK = 384

# VMEM-resident MHSA kernel switch (kernels/mhsa.py): OPT-IN via S3F_MHSA=1.
# Measured on v5e at the S3DIS core shape (floor-corrected honest protocol):
# standalone attention f/b 1.2 ms kernel vs 0.78 ms einsum, and the full
# 12-block core is unchanged (30.5 ms both ways) — XLA's einsum path already
# runs the narrow-head_dim attention at its ~50 TFLOP/s hardware ceiling and
# the [B,H,N,N] HBM round-trips are NOT the bottleneck at N ~ 1k. Kept for
# shapes where VMEM-resident rows might win (bigger N, tiny D budgets).
USE_MHSA: bool | None = None


def _flash_attention(q, k, v, scale):
    """Stock Pallas TPU flash attention on [B, N, H, D] tensors.

    Pads N up to a multiple of 128 and masks the padding with segment ids
    (pad tokens only attend each other; their rows are sliced off). 1025
    tokens (the S3DIS/partseg ViT cores) pad to 1152 — 1.26x block FLOPs vs
    the 2.25x a 512-multiple pad would cost.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, N, H, D = q.shape
    npad = ((N + _FLASH_BLOCK - 1) // _FLASH_BLOCK) * _FLASH_BLOCK

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)  # [B, H, Npad, D]

    ids = jnp.broadcast_to(
        (jnp.arange(npad) < N).astype(jnp.int32), (B, npad))
    blk = min(_FLASH_BLOCK, npad)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    out = flash_attention(prep(q), prep(k), prep(v),
                          segment_ids=SegmentIds(q=ids, kv=ids),
                          sm_scale=scale, block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :N]  # [B, N, H, D]


class Attention(nn.Module):
    """Multi-head self-attention with a packed qkv projection.

    Matches the timm layout the reference checkpoints use: one qkv Dense of
    width 3*dim whose rows order as (q, k, v), then an output projection.
    NOTE the reference runs deit_base with num_heads=3 (a quirk of its config
    dicts, /root/reference/models/vit_3d_2d_pretrain.py:302) — heads are a
    constructor arg here and parity configs mirror that.

    The default compute path is the dense einsum — measured at the hardware
    ceiling for this framework's shapes (BASELINE.md round-2d). Two opt-in
    Pallas alternatives exist for other regimes: S3F_FLASH=1 (stock flash)
    and S3F_MHSA=1 (kernels/mhsa.py), both guarded to inactive attention
    dropout and no rollout capture.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 seg_len: Optional[int] = None):
        from ..ops import pointops

        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5

        # seg_len: block-diagonal sequence packing (static). When several
        # short sequences of length seg_len are concatenated into one row,
        # masking attention to within-segment makes the packed pass exactly
        # equal to the per-sequence pass (LayerNorm/MLP are per-token) while
        # the attention matmuls run at MXU-tile-filling sizes instead of
        # degenerate [seg_len, seg_len] ones. See models/voxel_vit.py
        # group_embed (the [3136, 15]-token stage-1) for the motivating shape.
        packed = seg_len is not None and 0 < seg_len < N

        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each [B, N, H, D]

        # `deterministic` may be a traced value under jit; treat anything
        # non-static as "dropout possibly live" so we never branch on a tracer
        det_static = isinstance(deterministic, bool) and deterministic
        plain_ok = ((self.attn_drop == 0.0 or det_static)
                    and not self.is_mutable_collection("intermediates")
                    and head_dim % 64 == 0
                    and not packed)  # kernels don't take the segment mask
        use_flash = USE_FLASH
        if use_flash is None:
            use_flash = bool(pointops._env_switch("S3F_FLASH")) and \
                pointops._use_pallas("S3F_PALLAS", None, N)
        use_flash = use_flash and plain_ok
        use_mhsa = USE_MHSA
        if use_mhsa is None:
            use_mhsa = bool(pointops._env_switch("S3F_MHSA")) and \
                pointops._use_pallas("S3F_PALLAS", None, N)
        use_mhsa = use_mhsa and plain_ok and N <= 2048 and not use_flash
        if use_flash:
            out = _flash_attention(q, k, v, scale).reshape(B, N, C)
        elif use_mhsa:
            from ..kernels.mhsa import mhsa

            out = mhsa(q, k, v, scale).reshape(B, N, C)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            if packed:
                seg = jnp.arange(N) // seg_len
                same = seg[:, None] == seg[None, :]
                attn = jnp.where(same, attn, -jnp.inf)
            attn = jax.nn.softmax(attn, axis=-1)
            # exposed for attention-rollout visualization (the reference's
            # forward hooks on blk.attn, visualize_attention_map_voxel.py:144);
            # only materialized when apply() is called with
            # mutable=['intermediates']
            self.sow("intermediates", "attn", attn)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)

        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per-sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


# Fused whole-block kernel switch (kernels/vit_block.py): OPT-IN via
# S3F_FUSED_BLOCK=1 (or USE_FUSED_BLOCK = True). Final verdict at the
# flagship shape (deit_small, B=32, N=26, f32, clean repeated A/B with the
# floor-corrected protocol): 12-block forward 0.31 ms fused vs 0.37 ms XLA
# (small real win); f/b 1.49-1.52 ms BOTH paths (parity — the residual-
# saving hybrid backward exactly matches XLA's residual backward cost); and
# INSIDE the scanned train step the fused path measures net-NEGATIVE
# (12.7k vs 13.9k samples/sec e2e at unroll=4: the ~150 MB of per-step
# fwd->bwd residuals interact badly with XLA's while-loop buffer
# assignment). Round-3 second data point at the opposite shape extreme
# (group_embed stage-1: 3,136 seqs x 15 tokens): isolation f/b 175 vs
# 226 ms (-23%, bit-exact) yet the FULL train step is parity for BOTH
# backward variants — the pallas_call boundary forfeits XLA's cross-
# component fusion/overlap (BASELINE.md round-3). XLA compiles this
# tiny-sequence core well; the kernel ships opt-in, fully tested, for
# shapes/backends where the balance differs.
USE_FUSED_BLOCK: bool | None = None
_FUSED_TILE = 104


class Block(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None

    def _fused_weights(self):
        p = self.variables["params"]
        return dict(
            ln1_s=p["norm1"]["scale"], ln1_b=p["norm1"]["bias"],
            wqkv=p["attn"]["qkv"]["kernel"], bqkv=p["attn"]["qkv"]["bias"],
            wproj=p["attn"]["proj"]["kernel"],
            bproj=p["attn"]["proj"]["bias"],
            ln2_s=p["norm2"]["scale"], ln2_b=p["norm2"]["bias"],
            w1=p["mlp"]["fc1"]["kernel"], b1=p["mlp"]["fc1"]["bias"],
            w2=p["mlp"]["fc2"]["kernel"], b2=p["mlp"]["fc2"]["bias"],
        )

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 seg_len: Optional[int] = None):
        from ..ops import pointops

        dim = x.shape[-1]
        N = x.shape[-2]
        # `deterministic` may be a traced value under jit; only a static
        # python True can steer dispatch
        det_static = isinstance(deterministic, bool) and deterministic
        use_fused = USE_FUSED_BLOCK
        if use_fused is None:
            use_fused = (bool(pointops._env_switch("S3F_FUSED_BLOCK"))
                         and jax.default_backend() == "tpu")
        if use_fused and x.ndim == 3:
            from ..kernels.vit_block import _tile_rows

            # the odd-N fallback packs s=8 samples per tile; cap the row-tile
            # so the per-head [T, T] probs stay within the VMEM budget. Must
            # evaluate the SAME tile target the dispatch below passes
            # (_FUSED_TILE), not _tile_rows' default: for even N in ~130-256
            # not divisible by 8 the two targets select different s and the
            # guard would approve a shape the kernel then falls back on.
            _s, _ = _tile_rows(x.shape[0], N, _FUSED_TILE)
            use_fused = _s * N <= 1024
        use_fused = (
            use_fused
            and not self.is_initializing()
            and x.ndim == 3
            and N <= 512
            and dim % 128 == 0
            and dim % self.num_heads == 0
            and self.mlp_ratio == 4.0
            and self.qkv_bias
            # kernels/vit_block.py hardcodes LayerNorm eps 1e-6 (_EPS); a
            # non-default norm_eps must take the flax path
            and self.norm_eps == 1e-6
            # dropout/droppath must be inactive: identity at rate 0 or eval
            and (det_static or (self.drop == 0.0 and self.attn_drop == 0.0
                                and self.drop_path == 0.0))
            and not self.is_mutable_collection("intermediates")
            # the fused kernel has no segment-mask input; packed sequences
            # must take the flax path (Attention applies the mask there)
            and seg_len is None
        )
        if use_fused:
            from ..kernels.vit_block import (fused_vit_block,
                                             fused_vit_block_train)

            fn = fused_vit_block if det_static else fused_vit_block_train
            return fn(x, self._fused_weights(), self.num_heads, self.dtype,
                      False, _FUSED_TILE)

        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm1")(x)
        h = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic, seg_len=seg_len)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm2")(x)
        h = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            out_features=dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)
        return x


class MlpHead(nn.Module):
    """Stack of Dense+ReLU layers ending in a linear classifier."""

    widths: tuple
    n_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths):
            x = dense(w, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return dense(self.n_out, dtype=self.dtype, name=f"fc{len(self.widths) + 1}")(x)


class AMSoftmaxLayer(nn.Module):
    """Additive-margin softmax head: s * cos(theta) logits.

    Behavior of /root/reference/models/vit_3d_2d_pretrain.py:39-56 — L2-norm
    the features and the weight columns, scaled dot product. The 3DViT variant
    (/root/reference/models/3DViT/model.py:123-142) flattens [B,N,C] inputs
    and restores the shape; handled here by normalizing over the last axis.
    """

    n_classes: int
    s: float = 30.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_feats = x.shape[-1]
        W = self.param(
            "W", nn.initializers.xavier_normal(), (in_feats, self.n_classes)
        )
        x_norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w_norm = jnp.maximum(jnp.linalg.norm(W, axis=0, keepdims=True), 1e-12)
        return ((x / x_norm) @ (W / w_norm).astype(x.dtype)) * self.s

"""Point-Transformer vector self-attention over kNN neighborhoods.

Reference: /root/reference/models/Hengshuang/transformer.py:7-44 (Zhao et al.
Point Transformer). Per query point: kNN in xyz space, subtraction-based
attention softmax(fc_gamma(q - k + pos_enc)) over the K neighbors, channelwise
(vector) weights, aggregation of (v + pos_enc).

TPU notes: the [B, N, K, D] neighborhood tensors are the hot intermediates —
K=16, D=512 for the reference config. Two execution paths:

* XLA (default off-TPU / small N): gathers via take_along_axis, MLPs as
  batched matmuls over the folded [B*N*K, D] layout. XLA cannot fuse
  matmul->matmul chains, so ~6 [B,N,K,D] intermediates round-trip HBM per
  forward and most persist as backward residuals (at B=64,N=1024 each is
  2.1 GB f32 — the measured source of f32 remat/spill collapse, see
  scripts/profile_vector_attention.py).
* Fused Pallas (auto on TPU for N >= 256, same S3F_PALLAS switch as
  ops/pointops): kernels/vector_attention.py runs the whole
  pos-MLP -> gamma-MLP -> softmax -> aggregation chain per VMEM tile with a
  recompute backward — zero [B,N,K,D] residuals, and the k/v neighbor
  gathers run inside the kernel as one-hot MXU matmuls (XLA's gather/
  scatter on this pattern is ~10x off HBM speed-of-light; see
  kernels/vector_attention.py and scripts/honest_profile.py for measured
  numbers). The fused path returns attn=None (every model
  call site discards it); set FORCE_FUSED=False to recover the attention
  maps. Precision deviation: the kernel adds biases and takes ReLU/softmax
  in f32 even when compute dtype is bf16 (flax Dense stays in bf16
  throughout) — strictly tighter numerics.

The softmax scale mirrors the reference exactly: 1/sqrt(d_model) applied to
the attention *logits* over the neighbor axis (transformer.py:40).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from ..kernels.vector_attention import (
    fused_vector_attention, fused_vector_attention_pregathered,
    fused_vector_attention_resid)
from ..ops import pointops
from .layers import dense

# Fused-kernel switch: None = auto (pointops._use_pallas policy: TPU backend,
# N >= 256, S3F_PALLAS env override). True/False force it for tests.
FORCE_FUSED: bool | None = None
# Run the Pallas kernel in interpreter mode (CPU parity tests only).
INTERPRET: bool = False
# Residual-saving backward (bf16 train path): the recompute backward re-runs
# gathers + chain at ~29% of kernel FLOPs while the kernel is MXU-bound
# (~89% of peak measured) — saving 4 [B,N*K,D] tensors removes it (see
# kernels/vector_attention.py). Off via S3F_VA_RESID=0; auto-falls back to
# the recompute kernel when the saved tensors would exceed _RESID_CAP_BYTES
# of HBM per call (flagship level-0 = 4.3 GB of a 16 GB v5e).
_RESID_CAP_BYTES = 6 * 2 ** 30


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear used for fc_delta / fc_gamma."""

    hidden: int
    out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return dense(self.out, dtype=self.dtype, name="fc2")(x)


def _mlp2_weights(tree, prefix):
    return {
        prefix + "1": tree["fc1"]["kernel"], "b" + prefix[1] + "1": tree["fc1"]["bias"],
        prefix + "2": tree["fc2"]["kernel"], "b" + prefix[1] + "2": tree["fc2"]["bias"],
    }


class VectorAttentionBlock(nn.Module):
    """TransformerBlock(d_points, d_model, k) of the reference."""

    d_model: int
    k: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features):
        """xyz [B,N,3], features [B,N,Dp] -> (out [B,N,Dp], attn [B,N,K,Dm]).

        attn is None on the fused-kernel path (see module docstring).
        """
        knn_idx = pointops.knn_indices(xyz, xyz, self.k)  # includes self
        knn_xyz = pointops.index_points(xyz, knn_idx)

        pre = features
        x = dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        q = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(x)
        k_all = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_ks")(x)
        v_all = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_vs")(x)

        fc_delta = MLP2(self.d_model, self.d_model, dtype=self.dtype,
                        name="fc_delta")
        fc_gamma = MLP2(self.d_model, self.d_model, dtype=self.dtype,
                        name="fc_gamma")
        rel = xyz[:, :, None, :] - knn_xyz

        fused = FORCE_FUSED
        if fused is None:
            fused = (pointops._use_pallas("S3F_PALLAS", None, xyz.shape[1])
                     and self.d_model % 128 == 0)
        if fused:
            # Materialize the MLP params without running the big tensors
            # through flax (zero-row calls create/verify them), then hand the
            # raw kernels to the fused Pallas op. Gradients flow through
            # get_variable's traced leaves. The k/v neighbor gathers happen
            # INSIDE the kernel (one-hot MXU matmuls) — nothing [B,N,K,D]
            # sized is ever materialized.
            cd = q.dtype
            fc_delta(jnp.zeros((0, 3), cd))
            fc_gamma(jnp.zeros((0, self.d_model), cd))
            weights = {}
            weights.update(_mlp2_weights(
                self.get_variable("params", "fc_delta"), "wd"))
            weights.update(_mlp2_weights(
                self.get_variable("params", "fc_gamma"), "wg"))
            if cd == jnp.float32:
                # f32: exact in-kernel one-hot gathers need bf16x6 MXU
                # passes — slower than XLA's gather/scatter here, so gather
                # outside and fuse only the chain (kernels module docstring).
                k = pointops.index_points(k_all, knn_idx)
                v = pointops.index_points(v_all, knn_idx)
                res = fused_vector_attention_pregathered(
                    q, k, v, rel.astype(cd), weights, 32, INTERPRET)
            else:
                b, n, kk = knn_idx.shape
                resid_bytes = 4 * b * n * kk * self.d_model * q.dtype.itemsize
                if (os.environ.get("S3F_VA_RESID", "1") != "0"
                        and resid_bytes <= _RESID_CAP_BYTES):
                    res = fused_vector_attention_resid(
                        q, k_all, v_all, knn_idx, rel.astype(cd), weights,
                        32, INTERPRET)
                else:
                    res = fused_vector_attention(
                        q, k_all, v_all, knn_idx, rel.astype(cd), weights,
                        32, INTERPRET)
            attn = None
        else:
            k = pointops.index_points(k_all, knn_idx)  # [B,N,K,Dm]
            v = pointops.index_points(v_all, knn_idx)
            pos_enc = fc_delta(rel)
            attn = fc_gamma(q[:, :, None, :] - k + pos_enc)
            attn = jax.nn.softmax(
                attn / jnp.sqrt(jnp.asarray(self.d_model, attn.dtype)), axis=-2
            )
            res = jnp.sum(attn * (v + pos_enc), axis=2)  # [B,N,Dm]

        res = dense(pre.shape[-1], dtype=self.dtype, name="fc2")(res) + pre
        return res, attn

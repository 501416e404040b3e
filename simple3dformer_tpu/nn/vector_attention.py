"""Point-Transformer vector self-attention over kNN neighborhoods.

Reference: /root/reference/models/Hengshuang/transformer.py:7-44 (Zhao et al.
Point Transformer). Per query point: kNN in xyz space, subtraction-based
attention softmax(fc_gamma(q - k + pos_enc)) over the K neighbors, channelwise
(vector) weights, aggregation of (v + pos_enc).

TPU notes: the [B, N, K, D] neighborhood tensors are the hot intermediates —
K=16, D=512 for the reference config. All gathers are take_along_axis; the
MLPs run as batched matmuls over the folded [B*N*K, D] layout. The softmax
scale mirrors the reference exactly: 1/sqrt(d_model) applied to the attention
*logits* over the neighbor axis (transformer.py:40).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointops
from .layers import dense


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


class VectorAttentionBlock(nn.Module):
    """TransformerBlock(d_points, d_model, k) of the reference."""

    d_model: int
    k: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features):
        """xyz [B,N,3], features [B,N,Dp] -> (out [B,N,Dp], attn [B,N,K,Dm])."""
        knn_idx = pointops.knn_indices(xyz, xyz, self.k)  # includes self
        knn_xyz = pointops.index_points(xyz, knn_idx)

        pre = features
        x = dense(self.d_model, dtype=self.dtype, name="fc1")(features)
        q = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_qs")(x)
        k_all = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_ks")(x)
        v_all = dense(self.d_model, use_bias=False, dtype=self.dtype, name="w_vs")(x)
        k = pointops.index_points(k_all, knn_idx)  # [B,N,K,Dm]
        v = pointops.index_points(v_all, knn_idx)

        pos_enc = MLP2(self.d_model, self.d_model, dtype=self.dtype, name="fc_delta")(
            xyz[:, :, None, :] - knn_xyz
        )
        attn = MLP2(self.d_model, self.d_model, dtype=self.dtype, name="fc_gamma")(
            q[:, :, None, :] - k + pos_enc
        )
        attn = jax.nn.softmax(
            attn / jnp.sqrt(jnp.asarray(self.d_model, attn.dtype)), axis=-2
        )
        res = jnp.sum(attn * (v + pos_enc), axis=2)  # [B,N,Dm]
        res = dense(pre.shape[-1], dtype=self.dtype, name="fc2")(res) + pre
        return res, attn

"""Attention rollout over captured attention maps.

Reference: /root/reference/visualize_attention_map_voxel.py:175-201 (get_mask).
The reference registers forward hooks on every block's attn module; here the
Attention layers `sow` their softmax maps into the 'intermediates' collection,
captured with one extra apply() — no hooks, one jit-compiled forward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def capture_attention(model, variables, x, method=None):
    """Run a forward pass capturing per-block attention maps.

    Returns (output, attn [L, B, H, N, N]) where L = number of blocks.
    """
    out, inter = model.apply(
        dict(variables), x, method=method, mutable=["intermediates"]
    )
    maps = []

    def walk(node):
        if isinstance(node, dict):
            if "attn" in node and isinstance(node["attn"], tuple):
                maps.append(node["attn"][0])
            else:
                for v in node.values():
                    walk(v)

    walk(inter["intermediates"])
    if len(maps) == 1 and maps[0].ndim == 5:
        return out, maps[0]  # scanned core: already stacked [L, B, H, N, N]
    shapes = {m.shape for m in maps}
    if len(shapes) > 1:
        # multi-pass routes (group_embed runs the core twice on different
        # sequence lengths): return the per-pass maps unstacked
        return out, maps
    return out, jnp.stack(maps)


def rollout(att: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """att [L, H, N, N] (one sample) -> (mask [g, g], joint [L, N, N], g).

    Head-mean, add identity for the residual path, row-normalize, multiply
    through the layers; the cls-token row over patch tokens reshaped to the
    sqrt grid — exactly the reference's get_mask.
    """
    att = np.asarray(att)
    att = att.mean(axis=1)  # [L, N, N]
    L, N, _ = att.shape
    aug = att + np.eye(N)
    aug = aug / aug.sum(axis=-1, keepdims=True)

    joint = np.zeros_like(aug)
    joint[0] = aug[0]
    for layer in range(1, L):
        joint[layer] = aug[layer] @ joint[layer - 1]

    grid = int(np.sqrt(N))
    mask = joint[-1][0, 1:].reshape(grid, grid)
    return mask, joint, grid

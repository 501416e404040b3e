"""RandomResizedCrop(224) + RandomHorizontalFlip for the LwF image pathway.

Reference: /root/reference/train_partseg_lwf.py:125-129 (torchvision
transforms applied fresh every epoch by the DataLoader). Two implementations:

  * host (numpy): torchvision's exact get_params algorithm — 10 attempts of
    (area ~ U[scale]*A, log-aspect ~ U[log ratio]) then the center-crop
    fallback clamped to the ratio bounds — followed by a crop + bilinear
    resize. For per-epoch host pipelines on directly-attached hardware.
  * device (jnp): the same parameter distribution sampled with jax.random,
    vectorized over the batch (10 candidates per image, first valid wins),
    and the crop+resize expressed as one jax.image.scale_and_translate with
    traced scale/translation — the XLA-native form that runs inside the
    scanned LwF train step, giving fresh crops EVERY STEP with zero host
    traffic. Deviation (documented): the device path crops from the staged
    fixed canvas (default 256^2) instead of each photo's original resolution;
    crop geometry is relative to (H, W) so the parameter distribution is
    identical, only the source resolution differs (tunnel bandwidth makes
    per-epoch host re-crops of 20k originals infeasible at ~3-5 MB/s).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

SCALE = (0.08, 1.0)
RATIO = (3.0 / 4.0, 4.0 / 3.0)


# ---------------------------------------------------------------------------
# host (numpy) — torchvision RandomResizedCrop.get_params parity
# ---------------------------------------------------------------------------

def random_resized_crop_params(rng, height: int, width: int,
                               scale=SCALE, ratio=RATIO):
    """Sample (i, j, h, w) exactly like torchvision's get_params."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h + 1)
            j = rng.randint(0, width - w + 1)
            return i, j, h, w
    # fallback: central crop clamped into the ratio bounds
    in_ratio = float(width) / float(height)
    if in_ratio < min(ratio):
        w = width
        h = int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        h = height
        w = int(round(h * max(ratio)))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Plain (non-antialiased) half-pixel bilinear resize, [H,W,C] float."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop_flip(img: np.ndarray, rng, size: int = 224,
                             scale=SCALE, ratio=RATIO) -> np.ndarray:
    """uint8 [H,W,C] -> uint8 [size,size,C]: RRC + p=0.5 horizontal flip."""
    i, j, h, w = random_resized_crop_params(rng, img.shape[0], img.shape[1],
                                            scale, ratio)
    out = _bilinear_resize(img[i:i + h, j:j + w].astype(np.float32),
                           size, size)
    if rng.rand() < 0.5:
        out = out[:, ::-1]
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# device (jnp) — same distribution, one scale_and_translate per image
# ---------------------------------------------------------------------------

def _sample_crop_boxes(key, n: int, height: int, width: int, scale, ratio):
    """Vectorized get_params: [n] float boxes (i, j, h, w).

    10 candidates per image; the first whose rounded (h, w) fits wins, else
    the torchvision central fallback. All float32, fully traced."""
    k_area, k_aspect, k_ij = jax.random.split(key, 3)
    area = float(height * width)
    ta = area * jax.random.uniform(k_area, (n, 10), minval=scale[0],
                                   maxval=scale[1])
    log_r = jax.random.uniform(k_aspect, (n, 10),
                               minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    ws = jnp.round(jnp.sqrt(ta * aspect))
    hs = jnp.round(jnp.sqrt(ta / aspect))
    valid = (ws > 0) & (ws <= width) & (hs > 0) & (hs <= height)
    first = jnp.argmax(valid, axis=1)  # first True (0 if none)
    any_valid = jnp.any(valid, axis=1)
    w = jnp.take_along_axis(ws, first[:, None], 1)[:, 0]
    h = jnp.take_along_axis(hs, first[:, None], 1)[:, 0]

    # central fallback (square canvas: in_ratio=1 inside [3/4, 4/3] -> full)
    in_ratio = width / height
    if in_ratio < min(ratio):
        fb_w, fb_h = width, round(width / min(ratio))
    elif in_ratio > max(ratio):
        fb_h, fb_w = height, round(height * max(ratio))
    else:
        fb_w, fb_h = width, height
    w = jnp.where(any_valid, w, float(fb_w))
    h = jnp.where(any_valid, h, float(fb_h))

    u_i, u_j = jax.random.uniform(k_ij, (2, n))
    # torchvision randint(0, H-h+1): floor of uniform over the integer range
    i = jnp.where(any_valid, jnp.floor(u_i * (height - h + 1)),
                  jnp.floor((height - h) / 2))
    j = jnp.where(any_valid, jnp.floor(u_j * (width - w + 1)),
                  jnp.floor((width - w) / 2))
    return i, j, h, w


def device_random_resized_crop_flip(key, images: jnp.ndarray,
                                    size: int = 224, scale=SCALE,
                                    ratio=RATIO) -> jnp.ndarray:
    """uint8/float [B,H,W,C] -> float32 [B,size,size,C], fresh per call.

    Crop+resize as scale_and_translate (linear); flip with p=0.5. Border
    note: torchvision crops THEN resizes (edge-clamped inside the crop);
    expressing both as one sampling pass means output border pixels can blend
    up to one source pixel just outside the crop box — a sub-pixel
    difference confined to the frame, irrelevant for augmentation.
    """
    B, H, W, C = images.shape
    k_box, k_flip = jax.random.split(key)
    i, j, h, w = _sample_crop_boxes(k_box, B, H, W, scale, ratio)

    sy = size / h  # [B]
    sx = size / w
    # scale_and_translate maps in -> out as x_out = x_in * s + t (half-pixel
    # centers); the crop origin (i, j) must land on output 0: t = -i * s.
    def one(img, sy, sx, ty, tx):
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (size, size, C), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([ty, tx]),
            method="linear",
        )

    out = jax.vmap(one)(images, sy, sx, -i * sy, -j * sx)
    flip = jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1))
    return jnp.where(flip, out[:, :, ::-1], out)

"""RandomResizedCrop+flip parity (reference train_partseg_lwf.py:125-129).

torchvision is not installed in this image, so the host implementation is
asserted against torchvision's documented get_params algorithm properties
(geometry bounds, distribution moments, fallback clamping), and the device
implementation is cross-checked against the host bilinear oracle on the
same sampled boxes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from simple3dformer_tpu.data import image_augment as ia


def test_host_crop_params_distribution(rng):
    H = W = 256
    areas, ratios = [], []
    for _ in range(2000):
        i, j, h, w = ia.random_resized_crop_params(rng, H, W)
        assert 0 <= i <= H - h and 0 <= j <= W - w and h > 0 and w > 0
        areas.append(h * w / (H * W))
        ratios.append(w / h)
    areas, ratios = np.asarray(areas), np.asarray(ratios)
    # rounding of sqrt(area*aspect) can push a hair past the nominal bounds
    assert areas.min() >= 0.06 and areas.max() <= 1.0
    assert ratios.min() >= 0.7 and ratios.max() <= 1.43
    # area ~ U[0.08, 1] truncated by attempt rejection (large areas with
    # non-square aspect overflow the canvas and resample) => mean ~ 0.47
    assert 0.43 < areas.mean() < 0.51
    # log-aspect symmetric around 0
    assert abs(np.log(ratios).mean()) < 0.03


def test_host_crop_params_fallback_extreme_aspect(rng):
    # force every attempt to fail: near-full area on an 8:1 canvas means
    # h = sqrt(area) >> height; the central fallback then clamps the ratio
    i, j, h, w = ia.random_resized_crop_params(rng, 64, 512,
                                               scale=(0.99, 1.0))
    assert h == 64 and w == round(64 * 4 / 3)
    assert i == 0 and j == (512 - w) // 2
    # 1:8 canvas clamps to ratio 3/4
    i, j, h, w = ia.random_resized_crop_params(rng, 512, 64,
                                               scale=(0.99, 1.0))
    assert w == 64 and h == round(64 / (3 / 4))
    # square canvas fallback keeps the full image
    i, j, h, w = ia.random_resized_crop_params(rng, 64, 64,
                                               scale=(2.0, 2.0))
    assert (i, j, h, w) == (0, 0, 64, 64)


def test_host_crop_flip_output(rng):
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    out = ia.random_resized_crop_flip(img, np.random.RandomState(0), size=32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    # identity case: crop == full image, no resize change beyond bilinear
    sq = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    res = ia._bilinear_resize(sq.astype(np.float32), 32, 32)
    np.testing.assert_allclose(res, sq.astype(np.float32), atol=1e-4)


def test_device_crop_matches_host_oracle_on_upscale(rng):
    """Small canvas (h,w <= 48 < size=64): pure upscale, where
    scale_and_translate linear == the host half-pixel bilinear exactly."""
    B, H, W, size = 4, 48, 48, 64
    imgs = (rng.rand(B, H, W, 3) * 255).astype(np.uint8)
    key = jax.random.key(3)
    out = np.asarray(ia.device_random_resized_crop_flip(
        key, jnp.asarray(imgs), size=size))
    assert out.shape == (B, size, size, 3)

    k_box, k_flip = jax.random.split(key)
    i, j, h, w = (np.asarray(v) for v in ia._sample_crop_boxes(
        k_box, B, H, W, ia.SCALE, ia.RATIO))
    flips = np.asarray(jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1)))[:, 0, 0, 0]
    for b in range(B):
        crop = imgs[b, int(i[b]):int(i[b] + h[b]),
                    int(j[b]):int(j[b] + w[b])].astype(np.float32)
        want = ia._bilinear_resize(crop, size, size)
        if flips[b]:
            want = want[:, ::-1]
        # crop-then-resize (oracle, edge-clamped) vs single-pass sampling
        # (implementation) differ only where the output pixel samples within
        # half a source pixel of the crop border — compare the interior
        my = int(np.ceil(0.5 * size / h[b])) + 1
        mx = int(np.ceil(0.5 * size / w[b])) + 1
        np.testing.assert_allclose(out[b, my:-my, mx:-mx],
                                   want[my:-my, mx:-mx],
                                   rtol=1e-4, atol=1e-2)


def test_device_crop_distribution_and_freshness(rng):
    B, H, W = 64, 256, 256
    imgs = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8))
    i, j, h, w = (np.asarray(v) for v in ia._sample_crop_boxes(
        jax.random.key(0), B, H, W, ia.SCALE, ia.RATIO))
    assert (i >= 0).all() and (i + h <= H).all()
    assert (j >= 0).all() and (j + w <= W).all()
    frac = h * w / (H * W)
    assert frac.min() >= 0.06 and 0.4 < frac.mean() < 0.7
    r = w / h
    assert r.min() >= 0.7 and r.max() <= 1.43

    a = np.asarray(ia.device_random_resized_crop_flip(jax.random.key(1), imgs))
    b = np.asarray(ia.device_random_resized_crop_flip(jax.random.key(2), imgs))
    assert not np.allclose(a, b)  # fresh crops per key (per step)
    assert a.shape == (B, 224, 224, 3) and a.dtype == np.float32


def test_lwf_step_runs_with_image_augment(rng):
    """Smoke: the scanned LwF step accepts image_augment_fn on a 32-canvas."""
    from simple3dformer_tpu.data.image_augment import (
        device_random_resized_crop_flip,
    )
    from simple3dformer_tpu.data.pipeline import DeviceResidentDataset
    from simple3dformer_tpu.nn.vit import ViT2D
    from simple3dformer_tpu.train.loop import create_train_state
    from simple3dformer_tpu.train.lwf import make_scanned_lwf_train_steps
    from simple3dformer_tpu.train.optim import make_optimizer

    import functools

    class Tiny2D(ViT2D):
        pass

    model = ViT2D(embed_dim=16, depth=1, num_heads=2, patch_size=8,
                  num_classes=5, img_size=24)
    teacher = ViT2D(embed_dim=16, depth=1, num_heads=2, patch_size=8,
                    num_classes=7, img_size=24)

    # task "model": reuse ViT2D on 24x24x3 "voxel" stand-ins; forward_images
    # path needs the same img size, so augment to 24
    x0 = jnp.zeros((2, 24, 24, 3))
    variables = model.init(jax.random.key(0), x0)
    t_vars = teacher.init(jax.random.key(1), x0)

    class Wrapper:
        """model with forward_images = plain call (API shim for the test)."""

        def apply(self, *a, **kw):
            kw.pop("method", None)
            kw.pop("rngs", None)
            kw.pop("deterministic", None)
            return model.apply(*a, **kw)

        forward_images = object()

    tx = make_optimizer("Adam")
    task_ds = DeviceResidentDataset({
        "x": rng.rand(8, 24, 24, 3).astype(np.float32),
        "y": rng.randint(0, 5, size=(8,)).astype(np.int32),
    })
    image_ds = DeviceResidentDataset({
        "images": (rng.rand(8, 32, 32, 3) * 255).astype(np.uint8),
    })
    state = create_train_state(variables["params"], tx)

    run = make_scanned_lwf_train_steps(
        Wrapper(), teacher, t_vars["params"], tx, task_ds, image_ds,
        rules=None,
        image_augment_fn=functools.partial(device_random_resized_crop_flip,
                                           size=24),
    )
    idx = np.zeros((2, 4), np.int32)
    state, metrics = run(state, jnp.asarray(idx), jnp.asarray(idx), 1e-3,
                         jax.random.key(0))
    assert np.isfinite(np.asarray(metrics["loss"])).all()

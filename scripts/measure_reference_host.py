"""Measure the REFERENCE's flagship input pipeline + a torch step on this host.

VERDICT round-2 #4: `bench.py`'s REF_GPU_SPS=300 rests on an estimated
per-sample binvox-decode cost. This script replaces the estimate with a
measurement by running the reference's OWN code (imported from
/root/reference, not copied) on a synthetic ModelNet40-shaped binvox tree:

  1. per-sample cost of /root/reference/data/modelnet40.py:35 __getitem__
     (binvox RLE decode -> int32 [1,30,30,30]) — the DataLoader worker's
     inner loop;
  2. end-to-end DataLoader rate at the reference's own settings
     (batch 32; num_workers=10 in the single-GPU branch,
     train_cls_voxel.py:167);
  3. a torch-CPU fwd+bwd+Adam step of the deit_small flagship mirror
     (timm is not installed here, so the reference model class itself cannot
     be built; the mirror is the same math at the same [32, 26, 384] shape).

The resulting bound: a GPU host running the reference can ingest at most
(cores x per-sample rate) samples/sec regardless of GPU speed. BASELINE.md
records the numbers and the resulting extrapolation.

Run: python scripts/measure_reference_host.py  (CPU only; no TPU use)
"""

import importlib.util
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def load_reference_modelnet40():
    """Import the reference dataset module by file path, skipping the broken
    data/__init__.py (SURVEY §7.3: unresolvable pc_util/scipy.misc imports)."""
    # the reference's vendored binvox_rw.py uses the np.int alias removed in
    # numpy 1.24; restore it for this process only so the 2022 code runs
    # unmodified (we measure the reference, we don't edit it)
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    sys.path.insert(0, "/root/reference/utils")
    spec = importlib.util.spec_from_file_location(
        "ref_modelnet40", "/root/reference/data/modelnet40.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_tree(root, n_per_class=10, classes=("airplane", "bed", "chair",
                                              "desk", "guitar")):
    """ModelNet40-layout binvox tree (30^3, reference file naming)."""
    from simple3dformer_tpu.data import binvox as our_binvox

    rng = np.random.RandomState(9)
    idx2cls = {}
    for ci, cls in enumerate(classes):
        idx2cls[ci] = cls
        d = os.path.join(root, cls, "train")
        os.makedirs(d)
        for i in range(n_per_class):
            grid = rng.rand(30, 30, 30) > 0.87
            v = our_binvox.Voxels(grid, [30, 30, 30], [0, 0, 0], 1.0, "xyz")
            with open(os.path.join(d, f"{cls}_{i:04d}.binvox"), "wb") as f:
                our_binvox.write(v, f)
    return idx2cls


def measure_getitem(ds, n=200):
    t0 = time.time()
    for i in range(n):
        ds[i % len(ds)]
    dt = (time.time() - t0) / n
    return dt


def measure_dataloader(ds, batch=32, workers=10, epochs=3):
    import torch

    dl = torch.utils.data.DataLoader(ds, batch_size=batch, shuffle=True,
                                     num_workers=workers)
    # warm one epoch (worker spawn cost), then time
    for _ in dl:
        pass
    t0 = time.time()
    seen = 0
    for _ in range(epochs):
        for b in dl:
            seen += b["voxel"].shape[0]
    return seen / (time.time() - t0)


def measure_torch_step(batch=32, steps=10):
    """deit_small flagship mirror, torch CPU fwd+bwd+Adam."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    import trajectory_parity as tp

    from simple3dformer_tpu.models.voxel_vit import VoxelViT
    from simple3dformer_tpu.nn.voxel_embed import VoxelEmbed

    emb = VoxelEmbed(voxel_size=30, cell_size=6, patch_size=5, embed_dim=384)
    model = VoxelViT(voxel_embed=emb, n_classes=40,
                     transformer_backbone="deit_small_patch16_224")
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 30, 30, 30)))
    tree = tp.tree_to_torch(variables["params"])
    params = list(tp.torch_leaves(tree))
    opt = torch.optim.Adam(params, lr=1e-3)
    rng = np.random.RandomState(0)
    x = torch.from_numpy((rng.rand(batch, 30, 30, 30) > 0.87)
                         .astype(np.float32))
    y = torch.from_numpy(rng.randint(0, 40, size=batch)).long()
    import torch.nn.functional as F

    def one():
        logits = tp.t_voxel_forward(tree, x, heads=6, depth=12, cell=6)
        loss = F.cross_entropy(logits, y)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one()  # warmup
    t0 = time.time()
    for _ in range(steps):
        one()
    return (time.time() - t0) / steps


def main():
    ncores = os.cpu_count()
    print(f"host cores: {ncores}")
    ref = load_reference_modelnet40()
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as root:
        idx2cls = build_tree(root)
        try:
            # the module's relative sys.path hacks need this cwd; restore
            # after so later sections can't write into the read-only tree
            os.chdir("/root/reference")
            ds = ref.ModelNet40(root, len(idx2cls), idx2cls, split="train")
            per = measure_getitem(ds)
            print(f"reference ModelNet40.__getitem__ (binvox decode): "
                  f"{per * 1e3:.2f} ms/sample -> "
                  f"{1 / per:.0f} samples/sec/worker")
            rate1 = measure_dataloader(ds, workers=0)
            print(f"reference DataLoader rate, num_workers=0 (in-process): "
                  f"{rate1:.0f} samples/sec")
            rate10 = measure_dataloader(ds, workers=min(10, ncores))
            print(f"reference DataLoader rate, num_workers="
                  f"{min(10, ncores)} (reference uses 10): "
                  f"{rate10:.0f} samples/sec")
        finally:
            os.chdir(cwd)
    step = measure_torch_step()
    print(f"torch-CPU flagship step (deit_small mirror, batch 32): "
          f"{step * 1e3:.1f} ms -> {32 / step:.1f} samples/sec")
    print("\nBound for a GPU host: ingest <= cores x per-worker rate; "
          "see BASELINE.md round-3 for the extrapolation.")


if __name__ == "__main__":
    main()

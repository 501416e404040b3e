"""Benchmark: flagship ModelNet40 voxel-classification training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"tflops_per_sec", "secondary": [...]}.

Config matches the north-star recipe (BASELINE.md): VoxelViT with
deit_small_patch16_224 backbone + VoxelEmbed(cell 6, patch 5) on 30^3
ModelNet40-shaped voxels, Adam, batch 32 per chip, CE loss, full train step
(fwd + bwd + update). Data is HBM-resident (uint8 occupancy grids staged
once); whole measurement runs as scanned steps inside a single jit dispatch,
so the number reflects chip compute, not host-link bandwidth.

mfu: XLA cost-analysis FLOPs of the compiled scanned-step program divided by
wall clock and the chip's bf16 MXU peak (TPU matmuls run bf16 passes under
DEFAULT precision even for f32 inputs, so the bf16 peak is the honest
denominator). Unknown device kinds report mfu: null but still print measured
TFLOP/s.

vs_baseline: BASELINE.md records that the reference repo publishes no
benchmark numbers; the driver-defined target is >=3x a single PyTorch GPU.
REF_GPU_SPS derivation, REVISED round 3 after measuring the reference's own
input pipeline on this host (scripts/measure_reference_host.py): the round-2
"DataLoader-bound ~300 samples/sec" figure assumed 2-4 ms/sample binvox
decode; the measured cost of the reference ModelNet40.__getitem__ is
0.11 ms/sample (8,900 samples/sec/worker on one core; real models RLE-decode
faster than the synthetic grids used). Ingest therefore does NOT bind a GPU
host — the pipeline is compute-bound. Compute anchor: deit_small at 26
tokens is ~3.4 GFLOP/sample fwd+bwd; the reference trains plain f32 (no AMP
anywhere in the repo), and a V100's f32 peak is 15.7 TFLOP/s with ~30-50%
achievable at these small [B*26, 384] GEMMs plus eager-mode launch overhead
(~240 kernels/step) => ~1,500-2,500 samples/sec. REF_GPU_SPS = 2000 (the
optimistic end). vs_baseline = value / REF_GPU_SPS; still a *derived*
number — no CUDA host exists here — but now anchored to a measured decode
cost instead of a guessed one. Details: BASELINE.md round-3.

Secondary metrics re-measure EVERY trainable workload family (round-4:
S3DIS semseg, ShapeNetPart seg x2 configs, Hengshuang cls, ScanObjectNN
cls, ViP-3D pure_mlp, ShapeNetV2 group_embed bf16+packed, plus the
flagship throughput mode) by driving the actual CLIs on synthetic data and
parsing their epoch-2 (post-compile) rate lines, so BENCH_r*.json makes
regressions in any family machine-visible. Because the chip is shared
(CLAUDE.md: contention blips of >1.5x have been observed), any measurement
>10% below its standing BASELINE.md record is re-measured once and the
best of the two kept (repeat-on-suspicion, VERDICT r3 weak #4).

Measured headroom beyond the recipe defaults (same chip): batch 256 + bf16
compute reaches ~22.7k samples/sec/chip (`python bench.py --bf16 --batch=256`);
the recipe-faithful default (batch 32, f32) is reported as the headline.
"""

import contextlib
import io
import json
import re
import shutil
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_GPU_SPS = 2000.0  # V100-f32 compute anchor, revised r3; see docstring

BATCH = 32
# One dispatch = one scanned multi-step jit call, mirroring the CLIs' whole-
# epoch-per-dispatch design: through the tunnel a synchronized dispatch costs
# ~24-33 ms regardless of body size plus a host->device put for the index
# array, so short dispatches understate chip throughput (50-step dispatches
# measured 3.2 ms/step where the isolated train step runs ~1.8 ms). Index
# arrays are staged before the timed region, like the HBM-resident data.
STEPS_PER_DISPATCH = 250
WARMUP_DISPATCHES = 1
MEASURE_DISPATCHES = 3
N_SAMPLES = 2048

# bf16 MXU peak per chip (the MXU executes bf16 passes for f32-input matmuls
# under DEFAULT precision). Sources: public TPU spec sheets.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _flagship_throughput(dtype=None, batch=BATCH):
    """Measure the flagship scanned train step; returns dict with
    samples/sec/chip + TFLOP/s + MFU."""
    from __graft_entry__ import _flagship
    from simple3dformer_tpu.data.pipeline import DeviceResidentDataset
    from simple3dformer_tpu.models.voxel_vit import frozen_mask
    from simple3dformer_tpu.parallel.mesh import ShardingRules, make_mesh
    from simple3dformer_tpu.train.loop import create_train_state, make_scanned_train_steps
    from simple3dformer_tpu.train.optim import make_optimizer

    n_chips = jax.device_count()
    mesh = make_mesh()
    rules = ShardingRules(mesh)

    model = _flagship(dtype=dtype)
    x0 = jnp.zeros((2, 30, 30, 30))
    variables = jax.jit(model.init)(jax.random.key(9), x0)
    params = variables["params"]
    # throughput mode (bf16 compute) also takes bf16-nu Adam state — the
    # round-4c anatomy puts the Adam HBM pass at 1.6 ms of the 1.84 ms
    # packed step, and bf16 mode has already waived reference-exact
    # numerics. The f32 recipe keeps torch.optim.Adam's f32 state.
    tx = make_optimizer("Adam", trainable_mask=frozen_mask(params, True),
                        bf16_nu=dtype is not None)
    state = jax.device_put(create_train_state(params, tx), rules.params)

    rng = np.random.RandomState(9)
    ds = DeviceResidentDataset(
        {
            "x": (rng.rand(N_SAMPLES, 30, 30, 30) > 0.85).astype(np.uint8),
            "y": rng.randint(0, 40, size=(N_SAMPLES,)).astype(np.int32),
        },
        mesh=mesh,
    )
    run = make_scanned_train_steps(model, tx, ds, rules, unroll=4)

    global_batch = batch * n_chips

    def make_idx():
        return rules.put_scan_idx(
            rng.randint(0, N_SAMPLES, size=(STEPS_PER_DISPATCH, global_batch))
            .astype(np.int32)
        )

    def dispatch(state, idx):
        state, metrics = run(state, idx, 1e-3, jax.random.key(0))
        # true synchronization: fetch a scalar. On the tunneled axon backend
        # block_until_ready can return before the computation finishes, which
        # silently inflates throughput numbers.
        float(metrics["loss"][-1])
        return state

    staged = [make_idx() for _ in range(WARMUP_DISPATCHES + MEASURE_DISPATCHES)]
    for i in range(WARMUP_DISPATCHES):
        state = dispatch(state, staged[i])
    t0 = time.time()
    for i in range(MEASURE_DISPATCHES):
        state = dispatch(state, staged[WARMUP_DISPATCHES + i])
    dt = time.time() - t0

    total = MEASURE_DISPATCHES * STEPS_PER_DISPATCH * global_batch
    sps_per_chip = total / dt / n_chips

    # per-step FLOPs from compiled cost analysis of a 1-step program (XLA
    # counts a scan body once regardless of trip count, so lower S=1)
    flops_per_step = None
    try:
        idx1 = rules.put_scan_idx(
            rng.randint(0, N_SAMPLES, size=(1, global_batch)).astype(np.int32)
        )
        ca = run.lower(state, idx1, 1e-3, jax.random.key(0)).compile(
        ).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca["flops"])
    except Exception:
        pass
    tflops = mfu = None
    if flops_per_step:
        steps_run = MEASURE_DISPATCHES * STEPS_PER_DISPATCH
        flops_per_sec = flops_per_step * steps_run / dt / n_chips
        tflops = round(flops_per_sec / 1e12, 2)
        peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        if peak:
            mfu = round(flops_per_sec / peak, 4)

    return {
        "value": round(sps_per_chip, 1),
        "unit": "samples/sec/chip",
        "tflops_per_sec": tflops,
        "mfu": mfu,
    }


# Standing BASELINE.md records per metric key (repeat-on-suspicion): a
# single-shot secondary on a shared chip can read a contention blip as a
# regression (round-3's hengshuang secondary read 583.8 vs the same-day
# record 614). Any measurement below 90% of its record is re-measured once
# and the best kept; both readings land in the JSON for auditability.
RECORDS = {
    "modelnet40_voxel_train_samples_per_sec_per_chip": 17220.0,
    "modelnet40_voxel_throughput_mode_bf16_b256_samples_per_sec_per_chip": 30745.0,
    "s3dis_semseg_bf16_samples_per_sec_per_chip": 86.2,
    "partseg_3DViT_bf16_samples_per_sec_per_chip": 1082.0,
    "partseg_3DViT_1_layer_bf16_samples_per_sec_per_chip": 1501.0,
    "hengshuang_cls_bf16_samples_per_sec_per_chip": 614.0,
    "scanobjectnn_cls_bf16_samples_per_sec_per_chip": 820.0,
    # ViP-3D chip record (BASELINE round-4a: 18.25 ms/step B=32 f32
    # scanned production step = 1,753 samples/sec with the hybrid-VJP
    # axis mixes default-on). The CLI epoch rate includes eval/host
    # bookkeeping: measured 1650.1 / 1652.5 with hybrid-VJP on
    # (2 trials, 2026-08-19; pre-hybrid einsum path read 1559-1561).
    "vip3d_pure_mlp_f32_samples_per_sec_per_chip": 1650.0,
    # ShapeNetV2 group_embed CLI epoch rate at synthetic=48 (BENCH_r04:
    # 54.3). NOT comparable to BASELINE round-3b's anchored 62.5
    # samples/sec step rate: at 48 samples the epoch is 3 train steps
    # (256 ms each = 0.77 s) plus a 3-batch eval pass and host epoch
    # bookkeeping, so eval/host overhead is ~35% of the epoch wall
    # clock. The corpus cannot grow past ~48 at 128^3 without tripping
    # the >100 MB host->device wedge (CLAUDE.md round-3), so the
    # protocol delta is documented rather than eliminated; the step-rate
    # anchor remains 62.5 (BASELINE round-3b).
    "shapenetv2_group_embed_bf16_samples_per_sec_per_chip": 54.3,
    # weight_sharing route (VERDICT r4 #4): ModelNet40-shaped 30^3, cell 6
    # -> 5^3 grid, deit_small, B=32 bf16 — pz=5 backbone passes per sample
    # batched as one [B*pz, 26] core pass (models/voxel_vit.py). First chip
    # measurement 2026-08-20: 3141.3 (epoch-2 CLI rate, host CPU contended
    # by a concurrent accuracy run — an uncontended reading can only be
    # higher, so this is a safe repeat-on-suspicion floor).
    "modelnet40_weight_sharing_bf16_samples_per_sec_per_chip": 3141.0,
}


def _retry_if_suspicious(entry: dict, measure) -> dict:
    rec = RECORDS.get(entry.get("metric"))
    v = entry.get("value")
    if rec and v is not None and v < 0.9 * rec:
        second = measure()
        v2 = second.get("value") if isinstance(second, dict) else second
        if v2 is not None and v2 > v:
            entry = dict(second) if isinstance(second, dict) else dict(entry)
            entry["value"] = v2
        entry["suspicious_first_reading"] = v
        # audit trail: BOTH readings land in the JSON even when the retry
        # read lower and the first value was kept (ADVICE r4)
        entry["readings"] = [v, v2]
    return entry


def main(dtype=None, batch=BATCH, quiet=False):
    def measure():
        r = _flagship_throughput(dtype=dtype, batch=batch)
        return {"metric": "modelnet40_voxel_train_samples_per_sec_per_chip",
                **r}

    line = measure()
    if dtype is None and batch == BATCH:
        # the RECORDS entry is for the default recipe config (f32, B=32);
        # a legitimate non-default invocation (--bf16 / --batch) below 90%
        # of that record is not suspicious (ADVICE r4)
        line = _retry_if_suspicious(line, measure)
    line["vs_baseline"] = round(line["value"] / REF_GPU_SPS, 3)
    if not quiet:
        line["secondary"] = secondary_metrics()
        print(json.dumps(line))
    return line["value"]


_RATE = re.compile(r"\(([0-9.]+) samples/sec\)")


def _cli_rate(main_fn, argv, out_style="hydra") -> float | None:
    """Drive a CLI main on synthetic data; return the last epoch's rate
    (epoch 1 is compile-dominated; the run uses 2 epochs). A FRESH out_dir
    every call: a reused one holds the previous run's checkpoint and the CLI
    resumes past the target epoch, training zero steps. out_style picks the
    CLI surface: hydra key=value vs argparse --outf."""
    out_dir = tempfile.mkdtemp(prefix="bench_cli_")
    extra = ([f"out_dir={out_dir}"] if out_style == "hydra"
             else ["--outf", out_dir])
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            main_fn(argv + extra)
    except Exception:
        return None
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    rates = _RATE.findall(buf.getvalue())
    return float(rates[-1]) if rates else None


def secondary_metrics() -> list:
    """Every trainable workload family via its real CLI (VERDICT r3 #3),
    plus the flagship's throughput mode (batch 256 bf16) with its MFU.

    Partseg is measured at BOTH its configs so the numbers line up with
    BASELINE.md's standing records: the yaml-default model=3DViT (what the
    reference's config/partseg.yaml selects) and model=3DViT_1_layer (the
    round-2c record config, 1510 samples/sec bf16). Model names are in the
    metric keys so neither reads as a regression of the other.

    ViP-3D runs f32 (the reference's train_pure_mlp.py recipe has no AMP
    and our CLI mirrors its surface, which has no dtype flag). The
    ShapeNetV2 group_embed leg is the round-3b honest best path — bf16 +
    auto pillar packing at the B=16 / 128^3 / cell 9 / deit_base recipe —
    at synthetic=48 (3 steps/epoch: 128^3 corpora must stay under the
    ~100 MB host->device wedge threshold, CLAUDE.md round-3)."""
    from simple3dformer_tpu.cli import (train_cls, train_cls_scanobjectnn,
                                        train_cls_voxel, train_partseg,
                                        train_pure_mlp, train_s3dis_semseg)

    out = []

    def add(metric, measure, **extra_fields):
        entry = measure()
        if entry is None:
            return
        if not isinstance(entry, dict):
            entry = {"metric": metric, "value": entry,
                     "unit": "samples/sec/chip", **extra_fields}
        entry = _retry_if_suspicious(entry, lambda: measure() or {})
        out.append(entry)

    def tm():
        r = _flagship_throughput(dtype=jnp.bfloat16, batch=256)
        return {"metric": ("modelnet40_voxel_throughput_mode_bf16_b256_"
                           "samples_per_sec_per_chip"), **r}

    add("modelnet40_voxel_throughput_mode_bf16_b256_samples_per_sec_per_chip",
        tm)
    add("s3dis_semseg_bf16_samples_per_sec_per_chip",
        lambda: _cli_rate(train_s3dis_semseg.main,
                          ["synthetic=256", "epoch=2", "dtype=bf16"]))
    for model in ("3DViT", "3DViT_1_layer"):
        add(f"partseg_{model}_bf16_samples_per_sec_per_chip",
            lambda m=model: _cli_rate(
                train_partseg.main,
                [f"model={m}", "synthetic=1024", "epoch=2",
                 "batch_size=16", "dtype=bf16"]))
    add("hengshuang_cls_bf16_samples_per_sec_per_chip",
        lambda: _cli_rate(train_cls.main,
                          ["model=Hengshuang", "synthetic=512", "epoch=2",
                           "dtype=bf16"]))
    add("scanobjectnn_cls_bf16_samples_per_sec_per_chip",
        lambda: _cli_rate(train_cls_scanobjectnn.main,
                          ["synthetic=512", "epoch=2", "batch_size=32",
                           "dtype=bf16"]))
    add("vip3d_pure_mlp_f32_samples_per_sec_per_chip",
        lambda: _cli_rate(train_pure_mlp.main,
                          ["--dataset", "ModelNet40", "--synthetic", "512",
                           "--batchSize", "32", "--epochs", "2",
                           "--model-name", "vip3d_s7",
                           "--embed-layer", "VoxelEmbed_m40_vip_s7"],
                          out_style="argparse"))
    add("shapenetv2_group_embed_bf16_samples_per_sec_per_chip",
        lambda: _cli_rate(train_cls_voxel.main,
                          ["--dataset", "ShapeNetV2", "--synthetic", "48",
                           "--batchSize", "16", "--epochs", "2",
                           "--transformer-name", "deit_base_patch16_224",
                           "--embed-layer", "VoxelEmbed_no_average",
                           "--cell-size", "9", "--patch-size", "14",
                           "--pos-embedding", "group_embed",
                           "--lr", "1e-3", "--dtype", "bf16"],
                          out_style="argparse"))
    # weight_sharing route (VERDICT r4 #4): first-class reference CLI
    # option (/root/reference/train_cls_voxel.py:46-53, forward at
    # vit_3d_2d_pretrain.py:498-519) — pz=5 z-slices batched as one
    # [B*pz, 26] core pass at the ModelNet40 recipe shapes.
    add("modelnet40_weight_sharing_bf16_samples_per_sec_per_chip",
        lambda: _cli_rate(train_cls_voxel.main,
                          ["--dataset", "ModelNet40", "--synthetic", "512",
                           "--batchSize", "32", "--epochs", "2",
                           "--transformer-name", "deit_small_patch16_224",
                           "--embed-layer", "VoxelEmbed_no_average",
                           "--cell-size", "6", "--patch-size", "5",
                           "--pos-embedding", "weight_sharing",
                           "--lr", "1e-3", "--dtype", "bf16"],
                          out_style="argparse"))
    return out


if __name__ == "__main__":
    import sys

    import jax.numpy as _jnp

    kw = {}
    if "--bf16" in sys.argv:
        kw["dtype"] = _jnp.bfloat16
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            kw["batch"] = int(a.split("=")[1])
    main(**kw)

"""Real multi-process jax.distributed training (the reference's multi-node DDP).

The reference scales train_pure_mlp across nodes with torch DDP over an
env:// / SLURM-hostfile rendezvous (/root/reference/train_pure_mlp.py:272-308,
:60-78). Here the SAME CLI is launched as two OS processes that rendezvous via
``jax.distributed`` (parallel.mesh.multihost_init, torch-style
MASTER_ADDR/RANK/WORLD_SIZE env names) and form one global 8-device mesh
(4 virtual CPU devices per process, gloo cross-process collectives).

Claims verified:
  * both ranks complete the unmodified production CLI end to end (scanned
    train steps, cross-process eval all-gather, shared orbax checkpoint)
  * both ranks report the identical loss/accuracy trajectory (metrics are
    replicated — XLA's psum is the DDP allreduce)
  * the 2-process x 4-device trajectory matches a single-process 8-device
    run of the same recipe (process boundaries change nothing but reduction
    order)

No real multi-chip hardware exists in this environment; this is the closest
executable evidence that the multi-host path works (the driver separately
compiles the sharded paths via __graft_entry__.dryrun_multichip).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Two compile-heavy ranks share this machine's single CPU core, and the
# suite may run next to a background job; 900 s was observed to flake under
# such contention (round 4) while the solo run needs only a few minutes.
# The timeout exists to catch genuine rendezvous hangs, not to bound speed.
TIMEOUT_S = 2400

CLI_ARGS = [
    "--dataset", "ModelNet40", "--synthetic", "32", "--batchSize", "8",
    "--epochs", "2", "--model-name", "vip3d_s7",
    "--embed-layer", "VoxelEmbed_m40_vip_s7",
]

_EPOCH_RE = re.compile(
    r"Epoch (\d+) loss ([0-9.]+) test accuracy ([0-9.]+), mean class "
    r"accuracy ([0-9.]+)"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(rank: int, world: int, port: int, devices_per_proc: int) -> dict:
    """Clean env: no axon sitecustomize, torch-style env:// rendezvous vars
    (the names the reference's launcher exports, train_pure_mlp.py:272-281)."""
    env = {
        "PATH": os.environ["PATH"],
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_proc}",
    }
    if world > 1:
        env.update({
            "MASTER_ADDR": "localhost",
            "MASTER_PORT": str(port),
            "WORLD_SIZE": str(world),
            "RANK": str(rank),
        })
    return env


def _parse(stdout: str):
    rows = _EPOCH_RE.findall(stdout)
    assert rows, f"no epoch lines in output:\n{stdout[-2000:]}"
    return np.asarray([[float(l), float(a), float(m)] for _, l, a, m in rows])


def test_two_process_gloo_matches_single_process(tmp_path):
    port = _free_port()
    cmd = [sys.executable, "-m", "simple3dformer_tpu.cli.train_pure_mlp",
           *CLI_ARGS, "--outf", str(tmp_path / "mp")]
    procs = [
        subprocess.Popen(cmd, env=_env(r, 2, port, 4),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO)
        for r in range(2)
    ]
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {r} timed out")
        outs.append(out)
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"

    # the global mesh must actually span both processes
    for out in outs:
        assert "devices: 8" in out, out[-2000:]

    traj = [_parse(out) for out in outs]
    # replicated metrics: both ranks print the identical trajectory
    np.testing.assert_array_equal(traj[0], traj[1])

    # single-process 8-device reference run: same recipe, no rendezvous
    single = subprocess.run(
        [sys.executable, "-m", "simple3dformer_tpu.cli.train_pure_mlp",
         *CLI_ARGS, "--outf", str(tmp_path / "sp")],
        env=_env(0, 1, port, 8), capture_output=True, text=True, cwd=REPO,
        timeout=TIMEOUT_S,
    )
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-2000:]
    ref = _parse(single.stdout)

    # same math, different collective reduction order: losses track tightly,
    # accuracies on 32 eval samples should agree exactly
    np.testing.assert_allclose(traj[0][:, 0], ref[:, 0], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(traj[0][:, 1:], ref[:, 1:], atol=1 / 32 + 1e-9)

    # the shared checkpoint directory was written cooperatively (multihost
    # orbax: one manager dir, shards from both processes)
    ckpt_root = tmp_path / "mp" / "vip3d_s7" / "ckpt"
    assert ckpt_root.exists() and any(ckpt_root.iterdir())


def test_two_process_zero1_and_dcn_match_replicated(tmp_path):
    """ZeRO-1's reduce-scatter/all-gather and the DCN-mesh grad psum cross a
    REAL process boundary (gloo) and still match the replicated dp-8 losses —
    the single-process equivalences of tests/test_parallel.py, now with the
    collectives actually leaving the process."""
    import json

    port = _free_port()
    worker = os.path.join(REPO, "tests", "_mp_parallel_worker.py")
    outs = [tmp_path / f"rank{r}.json" for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(outs[r])], env=_env(r, 2, port, 4),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO)
        for r in range(2)
    ]
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {r} timed out")
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"

    r0, r1 = (json.loads(o.read_text()) for o in outs)
    assert r0["process_count"] == 2
    # replicated losses: identical on both ranks
    np.testing.assert_array_equal(r0["rep"], r1["rep"])
    np.testing.assert_array_equal(r0["zero1"], r1["zero1"])
    np.testing.assert_array_equal(r0["dcn"], r1["dcn"])
    # layout changes only — same math within reduction-order noise
    np.testing.assert_allclose(r0["rep"], r0["zero1"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r0["rep"], r0["dcn"], rtol=1e-5, atol=1e-6)

    # single-process 8-device ground truth
    single_out = tmp_path / "single.json"
    single = subprocess.run(
        [sys.executable, worker, str(single_out)], env=_env(0, 1, port, 8),
        capture_output=True, text=True, cwd=REPO, timeout=TIMEOUT_S)
    assert single.returncode == 0, single.stdout[-4000:] + single.stderr[-2000:]
    s = json.loads(single_out.read_text())
    assert s["process_count"] == 1
    np.testing.assert_allclose(r0["rep"], s["rep"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r0["zero1"], s["zero1"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r0["dcn"], s["dcn"], rtol=1e-5, atol=1e-6)

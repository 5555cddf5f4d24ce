"""Actual multi-host jax.distributed execution, validated offline: two
cooperating processes (4 virtual CPU devices each) form ONE global 8-device
mesh, run one data-parallel diffusion train step with per-host batch feeding,
and the loss must equal the single-process 8-device run bit-for-bit math
(same device count -> same partitioning -> same reductions).

This is the offline stand-in for a TPU pod slice (reference multi-node story:
lightning DDP, reference bin/train.py:469-476); the production launch is
scripts/tpu_pod_launch.sh -> bin/train.py --multihost."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int, tmp_path, seed: int = 0, local_devices: int = 4):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs, outs = [], []
    for i in range(nprocs):
        out = str(tmp_path / f"loss{i}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER,
                    "--coordinator", f"localhost:{port}",
                    "--nprocs", str(nprocs),
                    "--procid", str(i),
                    "--local-devices", str(local_devices),
                    "--seed", str(seed),
                    "--out", out,
                ],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_global_mesh_matches_single_process(tmp_path):
    """2 processes x 4 devices == 1 process x 8 devices, same loss."""
    from tests.helpers import require_uncontended_host

    require_uncontended_host()
    results = _run_workers(2, tmp_path, seed=0)
    assert all(r["global_devices"] == 8 for r in results)
    # Every process computes the identical (replicated) loss
    assert results[0]["loss"] == results[1]["loss"]

    # Single-process reference: this test process already has 8 virtual CPU
    # devices (tests/conftest.py); the same demo runs on a 1-process mesh
    from foldingdiff_tpu.parallel import multihost

    single = multihost.dp_train_step_demo(seed=0)
    np.testing.assert_allclose(results[0]["loss"], single, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_multihost_cli_train_end_to_end(tmp_path):
    """bin/train.py --multihost with an explicit coordinator: 2 processes
    train one epoch on a shared synthetic corpus over the global mesh; only
    process 0 writes artifacts."""
    from tests.helpers import make_synthetic_pdb_dir, require_uncontended_host

    require_uncontended_host()
    pdb_dir = str(tmp_path / "pdbs")
    make_synthetic_pdb_dir(pdb_dir, n=16, seed=7, min_len=30)
    # Pre-warm the featurization cache so the two processes don't race to
    # write it (on a pod each host has its own disk; here they share tmp_path)
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    from foldingdiff_tpu.data import datasets as dsets

    dsets.AnglesOnlyDataset(
        pdbs=pdb_dir, pad=48, min_length=0, cache_dir=cache, n_workers=1
    )

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["FOLDINGDIFF_CACHE_DIR"] = cache
    procs = []
    outdirs = []
    for i in range(2):
        outdir = str(tmp_path / f"results{i}")
        outdirs.append(outdir)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.join(REPO, "bin", "train.py"),
                    "-o", outdir,
                    "--dataset", pdb_dir,
                    "--epochs", "1",
                    "--batchsize", "8",
                    "--dryrun", "--cpu",
                    "--multihost",
                    "--coordinator", f"localhost:{port}",
                    "--nprocs", "2",
                    "--procid", str(i),
                ],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
        assert p.returncode == 0, f"train process failed:\n{stdout[-4000:]}"

    # Only process 0 writes artifacts
    assert os.path.isfile(os.path.join(outdirs[0], "logs", "metrics.csv"))
    assert not os.path.exists(os.path.join(outdirs[1], "logs", "metrics.csv"))
    import csv

    with open(os.path.join(outdirs[0], "logs", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert np.isfinite(float(rows[0]["train_loss"]))
    # The global mesh spanned both processes
    assert any("8 global devices" in l for l in logs), logs[0][-2000:]


@pytest.mark.slow
def test_multihost_resume_broadcasts_from_process_0(tmp_path):
    """Pod preemption + relaunch: only process 0's disk has the train_state
    checkpoint (artifacts are primary-gated), so resume must restore on
    process 0 and BROADCAST epoch/params to all processes -- without this,
    process 1 silently restarts at epoch 0 with fresh weights and the
    replicate() invariant breaks (trainer.py multi-host resume branch)."""
    from tests.helpers import make_synthetic_pdb_dir, require_uncontended_host

    require_uncontended_host()
    pdb_dir = str(tmp_path / "pdbs")
    make_synthetic_pdb_dir(pdb_dir, n=16, seed=7, min_len=30)
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    from foldingdiff_tpu.data import datasets as dsets

    dsets.AnglesOnlyDataset(
        pdbs=pdb_dir, pad=48, min_length=0, cache_dir=cache, n_workers=1
    )
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({"save_state_every": 1}, f)

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["FOLDINGDIFF_CACHE_DIR"] = cache
    outdirs = [str(tmp_path / f"results{i}") for i in range(2)]

    def _launch(epochs: int, resume: bool):
        port = _free_port()
        procs = []
        for i in range(2):
            cmd = [
                sys.executable, os.path.join(REPO, "bin", "train.py"), cfg_path,
                "-o", outdirs[i],
                "--dataset", pdb_dir,
                "--epochs", str(epochs),
                "--batchsize", "8",
                "--dryrun", "--cpu",
                "--multihost",
                "--coordinator", f"localhost:{port}",
                "--nprocs", "2",
                "--procid", str(i),
            ]
            if resume:
                cmd.append("--resume")
            procs.append(subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        logs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout)
            assert p.returncode == 0, f"train process failed:\n{stdout[-4000:]}"
        return logs

    _launch(epochs=2, resume=False)
    # Preemption fiction: process 0 has train_state_*, process 1 has nothing
    assert any(f.startswith("train_state") for f in os.listdir(outdirs[0])), \
        os.listdir(outdirs[0])
    assert not os.path.exists(os.path.join(outdirs[1], "train_state"))

    logs = _launch(epochs=4, resume=True)
    # BOTH processes resumed at epoch 2 via the broadcast (process 1 found no
    # checkpoint on its own disk)
    for i, log in enumerate(logs):
        assert "Resumed train state at epoch 2" in log, f"proc {i}:\n{log[-3000:]}"
        assert "broadcast to 2 processes" in log, f"proc {i}:\n{log[-3000:]}"
    # metrics.csv continued from the first leg: 2 + 2 epochs, one header
    import csv

    with open(os.path.join(outdirs[0], "logs", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3]
    assert all(np.isfinite(float(r["train_loss"])) for r in rows)

"""Multi-host DP is real: a 2-process `jax.distributed` run (one virtual CPU
device per process, 2 global) must reproduce the single-process
2-device loss trajectory step for step — proving per-host input sharding (each
process decodes only its slice of the global batch and assembles the global
jax.Array from per-device local transfers) feeds the identical global data
(SURVEY.md §2.4/§5; VERDICT r2 next #1).

The subprocesses are real separate JAX processes with their own XLA clients
and a grpc coordinator — the closest this host can get to a TPU pod's
multi-host topology.
"""

from __future__ import annotations

import csv
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    # scrub the axon sitecustomize; each process gets its own virtual devices.
    # xla_cpu_collective_timeout_seconds: the gloo rendezvous default is a
    # hard 30 s — on this contended single-core host the two workers' compile
    # /dispatch skew can exceed that, killing the run spuriously
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={local_devices}"
                        " --xla_cpu_collective_timeout_seconds=600")
    return env


def _run_workers(n_proc: int, local_devices: int, data: Path, out: Path,
                 steps: int = 6, resume: str | None = None, attempts: int = 4,
                 stack: str = "cut"):
    """Run one N-process jax.distributed job; retry on gloo-startup races.

    XLA-CPU's gloo rendezvous has a HARD 30 s key-value window per context
    creation (gloo::rendezvous::Store::kDefaultTimeout; the
    xla_cpu_collective_timeout_seconds flag does not reach it). On this
    single-core host, jit-tracing skew between the two workers can
    occasionally exceed it, killing the run before any step executes. That
    is a test-host artifact — real multi-host TPU collectives ride ICI/DCN,
    not gloo — so a gloo-init failure is retried; any OTHER failure (or a
    wrong trajectory) still fails the test immediately.
    """
    last = None
    for _ in range(attempts):
        port = _free_port()
        procs = []
        for pid in range(n_proc):
            cmd = [sys.executable, str(WORKER),
                   "--coordinator", f"localhost:{port}",
                   "--num-processes", str(n_proc), "--process-id", str(pid),
                   "--data", str(data), "--out", str(out), "--steps", str(steps),
                   "--stack", stack]
            if resume:
                cmd += ["--resume", resume]
            procs.append(subprocess.Popen(
                cmd, env=_env(local_devices), cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = []
        hung = False
        for p in procs:
            try:
                out_text, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                hung = True
                for q in procs:
                    q.kill()
                out_text = (p.communicate()[0] or "") + \
                    "\nGloo context initialization failed (hang)"
            outs.append(out_text)
        if all(p.returncode == 0 and "WORKER_DONE" in t
               for p, t in zip(procs, outs)):
            return outs
        last = [t[-4000:] for t in outs]
        if not any("Gloo context initialization failed" in t for t in outs):
            break  # a real failure — don't mask it with retries
        # startup race: for a fresh run wipe the partial outputs and go
        # again; for a resume retry keep them (the CSV appends, and the
        # reader takes the last occurrence of each step)
        if not resume:
            import shutil

            shutil.rmtree(out / "logs", ignore_errors=True)
            shutil.rmtree(out / "ckpt", ignore_errors=True)
        import time

        time.sleep(5)  # let lingering XLA/grpc threads of the dead run drain
    raise AssertionError(f"workers failed after retries:\n{last}")


def _read_losses(log_dir: Path) -> dict[int, tuple[float, float]]:
    with open(log_dir / "losses_history.csv") as f:
        rows = list(csv.DictReader(f))
    return {int(r["step"]): (float(r["d_loss"]), float(r["g_loss"]))
            for r in rows}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mpdata")
    rng = np.random.default_rng(7)
    for d in ("photos", "monet"):
        (root / d).mkdir()
        for i in range(16):
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(root / d / f"{i}.png")
    return root


@pytest.mark.slow
def test_two_process_dp_matches_single_process(data_dir, tmp_path):
    out1 = tmp_path / "single"
    out2 = tmp_path / "double"

    # control: ONE process, 2 virtual devices. (2 global, not 8: XLA-CPU's
    # spinning compute threads can starve the gloo/grpc rendezvous past its
    # hard 30 s window on this single-core host; the 2-rank topology keeps
    # per-step serialized compute and context count minimal. The sharding
    # math being validated — per-process bounds, global index agreement,
    # slice assembly — is identical at any rank count.)
    _run_workers(1, 2, data_dir, out1)
    # the real thing: TWO jax.distributed processes, one device each
    _run_workers(2, 1, data_dir, out2)

    single = _read_losses(out1 / "logs")
    double = _read_losses(out2 / "logs")
    assert set(single) == set(double) and len(single) == 6
    for step in sorted(single):
        # rtol covers cross-process gloo reductions reassociating float32
        # sums differently from the intra-process 8-device program (measured
        # drift ~2e-4 by step 2 of GAN training); a data-sharding bug shows
        # up orders of magnitude larger (different images entirely)
        np.testing.assert_allclose(
            double[step], single[step], rtol=1e-3,
            err_msg=f"loss trajectory diverged at step {step}",
        )


@pytest.mark.slow
def test_two_process_resume_continues_trajectory(data_dir, tmp_path):
    """Kill-and-resume under 2-process DP: run 3 steps, then `--resume auto`
    to 6 — the combined trajectory must equal the uninterrupted 6-step run
    (checkpointed PRNG key + step counter + loader fast-forward)."""
    full = tmp_path / "full"
    part = tmp_path / "part"

    _run_workers(2, 1, data_dir, full, steps=6)
    _run_workers(2, 1, data_dir, part, steps=3)
    _run_workers(2, 1, data_dir, part, steps=6, resume="auto")

    losses_full = _read_losses(full / "logs")
    losses_part = _read_losses(part / "logs")
    # steps 3..5 come from the resumed run (csv keeps appending)
    for step in range(6):
        np.testing.assert_allclose(
            losses_part[step], losses_full[step], rtol=1e-4,
            err_msg=f"resumed trajectory diverged at step {step}",
        )


def _read_cyclegan_log(log_dir: Path) -> dict[int, dict]:
    import json

    lines = [json.loads(l) for l in
             (log_dir / "cyclegan_log.jsonl").read_text().strip().splitlines()]
    return {int(l["step"]): l for l in lines}


@pytest.mark.slow
def test_two_process_cyclegan_dp_matches_single_process(data_dir, tmp_path):
    """The CycleGAN loop rides the same per-host input sharding as the CUT
    loop (process_batch_bounds + UnpairedLoader slicing); prove it with a
    real 2-process jax.distributed run whose per-epoch averaged losses match
    the single-process control (16 images/domain at global batch 8 → 2
    steps/epoch → JSON-lines entries at steps 2 and 4)."""
    out1 = tmp_path / "single"
    out2 = tmp_path / "double"

    _run_workers(1, 2, data_dir, out1, steps=4, stack="cyclegan")
    _run_workers(2, 1, data_dir, out2, steps=4, stack="cyclegan")

    single = _read_cyclegan_log(out1 / "logs")
    double = _read_cyclegan_log(out2 / "logs")
    assert set(single) == set(double) == {2, 4}
    loss_keys = [k for k in single[2] if k not in ("epoch", "step",
                                                   "images_per_sec")]
    assert loss_keys, f"no loss fields logged: {single[2]}"
    for step in sorted(single):
        for k in loss_keys:
            np.testing.assert_allclose(
                double[step][k], single[step][k], rtol=1e-3,
                err_msg=f"{k} diverged at step {step}",
            )

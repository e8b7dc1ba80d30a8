"""The repo's operational scripts run end-to-end from a clean environment.

The reference ships scripts that don't run as committed (select_7k,
SURVEY.md §2.6 item 6); these tests pin ours working — direct `python
scripts/<name>.py` invocation included (python puts the script dir, not the
repo root, on sys.path)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _clean_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def image_sets(tmp_path_factory):
    root = tmp_path_factory.mktemp("scripts")
    rng = np.random.default_rng(0)
    for d, n in (("real", 12), ("cand", 20)):
        (root / d).mkdir()
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), "RGB"
            ).save(root / d / f"{i:03d}.jpg", quality=90)
    return root


@pytest.mark.slow
def test_select_7k_direct_invocation(image_sets):
    out = image_sets / "sel"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "select_7k.py"),
         "--real", str(image_sets / "real"),
         "--cand_roots", str(image_sets / "cand"),
         "--outdir", str(out), "--allow-random-weights",
         "--target", "6", "--k", "4", "--batch", "8", "--tau", "0.0"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(list((out / "images").glob("*.jpg"))) == 6
    meta = json.loads((out / "selection_meta.json").read_text())
    assert meta["selected"] == 6


@pytest.mark.slow
def test_convert_inception_direct_invocation(tmp_path):
    sys.path.insert(0, str(REPO / "tests"))
    import torch
    from torch_inception_ref import TorchInceptionV3FID

    src = tmp_path / "weights.pth"
    torch.save(TorchInceptionV3FID().state_dict(), src)
    dst = tmp_path / "out.npz"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "convert_inception.py"),
         str(src), str(dst)],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert dst.exists()
    data = np.load(dst)
    assert any("Conv2d_1a_3x3" in k or "conv" in k.lower() for k in data.files)


@pytest.mark.slow
def test_build_feature_bank_direct_invocation(image_sets):
    out_npz = image_sets / "bank.npz"
    out_margin = image_sets / "margin.json"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_feature_bank.py"),
         "--images", str(image_sets / "real"),
         "--out", str(out_npz), "--allow-random-weights",
         "--margin-out", str(out_margin), "--batch-size", "8"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(out_npz) as z:
        assert z["features"].shape == (12, 2048)
    meta = json.loads(out_margin.read_text())
    assert 0.0 <= meta["margin"] <= 2.0 and meta["n_images"] == 12


@pytest.mark.slow
def test_full_schedule_soak_resumes_across_kills(tmp_path):
    """The soak harness's wedge-recovery contract: a fresh tiny run writes
    periodic checkpoints; a --resume relaunch (what soak_supervisor.sh does
    after a tunnel wedge) restores the furthest checkpoint, extends the run,
    and the aggregate summary counts the resume. Driven at CPU scale via
    the harness's --batch/--size knobs."""
    out = tmp_path / "soak"
    base = [sys.executable, str(REPO / "scripts" / "full_schedule_soak.py"),
            "--log-every", "2", "--ckpt-every", "2",
            "--batch", "4", "--size", "64", "--out", str(out)]
    # The soak's deployment target is ONE chip; don't inherit the pytest
    # process's 8-device CPU mesh (batch 4 doesn't shard over it).
    env = _clean_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    r1 = subprocess.run(base + ["--steps", "4"], cwd=REPO, env=env,
                        capture_output=True, text=True, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert (out / "ckpt_step2.msgpack").exists()
    assert (out / "ckpt_final.msgpack").exists()

    r2 = subprocess.run(base + ["--steps", "6", "--resume"], cwd=REPO,
                        env=env, capture_output=True, text=True,
                        timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed at step 4" in r2.stderr

    records = [json.loads(line)
               for line in (out / "log.jsonl").read_text().splitlines()]
    assert {"resumed": 4, "from": "ckpt_final.msgpack"} in records
    summary = json.loads(r2.stdout.strip().splitlines()[-2])
    assert summary["steps_completed"] == 6
    assert summary["resumes"] == 1
    assert summary["all_finite"] is True
    assert r2.stdout.strip().splitlines()[-1] == "PASS"

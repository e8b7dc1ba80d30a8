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

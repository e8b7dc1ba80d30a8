"""CycleGAN loop end-to-end on synthetic folders: epoch cadence,
checkpoint schema on disk, max-steps override."""

from pathlib import Path

import numpy as np
from PIL import Image


def _folder(root, name, n, seed, size=24):
    rng = np.random.default_rng(seed)
    d = root / name
    d.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        ).save(d / f"{i:03d}.jpg", quality=90)
    return d


def test_cyclegan_loop_trains_and_checkpoints(tmp_path):
    from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint

    _folder(tmp_path, "a", 6, 0)
    _folder(tmp_path, "b", 4, 1)
    cfg = {
        "data": {"root": str(tmp_path), "domain_a": "a", "domain_b": "b",
                 "img_size": 16, "load_size": 20, "num_workers": 2},
        "training": {"epochs": 2, "batch_size": 2, "amp": False, "seed": 0,
                     "save_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs"), "save_every": 1},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 1},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 4, "ndf": 4, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": "resnet"},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }
    state, trainer = train_cyclegan(cfg)
    # 2 epochs × (max(6,4)//2 = 3 steps) = 6 steps
    assert int(state.step) == 6
    ckpt = tmp_path / "ckpts" / "ckpt_e2.msgpack"
    assert ckpt.exists()
    blob = load_checkpoint(ckpt)
    for key in ["G_A2B", "G_B2A", "D_A", "D_B",
                "optim_G", "optim_D_A", "optim_D_B"]:
        assert key in blob["payload"], key
    assert blob["metrics"]["epoch"] == 2


def test_cyclegan_loop_counts_tfrec_sources(tmp_path):
    """Epoch length must come from make_source, not an image glob: with
    TFRecord-shard domains a glob sees 0 images and the old code silently
    computed max_steps = 0 (returning untrained)."""
    import io

    from gan_variant_research_tpu.data import tfrecord as tfr
    from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan
    from PIL import Image as _Image

    rng = np.random.default_rng(5)

    def jpeg_bytes():
        buf = io.BytesIO()
        _Image.fromarray(
            rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    for name, n in (("a", 4), ("b", 4)):
        d = tmp_path / name
        d.mkdir()
        tfr.write_tfrecord(d / "part-00.tfrec", [
            tfr.make_example({"image_name": f"{i}.jpg",
                              "image": jpeg_bytes()}) for i in range(n)
        ])

    cfg = {
        "data": {"root": str(tmp_path), "domain_a": "a", "domain_b": "b",
                 "img_size": 16, "load_size": 20, "num_workers": 2},
        "training": {"epochs": 1, "batch_size": 2, "amp": False, "seed": 0,
                     "save_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs"), "save_every": 1},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 1},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 4, "ndf": 4, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": "resnet"},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }
    state, _ = train_cyclegan(cfg)
    # 1 epoch x (max(4,4)//2 = 2 steps); the pre-fix behavior was 0 steps
    assert int(state.step) == 2


def _micro_cfg(tmp_path, tag):
    return {
        "data": {"root": str(tmp_path), "domain_a": "a", "domain_b": "b",
                 "img_size": 16, "load_size": 20, "num_workers": 2},
        "training": {"epochs": 2, "batch_size": 2, "amp": False, "seed": 0,
                     "save_dir": str(tmp_path / f"ckpts_{tag}"),
                     "log_dir": str(tmp_path / f"logs_{tag}"), "save_every": 1},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 1},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 4, "ndf": 4, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": "resnet"},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }


def test_cyclegan_resume_auto_matches_uninterrupted(tmp_path):
    """--resume auto continues the run exactly: checkpointed params/opt
    states/PRNG key + loader index fast-forward reproduce the uninterrupted
    per-epoch loss trajectory (beyond-reference: Basic_GAN has no resume —
    src/train.py; same contract the CUT loop proves in resume_soak)."""
    import json

    from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan

    _folder(tmp_path, "a", 6, 0)
    _folder(tmp_path, "b", 4, 1)

    def read_log(cfg):
        p = Path(cfg["training"]["log_dir"]) / "cyclegan_log.jsonl"
        return [json.loads(l) for l in p.read_text().strip().splitlines()]

    full = _micro_cfg(tmp_path, "full")
    state_full, _ = train_cyclegan(full)          # 6 steps = 2 epochs of 3
    assert int(state_full.step) == 6

    part = _micro_cfg(tmp_path, "part")
    state_p, _ = train_cyclegan(part, max_steps_override=3)   # epoch 1 only
    assert int(state_p.step) == 3
    assert (Path(part["training"]["save_dir"]) / "ckpt_e1.msgpack").exists()
    state_r, _ = train_cyclegan(part, resume="auto")          # continue to 6
    assert int(state_r.step) == 6

    log_full = read_log(full)
    log_part = read_log(part)   # epoch-1 line from run 1, epoch-2 appended
    assert [l["epoch"] for l in log_full] == [1, 2]
    assert [l["epoch"] for l in log_part] == [1, 2]
    for lf, lp in zip(log_full, log_part):
        for k in lf:
            if k in ("epoch", "step", "images_per_sec"):
                continue
            np.testing.assert_allclose(
                lp[k], lf[k], rtol=1e-5,
                err_msg=f"{k} diverged at epoch {lf['epoch']}")


def test_cyclegan_loop_scan_windows_match_plain(tmp_path):
    """runtime.steps_per_call>1 must not change the trajectory: windows are
    clamped to epoch boundaries (3 steps/epoch here, so a requested K=4
    runs as scans of 3), and every per-epoch average matches the plain
    run's exactly."""
    import json

    from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan

    _folder(tmp_path, "a", 6, 0)
    _folder(tmp_path, "b", 4, 1)

    def read_log(cfg):
        p = Path(cfg["training"]["log_dir"]) / "cyclegan_log.jsonl"
        return [json.loads(l) for l in p.read_text().strip().splitlines()]

    plain = _micro_cfg(tmp_path, "plain")
    state_plain, _ = train_cyclegan(plain)        # 6 steps = 2 epochs of 3
    assert int(state_plain.step) == 6

    windowed = _micro_cfg(tmp_path, "windowed")
    windowed["runtime"]["steps_per_call"] = 4     # > steps_per_epoch
    state_win, _ = train_cyclegan(windowed)
    assert int(state_win.step) == 6

    log_plain, log_win = read_log(plain), read_log(windowed)
    assert [l["epoch"] for l in log_win] == [1, 2]
    for lp, lw in zip(log_plain, log_win):
        for k in lp:
            if k in ("epoch", "step", "images_per_sec"):
                continue
            np.testing.assert_allclose(
                lw[k], lp[k], rtol=1e-4, atol=1e-6,
                err_msg=f"{k} diverged at epoch {lp['epoch']}")

"""CycleGAN loop end-to-end on synthetic folders: epoch cadence,
checkpoint schema on disk, max-steps override."""

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

"""End-to-end integration: synthetic image folders → CUT training CLI →
checkpoint artifacts → generate_folder CLI → JPEG outputs + submission zip.
Exercises the loaders, the loop (logging/checkpointing contracts), resume,
and the EMA-first inference restore — the reference's manual QUICKSTART
checklist as an automated test (SURVEY.md §4)."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


def _folder(root: Path, name: str, n: int, seed: int, size: int = 40):
    rng = np.random.default_rng(seed)
    d = root / name
    d.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        ).save(d / f"{i:03d}.jpg", quality=90)
    return d


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    _folder(root, "photos", 12, 0)
    _folder(root, "monets", 8, 1)
    return root


def micro_config(root: Path) -> dict:
    return {
        "image_size": 32,
        "batch_size": 4,
        "max_steps": 5,
        "seed": 7,
        "warmup_steps": 3,
        "data": {"photos_dir": str(root / "photos"), "monet_dir": str(root / "monets")},
        "output": {
            "checkpoint_dir": str(root / "ckpts"),
            "log_dir": str(root / "logs"),
        },
        "optim": {"G": {"lr": 2e-4, "betas": [0.5, 0.999]},
                  "D": {"lr": 2e-4, "betas": [0.5, 0.999]}},
        "loss_weights": {"adv": 1.0, "patchnce": 1.0,
                         "identity_warm": 0.1, "identity_final": 0.0},
        "model": {
            "generator": {"ngf": 4, "n_blocks": 2},
            "discriminator": {"ndf": 4, "n_layers": 2, "num_scales": 1},
        },
        "patchnce": {"num_patches": 8, "temperature": 0.07,
                     "nce_layers": [0, 4, 8, 12, 16]},
        "diffaugment": {"enable": True, "policy": ["color", "translation", "cutout"]},
        "r1": {"gamma": 10.0, "every": 4},
        "ema": {"decay": 0.999},
        "metrics": {"save_checkpoint_every": 3},
        "checkpoint": {"keep_last_n": 2},
        "log": {"every_steps": 2, "verbose": False},
        "io": {"num_workers": 2},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }


@pytest.fixture(scope="module")
def trained(workspace):
    """Run the 5-step training once per module; dependent tests request this
    fixture (instead of relying on test order) for the checkpoint artifacts."""
    from gan_variant_research_tpu.train.loop import train_cut

    return train_cut(micro_config(workspace))


def test_train_checkpoint_resume_generate(workspace, trained):
    from gan_variant_research_tpu.train.loop import train_cut
    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
        stylize_folder,
    )

    state, _ = trained
    assert int(state.step) == 5

    # logging contracts: per-step CSV + JSON lines
    csv = (workspace / "logs" / "losses_history.csv").read_text().strip().splitlines()
    assert csv[0] == "step,d_loss,g_loss"
    assert len(csv) == 6  # header + 5 steps
    log_lines = (workspace / "logs" / "train_log.txt").read_text().strip().splitlines()
    assert log_lines and log_lines[0].startswith("Step 2: {")
    json.loads(log_lines[0].split(": ", 1)[1])  # valid JSON payload
    assert (workspace / "logs" / "training_losses.png").exists()

    # checkpoint artifacts: step ckpt + final
    assert (workspace / "ckpts" / "ckpt_step3.msgpack").exists()
    final = workspace / "ckpts" / "ckpt_final.msgpack"
    assert final.exists()

    # auto-resume continues from the final checkpoint
    cfg2 = micro_config(workspace)
    cfg2["max_steps"] = 7
    state2, _ = train_cut(cfg2, resume="auto")
    assert int(state2.step) == 7

    # generate_folder: EMA-first restore + mirrored JPEG tree + zip
    generator, params, stored_cfg = load_generator_params(final, use_ema=True)
    assert stored_cfg["image_size"] == 32
    out_dir = workspace / "generated"
    zip_path = workspace / "images.zip"
    written = stylize_folder(
        generator, params, workspace / "photos", out_dir,
        size=32, batch=4, limit=6, quality=95, zip_path=str(zip_path),
    )
    assert len(written) == 6
    img = Image.open(written[0])
    assert img.size == (32, 32)
    with zipfile.ZipFile(zip_path) as zf:
        assert len(zf.namelist()) == 6
        assert "0.jpg" in zf.namelist()


def test_generate_without_ema_warns_when_missing(workspace, trained, capsys):
    from gan_variant_research_tpu.cli.generate_folder import load_generator_params

    final = workspace / "ckpts" / "ckpt_final.msgpack"
    generator, params, _ = load_generator_params(final, use_ema=False)
    assert params is not None


def test_generate_folder_serves_cyclegan_checkpoints(tmp_path):
    """CycleGAN joint checkpoints (G_A2B/G_B2A payload) are served first-class
    with --direction selection; the reference's Basic_GAN stack has no
    inference script at all (submissions went via notebook cells), so this is
    the parity surface for SURVEY.md §2.5's submission flow on that stack."""
    import jax
    import numpy as np

    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
        stylize_folder,
    )
    from gan_variant_research_tpu.train.checkpoint import save_checkpoint
    from gan_variant_research_tpu.train.cyclegan_trainer import CycleGANTrainer

    cfg = {
        "data": {"img_size": 16},
        "training": {"epochs": 1, "batch_size": 2, "amp": False, "seed": 0},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 1},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 4, "ndf": 4, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": "resnet"},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }
    trainer = CycleGANTrainer(cfg)
    state = trainer.init_state()
    ckpt = tmp_path / "cyclegan.msgpack"
    save_checkpoint(ckpt, 0, trainer.checkpoint_payload(state), config=cfg)

    _folder(tmp_path, "photos", 4, 0)
    for direction, key in [("A2B", "G_A2B"), ("B2A", "G_B2A")]:
        generator, params, stored = load_generator_params(
            ckpt, direction=direction)
        written = stylize_folder(
            generator, params, tmp_path / "photos",
            tmp_path / f"out_{direction}", size=16, batch=4)
        assert len(written) == 4
        # served params are exactly the requested generator's
        got = jax.tree_util.tree_leaves(params)
        want = jax.tree_util.tree_leaves(state.g_params[key])
        assert all(np.array_equal(g, np.asarray(w)) for g, w in zip(got, want))
    # the two directions produce different images (distinct param trees)
    a = np.asarray(Image.open(tmp_path / "out_A2B" / "000.jpg"))
    b = np.asarray(Image.open(tmp_path / "out_B2A" / "000.jpg"))
    assert not np.array_equal(a, b)


def test_generate_folder_surfaces_decode_errors(workspace, trained, tmp_path):
    """A corrupt input image must raise in the caller, not die silently in
    the decode-prefetch thread (which would truncate the output tree)."""
    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
        stylize_folder,
    )

    bad_dir = tmp_path / "photos"
    bad_dir.mkdir()
    (bad_dir / "bad.jpg").write_bytes(b"definitely not a jpeg")
    final = workspace / "ckpts" / "ckpt_final.msgpack"
    generator, params, _ = load_generator_params(final, use_ema=True)
    with pytest.raises(Exception):
        stylize_folder(generator, params, bad_dir, tmp_path / "out",
                       size=32, batch=4)


def test_generate_folder_serves_tfrecord_shards(workspace, trained, tmp_path):
    """--photos may be the Kaggle dataset's native TFRecord shards: records
    are decoded by index and written under their image_name feature, and the
    outputs are pixel-identical to serving the same images from a folder."""
    import io

    import numpy as np

    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
        stylize_folder,
    )
    from gan_variant_research_tpu.data import tfrecord as tfr

    # pack the workspace's photo folder into one shard, bitwise JPEG embed
    from gan_variant_research_tpu.data.folders import list_images

    photos = list_images(workspace / "photos")[:4]
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    tfr.write_tfrecord(shard_dir / "part-00.tfrec", [
        tfr.make_example({"image_name": p.name, "image": p.read_bytes()})
        for p in photos
    ])

    final = workspace / "ckpts" / "ckpt_final.msgpack"
    generator, params, _ = load_generator_params(final, use_ema=True)
    out_tf = stylize_folder(generator, params, shard_dir,
                            tmp_path / "out_tf", size=32, batch=4)
    assert sorted(p.name for p in out_tf) == \
        sorted(p.with_suffix(".jpg").name for p in photos)

    # folder-served control over the SAME images
    ctl_dir = tmp_path / "ctl_photos"
    ctl_dir.mkdir()
    for p in photos:
        (ctl_dir / p.name).write_bytes(p.read_bytes())
    out_fd = stylize_folder(generator, params, ctl_dir,
                            tmp_path / "out_fd", size=32, batch=4)
    for a, b in zip(sorted(out_tf), sorted(out_fd)):
        np.testing.assert_array_equal(
            np.asarray(Image.open(a)), np.asarray(Image.open(b)),
            err_msg=f"{a.name} differs between tfrec and folder serving")


def test_tfrecord_serving_sanitizes_record_names(workspace, trained, tmp_path):
    """A corrupt/adversarial image_name must not escape --out: serving
    keeps only the name's final path component (the same invariant
    tfrec_tool.unpack enforces)."""
    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
        stylize_folder,
    )
    from gan_variant_research_tpu.data import tfrecord as tfr
    from gan_variant_research_tpu.data.folders import list_images

    photos = list_images(workspace / "photos")[:3]
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    evil_names = ["../../escape", "/abs/path/abs_escape", "nested/dir/deep"]
    tfr.write_tfrecord(shard_dir / "part-00.tfrec", [
        tfr.make_example({"image_name": n, "image": p.read_bytes()})
        for n, p in zip(evil_names, photos)
    ])

    out_root = tmp_path / "sandbox"
    out_dir = out_root / "out"
    final = workspace / "ckpts" / "ckpt_final.msgpack"
    generator, params, _ = load_generator_params(final, use_ema=True)
    written = stylize_folder(generator, params, shard_dir, out_dir,
                             size=32, batch=4)
    assert len(written) == 3
    for w in written:
        assert w.resolve().is_relative_to(out_dir.resolve()), \
            f"{w} escaped the output tree"
    assert sorted(p.name for p in written) == \
        ["abs_escape.jpg", "deep.jpg", "escape.jpg"]
    assert not (tmp_path / "escape.jpg").exists()
    assert not Path("/abs/path/abs_escape.jpg").exists()


def test_zero_cadence_disables_periodic_work(workspace, tmp_path):
    """Cadence 0 is the conventional 'off' sentinel: it must disable
    periodic checkpoints/log lines (it used to ZeroDivisionError at the
    first step) while the final checkpoint still writes."""
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["max_steps"] = 3
    cfg["metrics"] = {"save_checkpoint_every": 0}
    cfg["log"] = {"every_steps": 0, "verbose": False}
    cfg["output"] = {"checkpoint_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs")}
    state, _ = train_cut(cfg)
    assert int(state.step) == 3
    names = [p.name for p in (tmp_path / "ckpts").glob("*.msgpack")]
    assert names == ["ckpt_final.msgpack"]


def test_steps_per_call_requires_aligned_cadences(workspace, tmp_path):
    """With lax.scan windows (runtime.steps_per_call>1) state exists only at
    window boundaries — misaligned cadences would label checkpoints with a
    step the state has already passed, so they fail loudly up front."""
    import pytest as _pytest

    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["runtime"]["steps_per_call"] = 2
    cfg["log"] = {"every_steps": 3, "verbose": False}  # 3 % 2 != 0
    cfg["output"] = {"checkpoint_dir": str(tmp_path / "c"),
                     "log_dir": str(tmp_path / "l")}
    with _pytest.raises(ValueError, match="steps_per_call"):
        train_cut(cfg)


def test_steps_per_call_window_checkpoint_label_matches_state(workspace,
                                                              tmp_path):
    """A checkpoint written from a scan window must contain exactly the
    state its filename claims (it used to hold state up to K-1 steps
    further along)."""
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["max_steps"] = 6
    cfg["runtime"]["steps_per_call"] = 2
    cfg["metrics"] = {"save_checkpoint_every": 4}
    cfg["log"] = {"every_steps": 2, "verbose": False}
    cfg["output"] = {"checkpoint_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs")}
    train_cut(cfg)
    blob = load_checkpoint(tmp_path / "ckpts" / "ckpt_step4.msgpack")
    assert blob["step"] == 4  # stored step == filename step == state.step


@pytest.mark.slow
def test_window_grid_realigns_after_offgrid_resume(workspace, tmp_path):
    """Resuming scan windows from an off-grid step (a ckpt_final written at
    an arbitrary max_steps, then extended) must realign the window grid with
    one short first window — otherwise every label lands off the cadence
    grid and the rest of the run silently writes no checkpoints or logs."""
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["max_steps"] = 3  # off the K=2 grid → ckpt_final at step 3
    cfg["runtime"]["steps_per_call"] = 2
    cfg["metrics"] = {"save_checkpoint_every": 2}
    cfg["checkpoint"] = {"keep_last_n": 10}
    cfg["log"] = {"every_steps": 2, "verbose": False}
    cfg["output"] = {"checkpoint_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs")}
    train_cut(cfg)

    cfg2 = dict(cfg, max_steps=8)
    train_cut(cfg2, resume="auto")  # resumes from ckpt_final @ step 3
    for s in (4, 6):  # realigned grid keeps firing the cadence
        blob = load_checkpoint(tmp_path / "ckpts" / f"ckpt_step{s}.msgpack")
        assert blob["step"] == s
    # step 8 == max_steps: the periodic save is skipped (no duplicate
    # serialization next to ckpt_final) — the final checkpoint carries it
    assert not (tmp_path / "ckpts" / "ckpt_step8.msgpack").exists()
    final = load_checkpoint(tmp_path / "ckpts" / "ckpt_final.msgpack")
    assert final["step"] == 8
    # and auto-resume resolves ckpt_final as the furthest-along state
    from gan_variant_research_tpu.train.checkpoint import latest_checkpoint
    best = latest_checkpoint(tmp_path / "ckpts")
    assert best is not None and best.name == "ckpt_final.msgpack"


def test_single_step_checkpoint_label_matches_state(workspace, tmp_path):
    """The single-step path must use the same completed-step labeling as the
    window path: ckpt_step{s} stores exactly step s (it used to store s+1
    under a filename claiming s, and fire one step later than a window run
    with the same cadence)."""
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["max_steps"] = 6
    cfg["metrics"] = {"save_checkpoint_every": 4}
    cfg["log"] = {"every_steps": 2, "verbose": False}
    cfg["output"] = {"checkpoint_dir": str(tmp_path / "ckpts"),
                     "log_dir": str(tmp_path / "logs")}
    train_cut(cfg)
    blob = load_checkpoint(tmp_path / "ckpts" / "ckpt_step4.msgpack")
    assert blob["step"] == 4  # stored step == filename step == state.step


def test_no_duplicate_final_checkpoint(workspace):
    """max_steps a multiple of the save cadence (the shipped configs'
    common case) must NOT write ckpt_step{max} immediately followed by an
    identical ckpt_final — one full-state serialization, not two."""
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = micro_config(workspace)
    cfg["max_steps"] = 4
    cfg["metrics"] = {"save_checkpoint_every": 2}
    cfg["output"]["checkpoint_dir"] = str(workspace / "ckpts_nodup")
    cfg["output"]["log_dir"] = str(workspace / "logs_nodup")
    train_cut(cfg)
    d = workspace / "ckpts_nodup"
    names = sorted(p.name for p in d.glob("ckpt_*.msgpack"))
    assert names == ["ckpt_final.msgpack", "ckpt_step2.msgpack"], names
    assert load_checkpoint(d / "ckpt_final.msgpack")["step"] == 4

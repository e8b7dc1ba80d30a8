"""Tests for training-time metrics + early stopping (the reference's
deleted metrics/ layer and EarlyStoppingTracker —
Documentation/BASELINE_REVERSION.md §3; config surface
train_gan_cutpp.yaml:103-116)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from gan_variant_research_tpu.train.inline_metrics import (
    EarlyStoppingTracker,
    InlineEvaluator,
)
from gan_variant_research_tpu.train.feature_bank import save_feature_bank

from tests.test_end_to_end import _folder, micro_config


# --------------------------- EarlyStoppingTracker ----------------------- #


def test_disabled_tracker_never_stops():
    t = EarlyStoppingTracker(enable=False, patience=1)
    assert not t.update(fid=100.0, d_min=0.0)
    assert not t.update(fid=100.0, d_min=0.0)


def test_fid_plateau_stops_after_patience():
    t = EarlyStoppingTracker(enable=True, patience=2,
                             fid_plateau_threshold=1.0)
    assert not t.update(fid=50.0)     # sets best
    assert not t.update(fid=49.5)     # improvement < threshold → strike 1
    assert t.update(fid=49.8)         # strike 2 → stop
    assert "plateau" in t.reason


def test_fid_improvement_resets_strikes():
    t = EarlyStoppingTracker(enable=True, patience=2,
                             fid_plateau_threshold=1.0)
    assert not t.update(fid=50.0)
    assert not t.update(fid=50.2)     # strike 1
    assert not t.update(fid=45.0)     # real improvement → reset
    assert not t.update(fid=44.9)     # strike 1 again
    assert t.update(fid=44.9)         # strike 2 → stop


def test_dmin_floor_fires_immediately():
    t = EarlyStoppingTracker(enable=True, patience=99,
                             dmin_drop_threshold=0.05)
    assert not t.update(d_min=0.30)
    # ordinary convergence — d_min decreasing as the generator learns the
    # target style — must NOT fire the alarm (a drop-below-running-max rule
    # would stop every real run at its first improving evaluation)
    assert not t.update(d_min=0.20)
    assert not t.update(d_min=0.06)
    assert t.update(d_min=0.04)       # collapse under the floor → alarm
    assert "memorization" in t.reason


# ------------------------------ InlineEvaluator ------------------------- #


@pytest.fixture(scope="module")
def metrics_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("inline_metrics")
    _folder(root, "photos", 6, 0)
    _folder(root, "monets", 6, 1)
    local = np.random.default_rng(0)
    save_feature_bank(root / "bank.npz",
                      local.normal(size=(6, 2048)).astype(np.float32))
    return root


def _metrics_config(root: Path) -> dict:
    cfg = micro_config(root)
    cfg["metrics"] = {"compute_fid": True, "compute_clip_distance": True,
                      "eval_every": 2, "save_checkpoint_every": 100}
    cfg["eval"] = {"num_samples": 4}
    cfg["clip_features"] = {"monet_feats_path": str(root / "bank.npz"),
                            "allow_random": True}
    return cfg


def test_inline_evaluator_metrics(metrics_ws):
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    cfg = _metrics_config(metrics_ws)
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()
    ev = InlineEvaluator(cfg)
    m = ev.evaluate(trainer, state)
    assert set(m) == {"fid", "d_min"}
    assert np.isfinite(m["fid"]) and m["fid"] >= 0
    assert np.isfinite(m["d_min"]) and 0 <= m["d_min"] <= 2
    # deterministic probe: same state → same numbers
    m2 = ev.evaluate(trainer, state)
    assert m2["fid"] == pytest.approx(m["fid"], rel=1e-5)
    assert m2["d_min"] == pytest.approx(m["d_min"], rel=1e-5)


@pytest.mark.slow
def test_loop_early_stops_and_writes_metrics_log(metrics_ws):
    from gan_variant_research_tpu.train.loop import train_cut

    cfg = _metrics_config(metrics_ws)
    cfg["output"] = {"checkpoint_dir": str(metrics_ws / "es_ckpts"),
                     "log_dir": str(metrics_ws / "es_logs")}
    cfg["max_steps"] = 8
    cfg["metrics"]["eval_every"] = 1
    # patience 1 + huge plateau threshold → the 2nd eval is a strike → stop
    cfg["early_stop"] = {"enable": True, "patience": 1,
                         "fid_plateau_threshold": 1e9,
                         "dmin_drop_threshold": 0.0}
    state, _ = train_cut(cfg)
    assert int(state.step) < 8        # stopped early
    lines = [json.loads(l) for l in
             (metrics_ws / "es_logs" / "metrics_log.jsonl").read_text()
             .strip().splitlines()]
    assert lines and set(lines[0]) == {"step", "fid", "d_min"}


def test_inline_evaluator_probe_from_tfrec(metrics_ws, tmp_path):
    """With data.use_tfrec the probe batch must come from the TFRecord
    source, mirroring the training loader (the old code globbed
    photos_dir and crashed on TFRecord-only datasets)."""
    import io

    from gan_variant_research_tpu.data import tfrecord as tfr
    from gan_variant_research_tpu.train.inline_metrics import InlineEvaluator

    rng = np.random.default_rng(9)
    d = tmp_path / "photos_tfrec"
    d.mkdir()

    def jpeg_bytes():
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    tfr.write_tfrecord(d / "part-00.tfrec", [
        tfr.make_example({"image_name": f"{i}.jpg", "image": jpeg_bytes()})
        for i in range(3)
    ])

    cfg = _metrics_config(metrics_ws)
    cfg["data"] = dict(cfg["data"])
    cfg["data"]["use_tfrec"] = True
    cfg["data"]["photos_tfrec"] = str(d)
    cfg["data"]["photos_dir"] = str(tmp_path / "does_not_exist")
    ev = InlineEvaluator(cfg)
    # 3 probe images (capped by the source), at the configured size
    assert ev._probe.shape == (3, cfg["image_size"], cfg["image_size"], 3)


def test_eval_cadence_alias_rules(metrics_ws):
    """metrics.eval_every and eval.every_steps are aliases (both dead keys
    of the reference's deleted metrics layer); either works alone, and
    disagreement is a loud error instead of silent shadowing."""
    from gan_variant_research_tpu.train.inline_metrics import InlineEvaluator

    cfg = _metrics_config(metrics_ws)
    cfg["metrics"] = dict(cfg["metrics"])
    del cfg["metrics"]["eval_every"]
    cfg["eval"] = dict(cfg["eval"], every_steps=7)
    assert InlineEvaluator(cfg).eval_every == 7

    cfg["metrics"]["eval_every"] = 9
    with pytest.raises(ValueError, match="disagree"):
        InlineEvaluator(cfg)


def test_early_stop_config_rejects_unknown_keys():
    import pytest

    from gan_variant_research_tpu.train.inline_metrics import (
        EarlyStoppingTracker,
    )

    t = EarlyStoppingTracker.from_config({"enable": True, "patience": 10})
    assert t.enable and t.patience == 10
    with pytest.raises(ValueError, match="patince"):
        EarlyStoppingTracker.from_config({"enable": True, "patince": 10})

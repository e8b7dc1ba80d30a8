"""Checkpoint step-peek and resume-point resolution I/O contracts."""

import numpy as np

from gan_variant_research_tpu.train.checkpoint import (
    _peek_tail_step,
    _stored_step,
    latest_checkpoint,
    save_checkpoint,
)


def test_stored_step_peeks_tail_without_full_parse(tmp_path, monkeypatch):
    import flax.serialization as fs

    for step in (0, 7, 127, 128, 65535, 70000, 2**33):
        p = save_checkpoint(tmp_path / f"ckpt_step{step}.msgpack", step,
                            {"g": np.ones((64, 64), np.float32)})
        # the peek alone must resolve it — a full msgpack parse here would
        # mean resume startup re-reads hundreds of MB per candidate file
        monkeypatch.setattr(
            fs, "msgpack_restore",
            lambda *_: (_ for _ in ()).throw(AssertionError("full parse")))
        assert _stored_step(p) == step
        monkeypatch.undo()


def test_stored_step_falls_back_on_foreign_layout(tmp_path):
    import msgpack

    # "step" not the last key → the tail peek must decline, not misread
    blob = msgpack.packb({"step": 41, "zzz": b"x" * 100})
    p = tmp_path / "foreign.msgpack"
    p.write_bytes(blob)
    assert _peek_tail_step(blob[-16:]) is None
    assert _stored_step(p) == 41  # full-parse fallback


def test_peek_rejects_truncated_or_coincidental_tails():
    assert _peek_tail_step(b"") is None
    assert _peek_tail_step(b"\xa4step") is None  # key, no value
    # value bytes not ending exactly at EOF → decline
    assert _peek_tail_step(b"\xa4step\xcd\x01\x02\x00") is None
    assert _peek_tail_step(b"\xa4step\x05") == 5


def test_latest_checkpoint_prefers_furthest_step(tmp_path):
    payload = {"g": np.zeros((2,), np.float32)}
    save_checkpoint(tmp_path / "ckpt_step3.msgpack", 3, payload)
    save_checkpoint(tmp_path / "ckpt_final.msgpack", 5, payload)
    assert latest_checkpoint(tmp_path).name == "ckpt_final.msgpack"
    save_checkpoint(tmp_path / "ckpt_step9.msgpack", 9, payload)
    assert latest_checkpoint(tmp_path).name == "ckpt_step9.msgpack"

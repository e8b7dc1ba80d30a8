"""TFRecord reader: framing, CRC, Example proto parse (vs a real-protobuf
oracle), the image source, and loader integration.

The reference's TFRecord path is vestigial (photos_dataset.py:93-102 raises
NotImplementedError; its photos_tfrec/monet_tfrec YAML keys are never read).
These tests pin the from-scratch implementation (data/tfrecord.py).
"""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest
from PIL import Image

from gan_variant_research_tpu.data import tfrecord as tfr
from gan_variant_research_tpu.data.loader import (
    ImageFolderSource,
    UnpairedLoader,
    make_source,
)
from gan_variant_research_tpu.data.native_loader import crc32c, native_available


def _jpeg_bytes(rng, h=48, w=64, quality=95) -> bytes:
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tfrec_dir(tmp_path_factory):
    """Two shards with the Kaggle schema: {image_name, image, target}."""
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("tfrec")
    recs = [
        tfr.make_example(
            {"image_name": f"img{i}.jpg", "image": _jpeg_bytes(rng),
             "target": i})
        for i in range(7)
    ]
    tfr.write_tfrecord(d / "part-00.tfrec", recs[:4])
    tfr.write_tfrecord(d / "part-01.tfrec", recs[4:])
    return d


# --- CRC + framing -----------------------------------------------------------


def test_crc32c_known_answer():
    if not native_available():
        pytest.skip("native codec unavailable")
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # running CRC equals one-shot
    assert crc32c(b"456789", crc32c(b"123")) == 0xE3069283


def test_framing_roundtrip(tmp_path):
    payloads = [b"alpha", b"", b"x" * 1000]
    p = tmp_path / "t.tfrecord"
    tfr.write_tfrecord(p, payloads)
    assert list(tfr.iter_records(p)) == payloads
    idx = tfr.index_tfrecord(p)
    assert [length for _, length in idx] == [5, 0, 1000]


def test_framing_detects_corruption(tmp_path):
    if not native_available():
        pytest.skip("CRC verification needs the native codec")
    p = tmp_path / "t.tfrec"
    tfr.write_tfrecord(p, [b"payload-one", b"payload-two"])
    blob = bytearray(p.read_bytes())
    blob[14] ^= 0xFF  # inside record 0's data
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="data CRC"):
        list(tfr.iter_records(p))
    # length-CRC corruption is caught at indexing time
    blob = bytearray(p.read_bytes())
    blob[14] ^= 0xFF  # restore data
    blob[9] ^= 0xFF  # length CRC of record 0
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="length CRC"):
        tfr.index_tfrecord(p)


def test_truncated_file_detected(tmp_path):
    p = tmp_path / "t.tfrec"
    tfr.write_tfrecord(p, [b"hello world"])
    p.write_bytes(p.read_bytes()[:-6])
    with pytest.raises(ValueError, match="truncated"):
        with open(p, "rb") as f:
            off, length = tfr.index_tfrecord(p)[0]
            tfr.read_record(f, off, length)


# --- Example proto vs the real protobuf runtime ------------------------------


def _oracle_example_class():
    """Build tf.train.Example dynamically with google.protobuf (no protoc,
    no TensorFlow) as an independent wire-format oracle."""
    protobuf = pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "tf_example_oracle.proto"
    fdp.package = "tfo"
    fdp.syntax = "proto3"
    F = descriptor_pb2.FieldDescriptorProto

    def msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    m = msg("BytesList")
    m.field.add(name="value", number=1, label=F.LABEL_REPEATED,
                type=F.TYPE_BYTES)
    m = msg("FloatList")
    m.field.add(name="value", number=1, label=F.LABEL_REPEATED,
                type=F.TYPE_FLOAT)
    m = msg("Int64List")
    m.field.add(name="value", number=1, label=F.LABEL_REPEATED,
                type=F.TYPE_INT64)
    m = msg("Feature")
    m.oneof_decl.add(name="kind")
    for i, (n, t) in enumerate([("bytes_list", "BytesList"),
                                ("float_list", "FloatList"),
                                ("int64_list", "Int64List")], start=1):
        m.field.add(name=n, number=i, label=F.LABEL_OPTIONAL,
                    type=F.TYPE_MESSAGE, type_name=f".tfo.{t}",
                    oneof_index=0)
    m = msg("Features")
    entry = m.nested_type.add()
    entry.name = "FeatureEntry"
    entry.options.map_entry = True
    entry.field.add(name="key", number=1, label=F.LABEL_OPTIONAL,
                    type=F.TYPE_STRING)
    entry.field.add(name="value", number=2, label=F.LABEL_OPTIONAL,
                    type=F.TYPE_MESSAGE, type_name=".tfo.Feature")
    m.field.add(name="feature", number=1, label=F.LABEL_REPEATED,
                type=F.TYPE_MESSAGE, type_name=".tfo.Features.FeatureEntry")
    m = msg("Example")
    m.field.add(name="features", number=1, label=F.LABEL_OPTIONAL,
                type=F.TYPE_MESSAGE, type_name=".tfo.Features")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("tfo.Example"))


def test_parse_example_matches_protobuf_oracle():
    Example = _oracle_example_class()
    ex = Example()
    ex.features.feature["image"].bytes_list.value.append(b"\xff\xd8jpegish")
    ex.features.feature["image_name"].bytes_list.value.append(b"a.jpg")
    ex.features.feature["target"].int64_list.value.extend([3, 12345678901])
    ex.features.feature["score"].float_list.value.extend([0.25, -1.5])
    got = tfr.parse_example(ex.SerializeToString())
    assert got["image"] == [b"\xff\xd8jpegish"]
    assert got["image_name"] == [b"a.jpg"]
    assert got["target"] == [3, 12345678901]
    assert got["score"] == [0.25, -1.5]


def test_make_example_parsed_by_protobuf_oracle():
    Example = _oracle_example_class()
    blob = tfr.make_example(
        {"image": b"rawbytes", "image_name": "b.jpg", "target": 42,
         "weight": 0.5})
    ex = Example.FromString(blob)
    f = ex.features.feature
    assert f["image"].bytes_list.value == [b"rawbytes"]
    assert f["image_name"].bytes_list.value == [b"b.jpg"]
    assert list(f["target"].int64_list.value) == [42]
    assert list(f["weight"].float_list.value) == [0.5]


def test_negative_int64_both_directions_vs_oracle():
    """Negative int64 features: protobuf encodes them as 10-byte
    two's-complement varints. The encoder used to loop forever on them
    (arithmetic right shift converges to -1) and the parser returned the
    raw unsigned value (2^64-1 instead of -1)."""
    Example = _oracle_example_class()

    # ours → oracle
    blob = tfr.make_example({"target": -1})
    assert list(Example.FromString(blob).features.feature[
        "target"].int64_list.value) == [-1]

    # oracle → ours (single varint AND the boundary values)
    ex = Example()
    ex.features.feature["t"].int64_list.value.extend(
        [-1, -(1 << 63), (1 << 63) - 1, 0, 7])
    got = tfr.parse_example(ex.SerializeToString())
    assert got["t"] == [-1, -(1 << 63), (1 << 63) - 1, 0, 7]

    # full round trip through our own writer/parser
    for v in (-1, -123456789, -(1 << 63)):
        assert tfr.parse_example(tfr.make_example({"x": v}))["x"] == [v]

    with pytest.raises(ValueError, match="range"):
        tfr._encode_varint(1 << 64)
    with pytest.raises(ValueError, match="range"):
        tfr._encode_varint(-(1 << 63) - 1)


# --- image source ------------------------------------------------------------


def test_source_len_and_shapes(tfrec_dir):
    src = tfr.TFRecordImageSource(tfrec_dir, size=56)
    assert len(src) == 7
    for i in (0, 3, 6):
        a = src.get(i)
        assert a.shape == (56, 56, 3) and a.dtype == np.uint8


def test_source_pixels_match_folder(tfrec_dir, tmp_path):
    """The same JPEG read through TFRecords and through a folder source
    must produce identical pixels (shared decode + resize path)."""
    src = tfr.TFRecordImageSource(tfrec_dir, size=64)
    with open(sorted(tfrec_dir.glob("*.tfrec"))[0], "rb") as f:
        off, length = tfr.index_tfrecord(
            sorted(tfrec_dir.glob("*.tfrec"))[0])[2]
        rec = tfr.read_record(f, off, length)
    jpeg = tfr.parse_example(rec)["image"][0]
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "only.jpg").write_bytes(jpeg)
    folder = ImageFolderSource(d, size=64)
    np.testing.assert_array_equal(src.get(2), folder.get(0))


def test_source_explicit_key_and_errors(tfrec_dir, tmp_path):
    src = tfr.TFRecordImageSource(tfrec_dir, size=32, image_key="image")
    assert src.get(0).shape == (32, 32, 3)
    bad = tfr.TFRecordImageSource(tfrec_dir, size=32, image_key="nope")
    with pytest.raises(KeyError, match="nope"):
        bad.get(0)
    with pytest.raises(FileNotFoundError):
        tfr.TFRecordImageSource(tmp_path / "empty-missing", size=32)


def test_get_with_name_matches_separate_calls(tfrec_dir):
    """get_with_name (serving's single-read path) must agree with the
    separate get()/name() accessors record for record."""
    src = tfr.TFRecordImageSource(tfrec_dir, size=48)
    for i in (0, 2, 6):
        arr, name = src.get_with_name(i)
        np.testing.assert_array_equal(arr, src.get(i))
        assert name == src.name(i)


def test_source_png_payload(tmp_path):
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    rec = tfr.make_example({"image": buf.getvalue()})
    tfr.write_tfrecord(tmp_path / "png.tfrec", [rec])
    src = tfr.TFRecordImageSource(tmp_path, size=16)
    np.testing.assert_array_equal(src.get(0), img)  # PNG is lossless


# --- loader integration -------------------------------------------------------


def test_make_source_detection(tfrec_dir, tmp_path):
    assert isinstance(make_source(tfrec_dir, 32), tfr.TFRecordImageSource)
    single = sorted(tfrec_dir.glob("*.tfrec"))[0]
    assert isinstance(make_source(single, 32), tfr.TFRecordImageSource)
    d = tmp_path / "jpgs"
    d.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "a.jpg")
    assert isinstance(make_source(d, 32), ImageFolderSource)


def test_unpaired_loader_tfrec_matches_folder(tfrec_dir, tmp_path):
    """Same images, same seed → the tfrec-backed loader yields batches
    pixel-identical to the folder-backed one (epoch streams are
    source-agnostic; folder sources sort by filename, so name records
    to match the shard order)."""
    d = tmp_path / "jpgs"
    d.mkdir()
    k = 0
    for shard in sorted(tfrec_dir.glob("*.tfrec")):
        for rec in tfr.iter_records(shard):
            (d / f"{k:03d}.jpg").write_bytes(
                tfr.parse_example(rec)["image"][0])
            k += 1

    lt = UnpairedLoader(tfrec_dir, tfrec_dir, batch_size=3, size=48,
                        seed=11, num_workers=2, prefetch=1)
    lf = UnpairedLoader(d, d, batch_size=3, size=48,
                        seed=11, num_workers=2, prefetch=1)
    try:
        for _ in range(3):
            (pt, mt), (pf, mf) = next(lt), next(lf)
            np.testing.assert_array_equal(np.asarray(pt), np.asarray(pf))
            np.testing.assert_array_equal(np.asarray(mt), np.asarray(mf))
    finally:
        lt.close()
        lf.close()


def test_cut_schema_accepts_use_tfrec():
    from gan_variant_research_tpu.core.config import CUT_SCHEMA, validate_config

    validate_config(
        {"data": {"photos_tfrec": "x", "monet_tfrec": "y",
                  "use_tfrec": True}},
        CUT_SCHEMA,
    )


# --- pack/unpack bridge CLI ----------------------------------------------------


def test_pack_unpack_bitwise_roundtrip(tmp_path):
    from gan_variant_research_tpu.cli.tfrec_tool import pack, unpack

    rng = np.random.default_rng(5)
    src = tmp_path / "imgs"
    src.mkdir()
    blobs = {}
    for i in range(5):
        b = _jpeg_bytes(rng, h=24 + i, w=30)
        (src / f"pic{i}.jpg").write_bytes(b)
        blobs[f"pic{i}.jpg"] = b

    shards = pack(src, tmp_path / "shards", shard_size=2)
    assert len(shards) == 3  # 2+2+1

    written = unpack(tmp_path / "shards", tmp_path / "unpacked")
    assert sorted(p.name for p in written) == sorted(blobs)
    for p in written:
        assert p.read_bytes() == blobs[p.name]  # bitwise, no re-encode


def test_unpack_sanitizes_names(tmp_path):
    from gan_variant_research_tpu.cli.tfrec_tool import unpack

    rng = np.random.default_rng(6)
    rec = tfr.make_example(
        {"image_name": "../../escape.jpg", "image": _jpeg_bytes(rng)})
    tfr.write_tfrecord(tmp_path / "x.tfrec", [rec])
    written = unpack(tmp_path / "x.tfrec", tmp_path / "out")
    assert written[0].parent == tmp_path / "out"
    assert written[0].name == "escape.jpg"


def test_tfrec_tool_cli_invocation(tmp_path, capsys):
    from gan_variant_research_tpu.cli.tfrec_tool import main

    rng = np.random.default_rng(8)
    src = tmp_path / "imgs"
    src.mkdir()
    (src / "a.jpg").write_bytes(_jpeg_bytes(rng))
    main(["pack", "--images", str(src), "--out", str(tmp_path / "sh")])
    main(["unpack", "--tfrec", str(tmp_path / "sh"),
          "--out", str(tmp_path / "back")])
    assert (tmp_path / "back" / "a.jpg").read_bytes() == \
        (src / "a.jpg").read_bytes()
    # packed shards load through the training source
    assert len(tfr.TFRecordImageSource(tmp_path / "sh", size=16)) == 1


def test_crc32c_python_fallback_matches_native(monkeypatch):
    from gan_variant_research_tpu.data import native_loader as nl

    # RFC 3720 vector holds for the pure-Python path
    assert nl._crc32c_python(b"123456789", 0) == 0xE3069283
    assert nl._crc32c_python(b"", 0) == 0
    # running CRC equals one-shot
    assert nl._crc32c_python(
        b"456789", nl._crc32c_python(b"123", 0)) == 0xE3069283
    if native_available():
        rng = np.random.default_rng(11)
        blob = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        assert nl._crc32c_python(blob, 0) == crc32c(blob)


def test_write_without_native_codec_still_verifiable(tmp_path, monkeypatch):
    """A shard packed on a host where the native codec failed to build must
    carry REAL checksums: zero CRCs would poison the file for every reader
    that verifies (including this repo's own index_tfrecord)."""
    from gan_variant_research_tpu.data import native_loader as nl

    payloads = [b"alpha", b"x" * 257]
    monkeypatch.setattr(nl, "_load", lambda: None)  # simulate missing codec
    tfr.write_tfrecord(tmp_path / "t.tfrec", payloads)
    monkeypatch.undo()
    # read back with verification through whatever path this host has
    assert list(tfr.iter_records(tmp_path / "t.tfrec")) == payloads


def test_unpack_name_collision_keeps_every_record(tmp_path, capsys):
    from gan_variant_research_tpu.cli.tfrec_tool import unpack

    rng = np.random.default_rng(12)
    blobs = [_jpeg_bytes(rng) for _ in range(3)]
    recs = [
        tfr.make_example({"image_name": "same.jpg", "image": blobs[0]}),
        tfr.make_example({"image_name": "same.jpg", "image": blobs[1]}),
        # distinct dirs that collapse to one basename
        tfr.make_example({"image_name": "a/same.jpg", "image": blobs[2]}),
    ]
    tfr.write_tfrecord(tmp_path / "x.tfrec", recs)
    written = unpack(tmp_path / "x.tfrec", tmp_path / "out")
    assert len(written) == len(set(written)) == 3
    assert sorted(p.read_bytes() for p in written) == sorted(blobs)
    assert "collision" in capsys.readouterr().out


def test_unpack_rename_rechecks_seen(tmp_path, capsys):
    """A renamed collision candidate must itself be re-checked against
    already-written names: a record legitimately named same__r2.jpg sits
    exactly where the record-counter rename of a later collision lands."""
    from gan_variant_research_tpu.cli.tfrec_tool import unpack

    rng = np.random.default_rng(13)
    blobs = [_jpeg_bytes(rng) for _ in range(3)]
    recs = [
        # record 2 is the collision (global counter n=2) → candidate
        # same__r2.jpg, which record 0 legitimately owns
        tfr.make_example({"image_name": "same__r2.jpg", "image": blobs[0]}),
        tfr.make_example({"image_name": "same.jpg", "image": blobs[1]}),
        tfr.make_example({"image_name": "same.jpg", "image": blobs[2]}),
    ]
    tfr.write_tfrecord(tmp_path / "x.tfrec", recs)
    written = unpack(tmp_path / "x.tfrec", tmp_path / "out")
    assert len(written) == len(set(written)) == 3
    assert sorted(p.read_bytes() for p in written) == sorted(blobs)
    names = {p.name for p in written}
    assert {"same__r2.jpg", "same.jpg", "same__r3.jpg"} == names


def test_slow_verify_warns_once_without_native_codec(tmp_path, monkeypatch):
    from gan_variant_research_tpu.data import native_loader as nl

    payloads = [b"payload-a", b"payload-b"]
    tfr.write_tfrecord(tmp_path / "t.tfrec", payloads)
    monkeypatch.setattr(nl, "_load", lambda: None)  # simulate missing codec
    monkeypatch.setattr(tfr, "_warned_slow_verify", False)
    with pytest.warns(RuntimeWarning, match="pure-Python"):
        assert list(tfr.iter_records(tmp_path / "t.tfrec")) == payloads
    # one-time: a second verified read stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert list(tfr.iter_records(tmp_path / "t.tfrec")) == payloads


def test_verify_false_skips_slow_crc_warning(tmp_path, monkeypatch):
    from gan_variant_research_tpu.data import native_loader as nl

    payloads = [b"only"]
    tfr.write_tfrecord(tmp_path / "t.tfrec", payloads)
    monkeypatch.setattr(nl, "_load", lambda: None)
    monkeypatch.setattr(tfr, "_warned_slow_verify", False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = list(tfr.iter_records(tmp_path / "t.tfrec", verify=False))
    assert got == payloads


def test_source_close_releases_handles(tfrec_dir):
    src = tfr.TFRecordImageSource(tfrec_dir, size=32)
    src.get(0)
    src.get(5)  # second shard
    assert src._open_handles and all(not f.closed for f in src._open_handles)
    handles = list(src._open_handles)
    src.close()
    assert all(f.closed for f in handles)
    assert not src._open_handles

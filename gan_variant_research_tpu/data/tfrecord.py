"""Dependency-free TFRecord image source (the Kaggle dataset's native format).

The competition dataset ships as TFRecords (``photo_tfrec/``,
``monet_tfrec/``) alongside the JPEG folders. The reference declares
``data.photos_tfrec``/``data.monet_tfrec`` config keys
(configs/train_gan_cutpp.yaml:11-12) but never wires them, and its reader is
vestigial: ``PhotosTFRecordDataset.__getitem__`` raises NotImplementedError
(GAN_Variant1/dataio/photos_dataset.py:93-102) and EVAL's TFDS path is
rejected by its own CLI (EVAL/eval/cli.py:134-136). Here the format is
implemented from scratch with no TensorFlow dependency:

- TFRecord framing: ``uint64le length | masked-crc32c(length) | data |
  masked-crc32c(data)``. CRCs are verified through the native codec's
  CRC32C (data/native/codec.cpp), with a pure-Python table fallback when
  the native library is unavailable — reads always verify and writes
  always emit real checksums (a shard written with zero CRCs would be
  rejected as corrupt by every standard TFRecord reader).
- A minimal ``tf.train.Example`` protobuf walk (varint keys, the four wire
  types) extracting bytes/float/int64 features — enough for the dataset's
  ``{image_name, image, target}`` schema and any Example whose image lives
  in a bytes feature.

``TFRecordImageSource`` exposes the same ``__len__``/``get`` surface as
``ImageFolderSource`` (data/loader.py), so the unpaired loader's epoch
streams, multi-host slicing, and resume fast-forward all apply unchanged.
Random access uses a one-pass offset index per file (built at startup by
seeking over the framing — no record payloads are read or decoded).
"""

from __future__ import annotations

import struct
import threading
from pathlib import Path

import numpy as np

from gan_variant_research_tpu.data.native_loader import crc32c, decode_jpeg

_CRC_MASK_DELTA = 0xA282EAD8


def _masked_crc(data: bytes) -> int:
    # crc32c never fails: native codec when built, pure-Python table
    # fallback otherwise (native_loader.crc32c) — so writes always emit real
    # checksums and reads always verify
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + _CRC_MASK_DELTA) & 0xFFFFFFFF


def index_tfrecord(path: str | Path) -> list[tuple[int, int]]:
    """One framing pass over a TFRecord file → [(data_offset, length)].

    Verifies each length CRC (cheap: 12 bytes/record) when the native
    CRC32C is available; payloads are not read here.
    """
    index: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        pos = 0
        while True:
            header = f.read(12)
            if not header:
                break
            if len(header) < 12:
                raise ValueError(f"{path}: truncated record header at {pos}")
            (length,) = struct.unpack("<Q", header[:8])
            (len_crc,) = struct.unpack("<I", header[8:12])
            expect = _masked_crc(header[:8])
            if expect != len_crc:
                raise ValueError(f"{path}: corrupt length CRC at {pos}")
            index.append((pos + 12, length))
            pos += 12 + length + 4
            f.seek(pos)
    return index


_warned_slow_verify = False


def _warn_if_slow_verify() -> None:
    """One-time heads-up when payload CRC verification is about to run on
    the ~10 MB/s pure-Python CRC32C (native codec unavailable): ~25 ms per
    256 KB record, a real training-throughput tax. Writes stay mandatory —
    a shard written without checksums is poisoned for every other reader —
    but reads of trusted local shards can opt out."""
    global _warned_slow_verify
    if _warned_slow_verify:
        return
    _warned_slow_verify = True
    from gan_variant_research_tpu.data.native_loader import native_available

    if not native_available():
        import warnings

        warnings.warn(
            "native CRC32C codec unavailable: TFRecord payload verification "
            "is using the ~10 MB/s pure-Python fallback. For trusted local "
            "shards pass verify=False to TFRecordImageSource (or "
            "iter_records) to skip payload CRCs on the read path.",
            RuntimeWarning, stacklevel=3,
        )


def read_record(f, offset: int, length: int, verify: bool = True) -> bytes:
    """Read one framed record payload (and its trailing CRC) at offset."""
    f.seek(offset)
    blob = f.read(length + 4)
    if len(blob) < length + 4:
        raise ValueError(f"truncated record at {offset}")
    data = blob[:length]
    if verify:
        _warn_if_slow_verify()
        (data_crc,) = struct.unpack("<I", blob[length:])
        expect = _masked_crc(data)
        if expect != data_crc:
            raise ValueError(f"corrupt record data CRC at {offset}")
    return data


def iter_records(path: str | Path, verify: bool = True):
    """Yield every record payload in a TFRecord file, in order."""
    with open(path, "rb") as f:
        for offset, length in index_tfrecord(path):
            yield read_record(f, offset, length, verify=verify)


# --- minimal protobuf (tf.train.Example) ------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _to_int64(v: int) -> int:
    """Varints are decoded unsigned; Int64List values are signed two's
    complement (a negative int64 arrives as a 10-byte varint ≥ 2^63)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _walk(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's fields.

    Wire types: 0 → varint int; 1 → 8 raw bytes; 2 → bytes slice;
    5 → 4 raw bytes. Groups (3/4) are rejected — tf.train.Example has none.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 1:
            value, pos = buf[pos : pos + 8], pos + 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value, pos = buf[pos : pos + length], pos + length
        elif wire == 5:
            value, pos = buf[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _parse_list(kind: int, buf: bytes):
    """Parse BytesList/FloatList/Int64List (all: repeated field 1)."""
    out: list = []
    for field, wire, value in _walk(buf):
        if field != 1:
            continue
        if kind == 1:  # bytes
            out.append(value)
        elif kind == 2:  # float: packed (wire 2) or single fixed32 (wire 5)
            if wire == 5:
                out.append(struct.unpack("<f", value)[0])
            else:
                out.extend(
                    struct.unpack(f"<{len(value) // 4}f", value))
        else:  # int64: packed (wire 2) or single varint (wire 0)
            if wire == 0:
                out.append(_to_int64(value))
            else:
                pos = 0
                while pos < len(value):
                    v, pos = _read_varint(value, pos)
                    out.append(_to_int64(v))
    return out


def parse_example(record: bytes) -> dict[str, list]:
    """tf.train.Example → {feature name: list of bytes/float/int values}."""
    features: dict[str, list] = {}
    for field, _, value in _walk(record):
        if field != 1:  # Example.features
            continue
        for f2, _, entry in _walk(value):
            if f2 != 1:  # Features.feature (map entry)
                continue
            name = None
            payload: list = []
            for f3, _, v3 in _walk(entry):
                if f3 == 1:
                    name = v3.decode("utf-8")
                elif f3 == 2:  # Feature: oneof bytes/float/int64 list
                    for kind, _, lst in _walk(v3):
                        payload = _parse_list(kind, lst)
            if name is not None:
                features[name] = payload
    return features


# --- image source ------------------------------------------------------------

_IMAGE_MAGICS = (b"\xff\xd8\xff", b"\x89PNG")


def _example_image_bytes(record: bytes, image_key: str | None) -> bytes:
    features = parse_example(record)
    if image_key is not None:
        if image_key not in features or not features[image_key]:
            raise KeyError(
                f"feature {image_key!r} not in example "
                f"(has {sorted(features)})")
        return features[image_key][0]
    # auto-detect: the bytes feature that looks like an encoded image
    for name in ("image", "image/encoded"):
        vals = features.get(name)
        if vals and isinstance(vals[0], bytes):
            return vals[0]
    for name, vals in sorted(features.items()):
        if vals and isinstance(vals[0], bytes) and vals[0][:4].startswith(
                _IMAGE_MAGICS):
            return vals[0]
    raise KeyError(
        f"no encoded-image bytes feature found (has {sorted(features)})")


class TFRecordImageSource:
    """Random-access uint8 image source over a dir of ``*.tfrec*`` files.

    Same surface as ImageFolderSource: ``len(src)`` and ``src.get(idx)`` →
    HWC uint8 RGB at ``size``². Files are indexed once at startup; reads
    use per-thread file handles (the loader decodes from a thread pool).

    ``verify=False`` skips per-read payload CRCs — recommended for trusted
    local shards on hosts where the native codec failed to build (the
    pure-Python CRC32C fallback costs ~25 ms per 256 KB record; a one-time
    RuntimeWarning fires when that path engages). Framing/length CRCs at
    index time are cheap (12 bytes/record) and always checked.
    """

    def __init__(self, folder: str | Path, size: int,
                 image_key: str | None = None, verify: bool = True,
                 resample: str = "bicubic"):
        folder = Path(folder)
        if folder.is_file():
            files = [folder]
        else:
            files = sorted(
                p for p in folder.glob("*")
                if p.suffix.lower() in (".tfrec", ".tfrecord"))
        if not files:
            raise FileNotFoundError(f"No *.tfrec / *.tfrecord in {folder}")
        self.size = size
        self.image_key = image_key
        self.verify = verify
        # bicubic matches the training loader's load-resize; serving
        # (cli/generate_folder.py) passes bilinear — the reference's
        # inference preprocess contract (generate_folder.py resize)
        if resample not in ("bicubic", "bilinear"):
            raise ValueError(f"resample must be bicubic|bilinear, got {resample}")
        self.resample = resample
        self._entries: list[tuple[Path, int, int]] = []
        for f in files:
            for offset, length in index_tfrecord(f):
                self._entries.append((f, offset, length))
        if not self._entries:
            raise ValueError(f"No records in {folder}")
        self._tls = threading.local()
        # every handle any pool thread opens, for close(): thread-local
        # storage alone leaks one fd per (thread, shard) for the life of the
        # thread — num_workers × shards handles per source, enough to hit
        # EMFILE on default rlimits when sources are built repeatedly
        self._open_handles: list = []
        self._handles_lock = threading.Lock()

    def __len__(self):
        return len(self._entries)

    def close(self) -> None:
        """Close every shard handle opened by any thread. The source must
        not be read after close() (reads raise on the closed handles)."""
        with self._handles_lock:
            for fh in self._open_handles:
                try:
                    fh.close()
                except OSError:
                    pass
            self._open_handles.clear()

    def entries(self) -> list[tuple[Path, int, int]]:
        """The record index: (shard path, data offset, payload length) per
        record, in source order. Payload lengths double as the 'file size'
        in eval dataset hashing (evalsuite/datasets.py TFRecordEntry)."""
        return list(self._entries)

    def _file(self, path: Path):
        handles = getattr(self._tls, "handles", None)
        if handles is None:
            handles = self._tls.handles = {}
        fh = handles.get(path)
        if fh is None:
            fh = handles[path] = open(path, "rb")
            with self._handles_lock:
                self._open_handles.append(fh)
        return fh

    def _record(self, idx: int) -> bytes:
        path, offset, length = self._entries[idx]
        return read_record(self._file(path), offset, length,
                           verify=self.verify)

    def _name_from(self, record: bytes, idx: int) -> str:
        vals = parse_example(record).get("image_name")
        if vals and isinstance(vals[0], bytes) and vals[0]:
            return vals[0].decode("utf-8", errors="replace")
        return f"{idx:05d}.jpg"

    def name(self, idx: int) -> str:
        """Per-record output name: the ``image_name`` feature when present
        (the Kaggle schema), else a stable zero-padded index. Lets serving
        (cli/generate_folder.py) mirror record identity into a file tree."""
        return self._name_from(self._record(idx), idx)

    def get_with_name(self, idx: int) -> tuple[np.ndarray, str]:
        """Decode AND name one record from a single read+parse — serving
        (cli/generate_folder.py) needs both and shouldn't pay the record
        I/O twice."""
        record = self._record(idx)
        return (self._decode(record), self._name_from(record, idx))

    def get(self, idx: int) -> np.ndarray:
        return self._decode(self._record(idx))

    def _decode(self, record: bytes) -> np.ndarray:
        data = _example_image_bytes(record, self.image_key)
        arr = decode_jpeg(data)
        if arr is None:  # non-JPEG payloads (e.g. PNG) → PIL
            import io

            from PIL import Image

            with Image.open(io.BytesIO(data)) as im:
                arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
        if arr.shape[:2] != (self.size, self.size):
            from PIL import Image

            flt = (Image.BICUBIC if self.resample == "bicubic"
                   else Image.BILINEAR)
            arr = np.asarray(
                Image.fromarray(arr).resize((self.size, self.size), flt),
                dtype=np.uint8)
        return arr


# --- writer (test + export utility) ------------------------------------------


def _encode_varint(v: int) -> bytes:
    # protobuf encodes negative int64s as their 64-bit two's complement
    # (a 10-byte varint); without the mask the arithmetic right shift
    # converges to -1 and the loop never terminates
    if not -(1 << 63) <= v < (1 << 64):
        raise ValueError(f"varint out of 64-bit range: {v}")
    if v < 0:
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    head = _encode_varint(num << 3 | wire)
    if wire == 2:
        return head + _encode_varint(len(payload)) + payload
    return head + payload


def make_example(features: dict[str, bytes | str | float | int]) -> bytes:
    """Serialize a flat dict to a tf.train.Example (one value per feature)."""
    entries = b""
    for name, value in features.items():
        if isinstance(value, str):
            value = value.encode("utf-8")
        if isinstance(value, bytes):
            lst = _field(1, 2, _field(1, 2, value))  # BytesList in kind 1
        elif isinstance(value, float):
            lst = _field(2, 2, _field(1, 5, struct.pack("<f", value)))
        else:
            lst = _field(3, 2, _field(1, 0, _encode_varint(int(value))))
        entry = _field(1, 2, name.encode("utf-8")) + _field(2, 2, lst)
        entries += _field(1, 2, entry)
    return _field(1, 2, entries)  # Example.features


def write_tfrecord(path: str | Path, records: list[bytes]) -> None:
    """Write framed records with proper masked CRCs (always — the CRC has a
    pure-Python fallback, so a host without the native codec still writes
    shards any standard TFRecord reader accepts)."""
    with open(path, "wb") as f:
        for data in records:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(data)
            f.write(struct.pack("<I", _masked_crc(data)))

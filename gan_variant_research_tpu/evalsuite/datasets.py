"""Eval data loading — behavior of EVAL/eval/datasets.py: images decoded to
RGB, PIL-bilinear resized to img_size² (299 for Inception), uint8 [0,255].
Layout is NHWC (TPU-native) instead of the reference's CHW. The torch
DataLoader worker pool becomes a thread pool (decode releases the GIL)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from types import SimpleNamespace
from typing import Iterator

import numpy as np
from PIL import Image

_TFREC_EXTS = (".tfrec", ".tfrecord")


def is_tfrecord_input(path: str | Path) -> bool:
    """True for a ``*.tfrec*`` file or a directory containing such files —
    the same detection rule as the training loader (data/loader.py
    ``make_source``) and ``generate_folder``."""
    p = Path(path)
    if p.is_file():
        return p.suffix.lower() in _TFREC_EXTS
    return p.is_dir() and any(
        c.suffix.lower() in _TFREC_EXTS for c in p.iterdir())


class TFRecordEntry:
    """Path-like handle to one record of a TFRecord shard.

    Duck-types the slice of the ``pathlib.Path`` surface the eval pipeline
    touches (``name``/``suffix``/``stat().st_size``/``as_posix``/
    ``relative_to``/ordering), so shards flow through the reference's
    file-based enumeration → validation → hashing → extraction → report
    contracts (EVAL/eval/utils.py:13-210) unchanged:

    - ``name`` is the record's ``image_name`` feature (the Kaggle schema) —
      overlap checks and worst-case reports stay meaningful;
    - ``stat().st_size`` is the record payload length — the SHA1 dataset
      hash (``relpath:size`` lines) keys on record identity, so the real-
      stats cache invalidates when shard contents change;
    - ``load(img_size)`` decodes + bilinear-resizes via
      ``TFRecordImageSource`` (identical pixels to unpacking the shard and
      reading the file, since the embedded bytes ARE the original JPEG).
    """

    __slots__ = ("_src", "index", "_name", "_size", "_shard")

    def __init__(self, src, index: int, name: str, size: int, shard: str):
        self._src = src
        self.index = index
        self._name = name
        self._size = size
        self._shard = shard

    @property
    def name(self) -> str:
        return self._name

    @property
    def suffix(self) -> str:
        return Path(self._name).suffix

    def load(self, img_size: int) -> np.ndarray:
        if self._src.size != img_size:
            raise ValueError(
                f"TFRecord source decodes at {self._src.size}², caller asked "
                f"for {img_size}² — enumerate with the same img_size")
        return self._src.get(self.index)

    def stat(self):
        return SimpleNamespace(st_size=self._size)

    def relative_to(self, base):  # hash falls back to as_posix() (utils.py)
        raise ValueError(f"{self!s} is a TFRecord record, not under {base}")

    def as_posix(self) -> str:
        return f"{self._shard}/{self._name}"

    def _key(self):
        return (self._shard, self.index)

    def __lt__(self, other):
        return self._key() < other._key()

    def __eq__(self, other):
        return isinstance(other, TFRecordEntry) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __str__(self):
        return self.as_posix()

    def __repr__(self):
        return f"TFRecordEntry({self.as_posix()!r})"


def enumerate_eval_inputs(path: str | Path, img_size: int = 299) -> list:
    """Enumerate an eval input: a folder of images (→ ``list[Path]``,
    reference behavior) or TFRecord shards (→ ``list[TFRecordEntry]``,
    beyond-reference — the Kaggle dataset's native format evaluates without
    an unpack step; the reference CLI rejects its non-folder mode outright,
    EVAL/eval/cli.py:134-136)."""
    from gan_variant_research_tpu.evalsuite.utils import enumerate_images

    p = Path(path)
    if not is_tfrecord_input(p):
        return enumerate_images(p)

    from gan_variant_research_tpu.data.tfrecord import TFRecordImageSource

    src = TFRecordImageSource(p, img_size, resample="bilinear")
    return [
        TFRecordEntry(src, i, src.name(i), length, shard.name)
        for i, (shard, _offset, length) in enumerate(src.entries())
    ]


def load_eval_image(path: str | Path | TFRecordEntry,
                    img_size: int = 299) -> np.ndarray:
    """uint8 HWC, RGB, bilinear-resized to img_size² (datasets.py:48-66).

    JPEGs decode through the native libjpeg path (pixel-identical to PIL —
    pinned by test_native_matches_pil — so FID parity is unaffected);
    resampling stays PIL-bilinear either way for exact reference parity.
    ``TFRecordEntry`` inputs decode straight from their shard."""
    from gan_variant_research_tpu.data.native_loader import decode_jpeg

    if isinstance(path, TFRecordEntry):
        return path.load(img_size)
    arr = decode_jpeg(path)
    if arr is not None:
        if arr.shape[:2] != (img_size, img_size):
            im = Image.fromarray(arr).resize((img_size, img_size),
                                             Image.BILINEAR)
            arr = np.asarray(im, dtype=np.uint8)
        return arr
    with Image.open(path) as img:
        if img.mode != "RGB":
            img = img.convert("RGB")
        if img.size != (img_size, img_size):
            img = img.resize((img_size, img_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


def iter_batches(
    paths: list[Path],
    batch_size: int = 64,
    img_size: int = 299,
    num_workers: int = 8,
    pad_to_batch: bool = True,
) -> Iterator[tuple[np.ndarray, int]]:
    """Yield (uint8 NHWC batch, n_valid). Batches are padded to a fixed
    shape so the jitted feature extractor compiles once; ``n_valid`` marks
    the real rows in the final batch."""
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            imgs = list(pool.map(lambda p: load_eval_image(p, img_size), chunk))
            batch = np.stack(imgs)
            n_valid = len(chunk)
            if pad_to_batch and n_valid < batch_size:
                pad = np.zeros((batch_size - n_valid, *batch.shape[1:]), np.uint8)
                batch = np.concatenate([batch, pad])
            yield batch, n_valid

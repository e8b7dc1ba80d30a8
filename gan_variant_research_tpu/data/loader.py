"""Threaded host loader producing fixed-shape uint8 NHWC batches.

Replaces the reference's DataLoader worker-process pools
(train_cutpp.py:139-157: 8 workers, prefetch 4, pin_memory). On TPU the
host's only jobs are JPEG decode and an optional fixed-size resize — all
augmentation runs on device (data/augment.py) — so a thread pool (PIL
decode releases the GIL) plus a bounded prefetch queue suffices and avoids
process-spawn overhead. Unpaired sampling keeps the reference's semantics:
two independently reshuffled infinite epoch streams (train_cutpp.py:417-429).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
from PIL import Image

from gan_variant_research_tpu.data.folders import list_images


def load_image_u8(path: str | Path, size: int | None = None) -> np.ndarray:
    """Decode to RGB uint8 HWC; optionally bicubic-resize to size².

    JPEGs go through the native libjpeg decoder (GIL-free, no PIL object
    overhead — gan_variant_research_tpu/data/native); anything it can't
    handle falls back to PIL."""
    from gan_variant_research_tpu.data.native_loader import decode_jpeg

    arr = decode_jpeg(path)
    if arr is not None:
        if size is not None and arr.shape[:2] != (size, size):
            im = Image.fromarray(arr).resize((size, size), Image.BICUBIC)
            arr = np.asarray(im, dtype=np.uint8)
        return arr
    with Image.open(path) as im:
        im = im.convert("RGB")
        if size is not None and im.size != (size, size):
            im = im.resize((size, size), Image.BICUBIC)
        return np.asarray(im, dtype=np.uint8)


class ImageFolderSource:
    """A folder of images decoded to a fixed uint8 resolution."""

    def __init__(self, folder: str | Path, size: int):
        self.paths = list_images(folder)
        if not self.paths:
            raise FileNotFoundError(f"No images found in {folder}")
        self.size = size

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> np.ndarray:
        return load_image_u8(self.paths[idx], self.size)


def make_source(path: str | Path, size: int):
    """Source factory: TFRecordImageSource for a ``*.tfrec*`` file or a
    directory containing such files (the Kaggle dataset's native format,
    data/tfrecord.py); ImageFolderSource otherwise. Both expose the same
    ``__len__``/``get`` surface, so the epoch streams, multi-host slicing,
    and resume fast-forward are source-agnostic.

    An already-built source passes through unchanged, so callers that need
    the source before the loader exists (e.g. the CycleGAN loop's
    steps-per-epoch count) construct it once — a TFRecord source pays a
    full framing/CRC index pass over every shard at construction."""
    if not isinstance(path, (str, Path)):  # a prebuilt source object
        return path
    p = Path(path)
    tfrec_exts = (".tfrec", ".tfrecord")
    if p.is_file() and p.suffix.lower() in tfrec_exts:
        from gan_variant_research_tpu.data.tfrecord import TFRecordImageSource

        return TFRecordImageSource(p, size)
    if p.is_dir() and any(
            c.suffix.lower() in tfrec_exts for c in p.iterdir()):
        from gan_variant_research_tpu.data.tfrecord import TFRecordImageSource

        return TFRecordImageSource(p, size)
    return ImageFolderSource(p, size)


class _EpochStream:
    """Infinite stream of GLOBAL batch indices: reshuffles per epoch,
    drop_last=True (matching the reference loaders, train_cutpp.py:139-157).

    The index sequence is a pure function of (seed, len(source), batch_size)
    — every process of a multi-host run computes the identical global order
    and decodes only its slice, and ``skip(n)`` fast-forwards the stream
    without decoding (deterministic resume)."""

    def __init__(self, source, batch_size: int, seed: int,
                 pool: ThreadPoolExecutor):
        # source: anything with __len__ and get(idx) -> HWC uint8
        # (ImageFolderSource or tfrecord.TFRecordImageSource)
        if len(source) < batch_size:
            # drop_last semantics have no full batch to yield; without this
            # the epoch slice would silently come up short and the fixed-shape
            # jit step would fail far from the cause
            raise ValueError(
                f"Dataset has {len(source)} images < batch_size {batch_size}; "
                "drop_last leaves no complete batch (shrink the batch or add "
                "data)"
            )
        self.source = source
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.pool = pool
        self._order: list[int] = []
        self._pos = 0

    def next_indices(self) -> list[int]:
        if self._pos + self.batch_size > len(self._order):
            self._order = self.rng.permutation(len(self.source)).tolist()
            self._pos = 0
        idx = self._order[self._pos : self._pos + self.batch_size]
        self._pos += self.batch_size
        return idx

    def skip(self, n: int) -> None:
        """Advance the index stream by n batches (no decode)."""
        for _ in range(n):
            self.next_indices()

    def decode(self, idx: list[int]) -> np.ndarray:
        imgs = list(self.pool.map(self.source.get, idx))
        return np.stack(imgs, axis=0)

    def next_batch(self) -> np.ndarray:
        return self.decode(self.next_indices())


class UnpairedLoader:
    """Two-domain unpaired loader with background prefetch.

    ``__next__`` yields (photos_u8, monets_u8) uint8 NHWC batches. A
    producer thread keeps ``prefetch`` batches decoded ahead of the step.

    Multi-host DP (SURVEY.md §2.4/§5 "per-host data sharding"):
    ``batch_size`` is always the GLOBAL batch. With ``process_bounds=(lo,
    hi)`` (from ``parallel.mesh.process_batch_bounds``) each process decodes
    only rows [lo, hi) of the shared global index order — the order is a
    pure function of the seed, so all hosts agree on it without
    communication, and the slices are disjoint by construction (no fold of
    ``process_index`` into the seed: that would give every host a DIFFERENT
    global order instead of a distinct slice of the same one, breaking
    single-process trajectory equivalence). The staged batch is assembled
    into one global jax.Array from per-device local transfers (see _stage).

    ``start_step`` fast-forwards both index streams (no decode) so a resumed
    run consumes exactly the batches an uninterrupted run would have seen.
    """

    def __init__(
        self,
        photos_dir: str | Path,
        monet_dir: str | Path,
        batch_size: int,
        size: int,
        seed: int = 42,
        num_workers: int = 8,
        prefetch: int = 4,
        device_sharding=None,
        process_bounds: tuple[int, int] | None = None,
        start_step: int = 0,
    ):
        # With ``device_sharding`` (a jax.sharding.Sharding) the producer
        # thread stages each batch on device ahead of the step, so the H2D
        # copy overlaps decode/compute instead of serializing inside the jit
        # dispatch — measured 240 vs 785-2200 ms/step at batch 32×256² on
        # the tunneled v5e when the step had to pull numpy args itself.
        self.device_sharding = device_sharding
        self.global_batch = batch_size
        lo, hi = process_bounds if process_bounds is not None else (0, batch_size)
        if not (0 <= lo < hi <= batch_size):
            raise ValueError(f"process_bounds {lo, hi} outside batch {batch_size}")
        self._bounds = (lo, hi)
        self._multiprocess = (hi - lo) != batch_size
        if self._multiprocess and device_sharding is None:
            raise ValueError(
                "Multi-host loading (process_bounds a strict slice) requires "
                "device_sharding to assemble the global array"
            )
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self.photos = _EpochStream(
            make_source(photos_dir, size), batch_size, seed, self.pool
        )
        self.monets = _EpochStream(
            make_source(monet_dir, size), batch_size, seed + 1, self.pool
        )
        if start_step:
            self.photos.skip(start_step)
            self.monets.skip(start_step)
        self._q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    @property
    def num_photos(self):
        return len(self.photos.source)

    @property
    def num_monets(self):
        return len(self.monets.source)

    def _stage(self, local_p: np.ndarray, local_m: np.ndarray):
        import jax

        if not self._multiprocess:
            return jax.device_put((local_p, local_m), self.device_sharding)

        # Assemble the global array from per-device local transfers +
        # metadata (make_array_from_single_device_arrays). Deliberately NOT
        # make_array_from_process_local_data: that helper may insert a
        # collective reshard, and THIS runs on the producer thread —
        # collectives issued from a second thread interleave with the main
        # thread's step collectives in a different order on each process,
        # which deadlocks the backend's communicator setup (measured: flaky
        # 30 s gloo context-init timeouts). This path is pure local
        # device_puts, so it is thread-safe by construction.
        def assemble(x):
            gshape = (self.global_batch, *x.shape[1:])
            lo = self._bounds[0]
            imap = self.device_sharding.addressable_devices_indices_map(gshape)
            shards = [
                jax.device_put(
                    x[(idx[0].start or 0) - lo:
                      (gshape[0] if idx[0].stop is None else idx[0].stop) - lo],
                    d,
                )
                for d, idx in imap.items()
            ]
            return jax.make_array_from_single_device_arrays(
                gshape, self.device_sharding, shards
            )

        return assemble(local_p), assemble(local_m)

    def _produce(self):
        lo, hi = self._bounds
        try:
            while not self._stop.is_set():
                # every process draws the same GLOBAL indices, decodes its slice
                idx_p = self.photos.next_indices()[lo:hi]
                idx_m = self.monets.next_indices()[lo:hi]
                batch = (self.photos.decode(idx_p), self.monets.decode(idx_m))
                if self.device_sharding is not None:
                    batch = self._stage(*batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            # surface decode/staging errors in the consumer instead of dying
            # silently here (which would hang __next__ forever); the sticky
            # self._error keeps re-raising on EVERY later __next__ — the
            # queued copy is delivered exactly once, so a caller that catches
            # and retries (or a second consumer) must not block forever
            self._error = e
            while not self._stop.is_set():
                try:
                    self._q.put(e, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._error is not None:
            raise self._error
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        # Drain-and-join until the producer has ACTUALLY exited: it can be
        # blocked on a full queue (drains below unblock it within its 0.5 s
        # put timeout) or mid-decode (one batch of single-image pool.map
        # tasks — bounded work). Closing the shard handles while those
        # decodes are still reading raised ValueError into abandoned
        # futures, so source close must come last, after the pool is idle.
        deadline = 30.0
        while self._thread.is_alive() and deadline > 0:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.5)
            deadline -= 0.5
        if self._thread.is_alive():
            # pathological hang (e.g. a wedged device transfer): leak the
            # handles rather than inject read-after-close errors
            self.pool.shutdown(wait=False, cancel_futures=True)
            return
        # producer exited ⇒ its pool.map calls returned ⇒ no decode reads
        # are in flight; wait=True reaps any cancelled stragglers
        self.pool.shutdown(wait=True, cancel_futures=True)
        # release per-thread shard handles (TFRecordImageSource.close) —
        # folder sources have no retained fds and no close()
        for src in (self.photos.source, self.monets.source):
            closer = getattr(src, "close", None)
            if closer is not None:
                closer()

"""Eval data loading — behavior of EVAL/eval/datasets.py: images decoded to
RGB, PIL-bilinear resized to img_size² (299 for Inception), uint8 [0,255].
Layout is NHWC (TPU-native) instead of the reference's CHW. The torch
DataLoader worker pool becomes a thread pool (decode releases the GIL)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator

import numpy as np
from PIL import Image


def load_eval_image(path: str | Path, img_size: int = 299) -> np.ndarray:
    """uint8 HWC, RGB, bilinear-resized to img_size² (datasets.py:48-66).

    JPEGs decode through the native libjpeg path (pixel-identical to PIL —
    pinned by test_native_matches_pil — so FID parity is unaffected);
    resampling stays PIL-bilinear either way for exact reference parity."""
    from gan_variant_research_tpu.data.native_loader import decode_jpeg

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

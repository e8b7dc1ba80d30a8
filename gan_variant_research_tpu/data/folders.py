"""Image-folder enumeration with the reference's conventions.

- ``list_images``: sorted non-recursive glob over {jpg,jpeg,png} both cases
  (GAN_Variant1/dataio/photos_dataset.py:16-24, Basic_GAN/src/data.py:29-33).
- ``enumerate_images``: sorted recursive enumeration over the same set plus
  bmp/webp — the eval-side variant (EVAL/eval/utils.py:13-46,
  generate_folder.py:170-172 uses 7 extensions recursively).
"""

from __future__ import annotations

from pathlib import Path

_BASIC_EXTS = {".jpg", ".jpeg", ".png"}
_EVAL_EXTS = _BASIC_EXTS | {".bmp", ".webp", ".tif", ".tiff"}


def list_images(folder: str | Path) -> list[Path]:
    folder = Path(folder)
    if not folder.is_dir():
        raise FileNotFoundError(f"Image folder not found: {folder}")
    return sorted(
        p for p in folder.iterdir()
        if p.is_file() and p.suffix.lower() in _BASIC_EXTS
    )


def enumerate_images(folder: str | Path, recursive: bool = True) -> list[Path]:
    folder = Path(folder)
    if not folder.is_dir():
        raise FileNotFoundError(f"Image folder not found: {folder}")
    it = folder.rglob("*") if recursive else folder.glob("*")
    return sorted(p for p in it if p.is_file() and p.suffix.lower() in _EVAL_EXTS)

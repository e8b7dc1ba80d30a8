"""TFRecord ⇄ image-folder bridge.

The Kaggle dataset ships both JPEG folders and TFRecord shards of the SAME
images (photo_jpg/photo_tfrec, monet_jpg/monet_tfrec). Training, the eval
CLI, and ``generate_folder`` all read shards directly (``data.use_tfrec``
/ auto-detection — data/tfrecord.py, evalsuite/datasets.py), so this tool
is for interop with OTHER file-tree-based tooling (e.g. the reference's
torch pipeline, manual inspection) in both directions:

    # unpack shards to a folder (bitwise JPEG extraction, no re-encode)
    python -m gan_variant_research_tpu.cli.tfrec_tool unpack \
        --tfrec data/monet_tfrec --out data/monet_jpg

    # pack a folder into shards (bitwise JPEG embedding, no re-encode)
    python -m gan_variant_research_tpu.cli.tfrec_tool pack \
        --images data/monet_jpg --out data/monet_tfrec --shard-size 512

Records use the dataset's ``{image_name, image, target}`` schema, so packed
shards round-trip through this tool and load in any standard TFRecord
reader. The reference has no counterpart (its TFRecord path is vestigial,
dataio/photos_dataset.py:93-102).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from gan_variant_research_tpu.data import tfrecord as tfr
from gan_variant_research_tpu.data.folders import enumerate_images


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TFRecord <-> image folder bridge")
    sub = p.add_subparsers(dest="cmd", required=True)

    u = sub.add_parser("unpack", help="extract images from TFRecord shards")
    u.add_argument("--tfrec", required=True,
                   help="Shard directory (or a single .tfrec file)")
    u.add_argument("--out", required=True, help="Output image folder")
    u.add_argument("--image-key", default=None,
                   help="Bytes feature holding the image (default: auto)")
    u.add_argument("--name-key", default="image_name",
                   help="Feature holding the output filename")

    k = sub.add_parser("pack", help="pack an image folder into shards")
    k.add_argument("--images", required=True, help="Input image folder")
    k.add_argument("--out", required=True, help="Output shard directory")
    k.add_argument("--shard-size", type=int, default=512,
                   help="Records per shard")
    return p.parse_args(argv)


def unpack(tfrec: str | Path, out: str | Path, image_key: str | None = None,
           name_key: str = "image_name") -> list[Path]:
    """Write every record's original encoded bytes to ``out``. Names come
    from ``name_key`` when present (flat basenames only — a record cannot
    escape the output tree), else a zero-padded counter."""
    src = Path(tfrec)
    files = ([src] if src.is_file() else sorted(
        p for p in src.glob("*") if p.suffix.lower() in (".tfrec", ".tfrecord")))
    if not files:
        raise FileNotFoundError(f"No *.tfrec / *.tfrecord under {src}")
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    seen: set[Path] = set()
    n = 0
    for shard in files:
        for rec in tfr.iter_records(shard):
            features = tfr.parse_example(rec)
            data = tfr._example_image_bytes(rec, image_key)
            name = None
            vals = features.get(name_key)
            if vals and isinstance(vals[0], bytes):
                name = Path(vals[0].decode("utf-8", "replace")).name
            if not name:
                name = f"{n:06d}.jpg"
            if not Path(name).suffix:
                name += ".jpg"
            dst = out / name
            if dst in seen:
                # duplicate image_name across shards (or names that collapse
                # to one basename) — overwriting would silently drop records.
                # Re-check the renamed candidate too: a record legitimately
                # named e.g. x__r2.jpg must not be clobbered by (or clobber)
                # a renamed collision (mirrors generate_folder.save_img's
                # __dupN loop).
                stem, suffix, k = dst.stem, dst.suffix, n
                while (out / f"{stem}__r{k}{suffix}") in seen:
                    k += 1
                dst = out / f"{stem}__r{k}{suffix}"
                print(f"Warning: name collision for {name}; "
                      f"writing {dst.name}")
            seen.add(dst)
            dst.write_bytes(data)
            written.append(dst)
            n += 1
    print(f"Unpacked {n} images from {len(files)} shard(s) -> {out}")
    return written


def pack(images: str | Path, out: str | Path, shard_size: int = 512) -> list[Path]:
    """Embed every image file (bitwise) into ``{image_name, image, target}``
    records, sharded ``part-XX.tfrec``."""
    paths = enumerate_images(Path(images), recursive=True)
    if not paths:
        raise FileNotFoundError(f"No images under {images}")
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    shards: list[Path] = []
    for s in range(0, len(paths), shard_size):
        chunk = paths[s : s + shard_size]
        records = [
            tfr.make_example({
                "image_name": p.name,
                "image": p.read_bytes(),
                "target": 0,
            })
            for p in chunk
        ]
        shard = out / f"part-{len(shards):02d}.tfrec"
        tfr.write_tfrecord(shard, records)
        shards.append(shard)
    print(f"Packed {len(paths)} images -> {len(shards)} shard(s) in {out}")
    return shards


def main(argv=None):
    args = parse_args(argv)
    if args.cmd == "unpack":
        unpack(args.tfrec, args.out, image_key=args.image_key,
               name_key=args.name_key)
    else:
        pack(args.images, args.out, shard_size=args.shard_size)


if __name__ == "__main__":
    main()

"""Batch inference / submission generation CLI.

Flag surface of the reference generate_folder.py:255-264:

    python -m gan_variant_research_tpu.cli.generate_folder \
        --ckpt ckpt_final.msgpack --photos data/photo_jpg --out out_dir \
        [--batch 32] [--size 256] [--limit N] [--no-ema] [--zip images.zip]

Behavioral parity:
- EMA-first restore: prefers ``ema_G.shadow`` then falls back to the raw
  ``generator`` params with a warning (reference _pick_state_dict chain,
  generate_folder.py:127-167);
- the generator is reconstructed from the config stored in the checkpoint
  (the reference re-instantiates via inspect.signature kwarg filtering);
- recursive image listing over 7 extensions, mirrored output tree
  (generate_folder.py:170-172,222);
- preprocessing: bilinear resize to size², [−1,1]; postprocessing:
  clamp→[0,255] round→uint8 (:237-246); JPEG quality 95, subsampling 0,
  optimize (:248-250);
- ``--zip`` additionally packs flat-renamed JPEGs for Kaggle submission
  (the notebook submission flow, cameron-rader-baseline.ipynb cell 9 lineage).
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from functools import partial
from pathlib import Path

import numpy as np

from gan_variant_research_tpu.data.folders import enumerate_images


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Stylize a photo folder with a trained generator")
    p.add_argument("--ckpt", required=True, help="Checkpoint (.msgpack)")
    p.add_argument("--photos", required=True,
                   help="Input photo folder (recursive), or TFRecord shards "
                        "(a *.tfrec/*.tfrecord file or a directory of them)")
    p.add_argument("--out", required=True, help="Output folder (mirrors input tree)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--limit", type=int, default=None, help="Max images to process")
    p.add_argument("--no-ema", action="store_true", help="Use raw generator params")
    p.add_argument("--direction", choices=("A2B", "B2A"), default="A2B",
                   help="For CycleGAN checkpoints: which generator to serve "
                        "(A2B = photo->monet in the reference's convention)")
    p.add_argument("--zip", dest="zip_path", default=None,
                   help="Also write a flat submission zip (0.jpg..N.jpg)")
    p.add_argument("--quality", type=int, default=95)
    return p.parse_args(argv)


def load_generator_params(ckpt_path: str, use_ema: bool = True,
                          direction: str = "A2B"):
    """EMA-first parameter selection + generator reconstruction from the
    stored config. Returns (generator module, params, config).

    Serves both trainer families: CUT checkpoints (``ema_G.shadow`` →
    ``generator`` fallback chain, reference _pick_state_dict
    generate_folder.py:127-167) and CycleGAN checkpoints (``G_A2B``/``G_B2A``
    joint payload, Basic_GAN/src/train.py:126-137 — which the reference has
    no inference script for; submissions went through notebook cells)."""
    import jax.numpy as jnp

    from gan_variant_research_tpu.core.precision import policy_from_config
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint
    from gan_variant_research_tpu.train.cut_trainer import build_generator

    blob = load_checkpoint(ckpt_path)
    payload = blob["payload"]
    config = blob["config"] or {}

    if "G_A2B" in payload:  # CycleGAN joint checkpoint
        from gan_variant_research_tpu.train.cyclegan_trainer import (
            _build_generator as build_cyclegan_generator,
        )

        key = {"A2B": "G_A2B", "B2A": "G_B2A"}[direction]
        policy = policy_from_config(config) if config else None
        from gan_variant_research_tpu.core.precision import DEFAULT_POLICY

        generator = build_cyclegan_generator(
            config.get("model") or {}, policy or DEFAULT_POLICY
        )
        print(f"CycleGAN checkpoint: serving {key}", file=sys.stderr)
        return generator, _as_jnp(payload[key]), config

    params = None
    if use_ema:
        ema = payload.get("ema_G") or {}
        params = ema.get("shadow")
        if params is None:
            print("WARNING: checkpoint has no EMA shadow; falling back to "
                  "raw generator params", file=sys.stderr)
    if params is None:
        params = payload.get("generator")
    if params is None:
        raise KeyError(
            f"No generator parameters found in {ckpt_path} "
            "(looked for ema_G.shadow and generator)"
        )

    gen_cfg = (config.get("model") or {}).get("generator") or {}
    policy = policy_from_config(config) if config else None
    from gan_variant_research_tpu.core.precision import DEFAULT_POLICY

    generator = build_generator(gen_cfg, policy or DEFAULT_POLICY)
    params = _as_jnp(params)
    return generator, params, config


def _as_jnp(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def stylize_folder(
    generator,
    params,
    photos_dir: str | Path,
    out_dir: str | Path,
    size: int = 256,
    batch: int = 32,
    limit: int | None = None,
    quality: int = 95,
    zip_path: str | None = None,
    num_devices: int | None = None,
):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gan_variant_research_tpu.ops.color import to_uint8
    from gan_variant_research_tpu.ops.resize import resize_bilinear
    from gan_variant_research_tpu.parallel.mesh import create_mesh

    photos_dir = Path(photos_dir)
    out_dir = Path(out_dir)
    # --photos may be the Kaggle dataset's native TFRecord shards (a
    # *.tfrec* file or a directory of them — same detection rule as the
    # training loader, data/loader.py::make_source); records are served by
    # index and written under their image_name feature
    tfrec_exts = (".tfrec", ".tfrecord")
    is_tfrec = (
        (photos_dir.is_file() and photos_dir.suffix.lower() in tfrec_exts)
        or (photos_dir.is_dir()
            and any(c.suffix.lower() in tfrec_exts
                    for c in photos_dir.iterdir()))
    )
    if is_tfrec:
        from gan_variant_research_tpu.data.tfrecord import TFRecordImageSource

        # bilinear: the same decode-resize the folder path applies (the
        # reference's inference preprocess), so tfrec- and folder-served
        # outputs are pixel-identical
        src = TFRecordImageSource(photos_dir, size, resample="bilinear")
        paths = list(range(len(src)))
        # record names are captured during decode (get_with_name: one record
        # read serves both pixels and name) and sanitized to their final
        # path component — a corrupt/adversarial image_name must not escape
        # --out (same invariant as tfrec_tool.unpack)
        names: dict[int, str] = {}

        def rel_of(i) -> Path:
            nm = Path(names.get(i) or f"{i:05d}.jpg").name
            return Path(nm if nm not in (".", "..", "") else f"{i:05d}.jpg")
    else:
        src = None
        paths = enumerate_images(photos_dir, recursive=True)

        def rel_of(p) -> Path:
            return p.relative_to(photos_dir)

    if limit is not None:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"No images found under {photos_dir}")

    # data-parallel serving over every local device (GSPMD batch sharding;
    # a 1-chip mesh is the plain single-device program). The generator is a
    # per-sample network, so sharded rows are identical to the single-device
    # ones. Single-process by design — local devices, not global.
    mesh = create_mesh(num_devices=num_devices, devices=jax.local_devices())
    dp = mesh.num_devices > 1
    if dp and getattr(generator, "use_attention", False):
        # variant checkpoints: the attention blocks must know the DP mesh —
        # the Pallas flash kernel cannot be auto-partitioned by GSPMD and
        # runs under shard_map instead (models/attention.py)
        generator = generator.clone(attn_mesh=mesh)
    jit_kwargs = {}
    if dp:
        if batch % mesh.num_devices:
            batch = -(-batch // mesh.num_devices) * mesh.num_devices
            print(f"Rounding batch to {batch} "
                  f"(divisible by {mesh.num_devices} devices)")
        params = jax.device_put(params, mesh.replicated())
        jit_kwargs = {"in_shardings": mesh.batch_sharding(4),
                      "out_shardings": mesh.batch_sharding(4)}
        print(f"Serving data-parallel over {mesh.num_devices} devices")

    @partial(jax.jit, **jit_kwargs)
    def forward(u8):
        x01 = u8.astype(jnp.float32) / 255.0
        x = jnp.clip(resize_bilinear(x01, (size, size)), 0.0, 1.0) * 2.0 - 1.0
        y = generator.apply({"params": params}, x)
        return to_uint8(y)

    # three-stage pipeline: decode (thread pool, prefetched) → jitted forward
    # → JPEG encode/save (thread pool) — the reference's loop is fully serial
    # (generate_folder.py:237-252); on a multi-core host decode and encode
    # overlap the device forward
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    def load_img(p):
        if src is not None:  # TFRecord index (per-thread file handles)
            arr, name = src.get_with_name(p)
            names[p] = name  # distinct keys per thread → GIL-safe
            return arr
        # native libjpeg fast path (pixel-identical to PIL, GIL-free);
        # PIL handles everything else + the bilinear resize
        from gan_variant_research_tpu.data.native_loader import decode_jpeg

        arr = decode_jpeg(p)
        if arr is not None:
            if arr.shape[:2] != (size, size):
                arr = np.asarray(
                    Image.fromarray(arr).resize((size, size), Image.BILINEAR),
                    dtype=np.uint8)
            return arr
        with Image.open(p) as im:
            im = im.convert("RGB")
            if im.size != (size, size):
                im = im.resize((size, size), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)

    decode_pool = ThreadPoolExecutor(max_workers=4)
    write_pool = ThreadPoolExecutor(max_workers=4)
    q: queue.Queue = queue.Queue(maxsize=2)
    _END = object()

    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for i in range(0, len(paths), batch):
                if stop.is_set():
                    return
                chunk = paths[i : i + batch]
                arr = np.stack(list(decode_pool.map(load_img, chunk)))
                pad = 0
                # a lone first batch keeps its natural shape (one compile);
                # under DP every batch must divide across the mesh, so pad
                if arr.shape[0] < batch and (i > 0 or dp):
                    pad = batch - arr.shape[0]
                    arr = np.concatenate(
                        [arr, np.zeros((pad, *arr.shape[1:]), np.uint8)])
                if not put((chunk, arr, pad)):
                    return
            put(_END)
        except BaseException as e:  # surface decode errors in the main thread
            put(e)

    threading.Thread(target=producer, daemon=True).start()

    # Distinct inputs must never silently overwrite one output: TFRecord
    # names flatten to basenames (records "a/x.jpg" and "b/x.jpg" collide)
    # and the .jpg re-suffix collapses "x.png"/"x.jpg" — either would ship a
    # short submission with no warning. Collisions get a deterministic-ish
    # "__dupN" stem tag and a loud warning instead.
    _assigned: set = set()
    _assign_lock = threading.Lock()

    def save_img(p, img):
        rel = rel_of(p)
        dst = (out_dir / rel).with_suffix(".jpg")
        with _assign_lock:
            if dst in _assigned:
                base, k = dst, 1
                while dst in _assigned:
                    dst = base.with_name(f"{base.stem}__dup{k}.jpg")
                    k += 1
                print(f"Warning: output name collision for {rel}; "
                      f"writing {dst.name}")
            _assigned.add(dst)
        dst.parent.mkdir(parents=True, exist_ok=True)
        # native libjpeg encode (GIL-free, same quality/4:4:4/optimize
        # contract as the reference's PIL call and decode-identical to it);
        # PIL fallback when the native codec is unavailable
        from gan_variant_research_tpu.data.native_loader import encode_jpeg

        data = encode_jpeg(img, quality=quality, subsampling=0, optimize=True)
        if data is not None:
            dst.write_bytes(data)
        else:
            Image.fromarray(img, "RGB").save(
                dst, format="JPEG", quality=quality, subsampling=0,
                optimize=True,
            )
        return dst

    write_futures = []
    done = 0
    reaped = 0
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            chunk, arr, pad = item
            out = np.asarray(forward(arr))
            if pad:
                out = out[: len(chunk)]
            for p, img in zip(chunk, out):
                write_futures.append(write_pool.submit(save_img, p, img))
            # reap already-completed writes so a disk-full/permission error
            # aborts the run now rather than after every remaining batch has
            # been decoded and run through the device
            while reaped < len(write_futures) and write_futures[reaped].done():
                write_futures[reaped].result()
                reaped += 1
            done += len(chunk)
            print(f"\r{done}/{len(paths)} images", end="", flush=True)
        written: list[Path] = [f.result() for f in write_futures]  # order-stable
    finally:
        # stop and unblock the producer (it may be parked on q.put) so it
        # exits instead of decoding the rest of the tree after a failure
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        write_pool.shutdown(wait=True)
        decode_pool.shutdown(wait=False, cancel_futures=True)
    print()

    if zip_path:
        with zipfile.ZipFile(zip_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for idx, f in enumerate(written):
                zf.write(f, arcname=f"{idx}.jpg")
        print(f"Submission zip: {zip_path} ({len(written)} images)")
    return written


def main(argv=None):
    args = parse_args(argv)
    generator, params, _ = load_generator_params(
        args.ckpt, use_ema=not args.no_ema, direction=args.direction)
    stylize_folder(
        generator,
        params,
        args.photos,
        args.out,
        size=args.size,
        batch=args.batch,
        limit=args.limit,
        quality=args.quality,
        zip_path=args.zip_path,
    )


if __name__ == "__main__":
    main()

"""Feature-bank plumbing for the repulsion loss and inline metrics.

Re-designs the reference's deleted ``build_clip_features_if_needed()``
(train_cutpp.py, removed in the baseline reversion —
Documentation/BASELINE_REVERSION.md §"Key Code Changes"): a precomputed
bank of target-domain (Monet) embeddings, built once and loaded from disk
on every later run. The surviving config surface is honored literally
(configs/train_gan_cutpp.yaml:132-137):

    clip_features:
      backbone: "inception_pool3"       # TPU-native default (see below)
      monet_feats_path: ".../monet_bank.npz"
      margin_path: ".../distance_margin.json"
      build_on_first_run: true
      weights_path: ".../pt_inception.npz"   # converted FID weights
      allow_random: false                    # tests only

TPU-native divergence: the backbone is the in-tree InceptionV3 pool3
(evalsuite/inception.py) instead of CLIP ViT-B/32 — CLIP weights cannot be
fetched in this environment, and pool3 is the space MiFID's memorization
penalty is scored in. ``backbone: "ViT-B/32"`` fails loudly with that
explanation rather than silently substituting.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

SUPPORTED_BACKBONES = ("inception_pool3",)


def load_margin(path: str | Path | None, default: float = 0.25) -> float:
    """Read the repulsion margin from the reference's ``distance_margin.json``
    shape ({"margin": x} or {"distance_margin": x}); absent file → default."""
    if path is None:
        return float(default)
    p = Path(path)
    if not p.exists():
        return float(default)
    obj = json.loads(p.read_text())
    for key in ("margin", "distance_margin"):
        if key in obj:
            return float(obj[key])
    raise ValueError(f"{p} has neither 'margin' nor 'distance_margin'")


def save_feature_bank(path: str | Path, features: np.ndarray) -> None:
    import os

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic: a crash mid-write must not leave a truncated bank that
    # ensure_feature_bank keeps loading forever
    tmp = path.with_name(path.stem + ".tmp.npz")
    np.savez_compressed(tmp, features=np.asarray(features, np.float32))
    os.replace(tmp, path)


def load_feature_bank(path: str | Path) -> np.ndarray:
    """(N, D) float32 embedding bank from an npz with a 'features' array."""
    with np.load(Path(path)) as z:
        return np.asarray(z["features"], np.float32)


def build_feature_bank(
    images_dir: str | Path,
    out_path: str | Path,
    weights_path: str | Path | None = None,
    allow_random: bool = False,
    batch_size: int = 32,
) -> np.ndarray:
    """Embed every image under ``images_dir`` with InceptionV3 pool3 and
    save the bank npz (the ``build_on_first_run`` path)."""
    from gan_variant_research_tpu.evalsuite.features import (
        InceptionFeatureExtractor,
    )
    from gan_variant_research_tpu.evalsuite.utils import enumerate_images

    extractor = InceptionFeatureExtractor(
        weights_path=weights_path, allow_random=allow_random,
        batch_size=batch_size,
    )
    p = Path(images_dir)
    tfrec_exts = (".tfrec", ".tfrecord")
    if (p.is_file() and p.suffix.lower() in tfrec_exts) or (
            p.is_dir() and any(c.suffix.lower() in tfrec_exts
                               for c in p.iterdir())):
        # TFRecord-only dataset (data.use_tfrec): decode records at the
        # extractor's 299² bilinear contract and batch them directly
        from concurrent.futures import ThreadPoolExecutor

        from gan_variant_research_tpu.data.tfrecord import TFRecordImageSource

        src = TFRecordImageSource(p, extractor.img_size, resample="bilinear")
        feats_parts = []
        with ThreadPoolExecutor(max_workers=4) as pool:
            for i in range(0, len(src), batch_size):
                idx = range(i, min(i + batch_size, len(src)))
                batch = np.stack(list(pool.map(src.get, idx)))
                n_valid = batch.shape[0]
                if n_valid < batch_size:  # fixed-shape jit: pad + slice
                    batch = np.concatenate([batch, np.zeros(
                        (batch_size - n_valid, *batch.shape[1:]), np.uint8)])
                f = np.asarray(extractor.net.features_u8(batch))[:n_valid]
                feats_parts.append(f)
                print(f"\rfeature bank: {i + n_valid}/{len(src)}",
                      end="", flush=True)
        print()
        feats = np.concatenate(feats_parts, axis=0)
    else:
        paths = enumerate_images(images_dir)
        if not paths:
            raise FileNotFoundError(
                f"no images under {images_dir} to build a bank")
        feats = extractor.extract(paths, desc="feature bank")
    save_feature_bank(out_path, feats)
    return feats


def monet_source_path(data_cfg: dict | None):
    """The target-domain input to build the bank from: the TFRecord shards
    when ``data.use_tfrec`` (mirroring the training loader's selection),
    else the image folder."""
    data_cfg = data_cfg or {}
    if data_cfg.get("use_tfrec"):
        return data_cfg.get("monet_tfrec")
    return data_cfg.get("monet_dir")


def ensure_feature_bank(clip_cfg: dict, images_dir: str | Path | None) -> np.ndarray:
    """Load ``clip_features.monet_feats_path``; if absent and
    ``build_on_first_run`` is set, build it from ``images_dir`` first."""
    backbone = clip_cfg.get("backbone", "inception_pool3")
    if backbone not in SUPPORTED_BACKBONES:
        raise ValueError(
            f"clip_features.backbone={backbone!r} is not available here: CLIP "
            "weights cannot be fetched in this environment. Use "
            "'inception_pool3' (the in-tree InceptionV3 FID net — the same "
            "feature space MiFID's memorization penalty scores)."
        )
    bank_path = clip_cfg.get("monet_feats_path")
    if not bank_path:
        raise ValueError("clip_features.monet_feats_path is required "
                         "when the repulsion loss is enabled")
    bank_path = Path(bank_path)
    if bank_path.exists():
        return load_feature_bank(bank_path)
    if not clip_cfg.get("build_on_first_run", False):
        raise FileNotFoundError(
            f"feature bank {bank_path} not found and "
            "clip_features.build_on_first_run is false"
        )
    if images_dir is None:
        raise ValueError("cannot build the feature bank: no target-domain "
                         "image directory configured (data.monet_dir)")
    if jax.process_count() > 1:
        # every process would race to write the same npz, and the build's
        # single-host inception forwards don't compose with a pod mesh —
        # prebuild once instead
        raise RuntimeError(
            f"feature bank {bank_path} not found in a multi-process run; "
            "build_on_first_run is single-host only. Prebuild it with "
            "`python scripts/build_feature_bank.py` and point "
            "clip_features.monet_feats_path at the result."
        )
    return build_feature_bank(
        images_dir, bank_path,
        weights_path=clip_cfg.get("weights_path"),
        allow_random=bool(clip_cfg.get("allow_random", False)),
    )


def preprocess_pm1(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float images → the FID net's input normalization.

    Float-path equivalent of ``preprocess_uint8`` (inception.py:207-209):
    u8 = (x+1)·127.5, then (u8 − 128)/128."""
    return (x.astype(jnp.float32) * 127.5 - 0.5) / 128.0


def make_embed_fn(inception_params):
    """Differentiable [-1,1] NHWC → (B, 2048) pool3 embedding: bilinear
    resize to 299² + the in-tree InceptionV3 forward. Used inside the train
    step (gradient flows through the resize into the generator)."""
    from gan_variant_research_tpu.evalsuite.inception import InceptionV3FID
    from gan_variant_research_tpu.ops.resize import resize_bilinear

    module = InceptionV3FID()

    def embed(images_pm1: jnp.ndarray) -> jnp.ndarray:
        x01 = (images_pm1.astype(jnp.float32) + 1.0) * 0.5
        x01 = jnp.clip(resize_bilinear(x01, (299, 299)), 0.0, 1.0)
        return module.apply({"params": inception_params},
                            preprocess_pm1(x01 * 2.0 - 1.0))

    return embed


def load_inception_params(clip_cfg: dict):
    """Inception params for the in-step embedder: converted weights from
    ``clip_features.weights_path``, or a seeded random init when
    ``clip_features.allow_random`` (pipeline tests only)."""
    from gan_variant_research_tpu.evalsuite.inception import InceptionFID

    net = InceptionFID(
        weights_path=clip_cfg.get("weights_path"),
        allow_random=bool(clip_cfg.get("allow_random", False)),
    )
    return net.params

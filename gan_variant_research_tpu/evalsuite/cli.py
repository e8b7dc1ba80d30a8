"""MiFID evaluation CLI — the reference's staged pipeline
(EVAL/eval/cli.py:45-298):

  STEP 1 enumerate → STEP 2 validate counts/overlap → STEP 3 dataset hashes
  → STEP 4 data pipeline → STEP 5 metrics → STEP 6 reports.

Same flag surface (--config --fake --real --out --batch --workers
--img-size --cosine-eps --no-cache) plus --inception-weights (this rebuild
computes features with its own JAX InceptionV3 and needs the canonical FID
weights file; there is no silent random fallback). Unlike the reference,
--no-cache actually works and the real-stats cache is wired into the flow
(SURVEY.md §2.6 item 5).
"""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

import click
import yaml

from gan_variant_research_tpu.evalsuite.features import (
    InceptionFeatureExtractor,
    compute_or_load_real_stats,
)
from gan_variant_research_tpu.evalsuite.mifid import compute_full_evaluation
from gan_variant_research_tpu.evalsuite.report import (
    create_report,
    print_quick_summary,
    save_report,
    save_text_summary,
    save_worst_cases_csv,
)
from gan_variant_research_tpu.evalsuite.utils import (
    check_dataset_overlap,
    compute_image_list_hash,
    timer,
    validate_image_counts,
)


def load_config(path: str | None) -> dict:
    if not path:
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _banner(step: int, title: str):
    print("\n" + "=" * 70)
    print(f"STEP {step}: {title}")
    print("=" * 70)


@click.command()
@click.option("--config", "config_path", default=None, help="YAML config file")
@click.option("--fake", "fake_dir", default=None,
              help="Generated images: a folder, or TFRecord shards "
                   "(*.tfrec file / directory of shards)")
@click.option("--real", "real_dir", default=None,
              help="Real images: a folder, or TFRecord shards (the Kaggle "
                   "dataset's native format, read without unpacking)")
@click.option("--out", "out_dir", default=None, help="Output dir for reports")
@click.option("--batch", "batch_size", type=int, default=None)
@click.option("--workers", "num_workers", type=int, default=None)
@click.option("--img-size", type=int, default=None)
@click.option("--device", default=None, help="Accepted for reference-CLI parity "
              "(device selection is JAX_PLATFORMS on this build)")
@click.option("--cosine-eps", type=float, default=None)
@click.option("--no-cache", is_flag=True, default=False,
              help="Disable the real-stats cache")
@click.option("--inception-weights", default=None,
              help="Path to FID InceptionV3 weights (.pth or converted .npz)")
@click.option("--kid", is_flag=True, default=False,
              help="Also compute Kernel Inception Distance (beyond-reference; "
                   "reuses the extracted pool3 features)")
@click.option("--pr", is_flag=True, default=False,
              help="Also compute improved precision/recall (k-NN manifolds "
                   "over the same features; beyond-reference)")
@click.option("--allow-random-weights", is_flag=True, default=False, hidden=True,
              help="Pipeline tests only: random Inception weights")
def main(config_path, fake_dir, real_dir, out_dir, batch_size, num_workers,
         img_size, device, cosine_eps, no_cache, inception_weights, kid, pr,
         allow_random_weights):
    """Compute MiFID/FID for a folder of generated images."""
    cfg = load_config(config_path)
    # CLI overrides > YAML > defaults (cli.py:81-111 setdefault chain)
    cfg["fake_dir"] = fake_dir or cfg.get("fake_dir")
    cfg["real_dir"] = real_dir or cfg.get("real_dir")
    cfg["out_dir"] = out_dir or cfg.get("out_dir", "cache/reports")
    cfg["batch_size"] = batch_size or cfg.get("batch_size", 64)
    cfg["num_workers"] = num_workers or cfg.get("num_workers", 8)
    cfg["img_size"] = img_size or cfg.get("img_size", 299)
    cfg["cosine_eps"] = cosine_eps if cosine_eps is not None else cfg.get("cosine_eps", 0.1)
    cfg["use_cache"] = (not no_cache) and cfg.get("use_cache", True)
    cfg["cache_dir"] = cfg.get("cache_dir", "cache")
    cfg["inception_weights"] = inception_weights or cfg.get("inception_weights")
    cfg["kid"] = kid or cfg.get("kid", False)
    cfg["pr"] = pr or cfg.get("pr", False)
    cfg.setdefault("name", Path(cfg["fake_dir"] or "run").name)
    cfg.setdefault("real_mode", "folder")
    if cfg.get("real_mode") != "folder":
        raise click.ClickException(
            "Only real_mode: folder is supported (the reference CLI rejects "
            "tfds mode as well, EVAL/eval/cli.py:134-136). TFRecord shards "
            "need no special mode here: point --real/--fake at a *.tfrec "
            "file or a directory of shards and they are read natively.")
    if not cfg["fake_dir"] or not cfg["real_dir"]:
        raise click.ClickException("--fake and --real (or config) are required")

    run_evaluation(cfg, allow_random_weights=allow_random_weights)


def run_evaluation(cfg: dict, allow_random_weights: bool = False) -> dict:
    """The 6-stage pipeline; returns the report dict."""
    _banner(1, "Enumerating images")
    # folders of images (reference behavior), or the Kaggle dataset's native
    # TFRecord shards read directly (evalsuite/datasets.py TFRecordEntry —
    # embedded bytes are the original JPEGs, so scores match the unpacked
    # folder exactly)
    from gan_variant_research_tpu.evalsuite.datasets import (
        enumerate_eval_inputs,
        is_tfrecord_input,
    )

    with timer("Enumerate fake images"):
        fake_paths = enumerate_eval_inputs(cfg["fake_dir"], cfg["img_size"])
    with timer("Enumerate real images"):
        real_paths = enumerate_eval_inputs(cfg["real_dir"], cfg["img_size"])
    for label, d in (("fake", cfg["fake_dir"]), ("real", cfg["real_dir"])):
        if is_tfrecord_input(d):
            print(f"({label}: TFRecord shards, read natively)")
    print(f"Found {len(fake_paths)} fake, {len(real_paths)} real images")

    _banner(2, "Validating datasets")
    validation = validate_image_counts(fake_paths, real_paths)
    for w in validation["warnings"]:
        print(f"⚠ {w}")
    overlap = check_dataset_overlap(fake_paths, real_paths)
    if overlap["has_overlap"]:
        print(f"⚠ Filename overlap between sets: {overlap['overlap_count']} "
              f"files, e.g. {overlap['overlap_examples'][:3]}")
        validation["warnings"].append(
            f"Filename overlap between fake and real sets "
            f"({overlap['overlap_count']} files)")

    _banner(3, "Hashing datasets")
    with timer("Hash image lists"):
        fake_hash = compute_image_list_hash(fake_paths, Path(cfg["fake_dir"]))
        real_hash = compute_image_list_hash(real_paths, Path(cfg["real_dir"]))
    hashes = {
        "fake_list_sha1": fake_hash,
        "real_list_sha1": real_hash,
        "real_cache_key": f"{Path(cfg['real_dir']).name}@sha1:{real_hash[:16]}",
    }
    print(f"Fake SHA1: {fake_hash}")
    print(f"Real SHA1: {real_hash}")

    _banner(4, "Building feature extractor")
    # data-parallel over every local device (GSPMD batch sharding; a 1-chip
    # mesh is the plain single-device program). Local devices, not global:
    # the eval CLI is a single-process tool even on a pod slice.
    import jax

    from gan_variant_research_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(devices=jax.local_devices())
    if mesh.num_devices > 1:
        if cfg["batch_size"] % mesh.num_devices:
            rounded = -(-cfg["batch_size"] // mesh.num_devices) * mesh.num_devices
            print(f"Rounding batch {cfg['batch_size']} → {rounded} "
                  f"(divisible by {mesh.num_devices} devices)")
            cfg["batch_size"] = rounded
        print(f"Feature extraction data-parallel over {mesh.num_devices} devices")
    extractor = InceptionFeatureExtractor(
        weights_path=cfg.get("inception_weights"),
        allow_random=allow_random_weights,
        batch_size=cfg["batch_size"],
        img_size=cfg["img_size"],
        num_workers=cfg["num_workers"],
        mesh=mesh,
    )
    if extractor.net.randomly_initialized:
        validation["warnings"].append(
            "RANDOM Inception weights — scores are NOT comparable to Kaggle")

    real_stats = None
    if cfg["use_cache"]:
        real_stats = compute_or_load_real_stats(
            extractor, real_paths, real_hash, cfg["cache_dir"], use_cache=True
        )

    _banner(5, "Computing metrics")
    with timer("MiFID/FID computation"):
        results = compute_full_evaluation(
            extractor, real_paths, fake_paths,
            cosine_eps=cfg["cosine_eps"], real_stats=real_stats,
        )
    if cfg.get("kid"):
        from gan_variant_research_tpu.evalsuite.kid import compute_kid

        with timer("KID computation"):
            results["kid"] = compute_kid(
                results["real_features"], results["fake_features"]
            )
    if cfg.get("pr"):
        from gan_variant_research_tpu.evalsuite.prd import compute_precision_recall

        with timer("Precision/recall computation"):
            results["precision_recall"] = compute_precision_recall(
                results["real_features"], results["fake_features"]
            )

    _banner(6, "Writing reports")
    report = create_report(
        scores=results,
        run_config=cfg,
        hashes=hashes,
        validation=validation,
        worst_cases=results["worst_memorization_cases"],
    )
    out_dir = Path(cfg["out_dir"])
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    save_report(report, out_dir / f"{stamp}_{cfg['name']}_report.json")
    save_text_summary(
        report, Path(cfg["cache_dir"]) / "logs" / f"{stamp}_{cfg['name']}.txt"
    )
    save_worst_cases_csv(
        results["worst_memorization_cases"],
        out_dir / f"{stamp}_{cfg['name']}_worst_cases.csv",
    )
    print_quick_summary(report["scores"], validation)
    return report


if __name__ == "__main__":
    main()

"""Convergence smoke: train a reduced CUT config on a synthetic two-domain
dataset and check the documented loss-trajectory shape.

The reference documents observed trajectories for the real Monet task
(Documentation/QUICKSTART_BASELINE.md:27-42,78-124: g_loss ~1-2, nce
2.0→1.0 decreasing, identity→0 as the warmup anneals, d_loss ~1). No real
dataset ships with this environment, so this script synthesizes two visually
distinct domains — "photo-like" (sharp geometric scenes) vs "painting-like"
(smooth, palette-limited color fields) — trains ~N steps at 128², and
verifies the qualitative shape: finite losses, NCE strictly trending down,
identity loss decreasing with its annealed weight, hinge d_loss ~O(1).

Artifacts (committed to docs/ for the record):
    docs/convergence_smoke.png   — loss curves
    docs/convergence_smoke.md    — numbers + pass/fail of each check

Usage:
    python scripts/convergence_smoke.py [--steps 2000] [--size 128]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# --------------------------------------------------------------------------- #
# Synthetic domains

def _smooth_field(rng, size, cells=6):
    """Low-res random color field, bicubic-upsampled → smooth blobs."""
    from PIL import Image

    low = rng.integers(0, 256, (cells, cells, 3), dtype=np.uint8)
    return np.asarray(
        Image.fromarray(low).resize((size, size), Image.BICUBIC), dtype=np.uint8
    )


def make_photo(rng, size) -> np.ndarray:
    """Sharp 'photo': gradient sky + hard-edged shapes + sensor-ish noise."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    top = rng.integers(60, 200, 3)
    bot = rng.integers(30, 160, 3)
    img = (top[None, None] * (1 - yy[..., None]) + bot[None, None] * yy[..., None])
    for _ in range(int(rng.integers(6, 14))):
        color = rng.integers(0, 256, 3)
        cx, cy = rng.uniform(0, 1, 2)
        w, h = rng.uniform(0.05, 0.35, 2)
        if rng.random() < 0.5:
            mask = (np.abs(xx - cx) < w / 2) & (np.abs(yy - cy) < h / 2)
        else:
            mask = ((xx - cx) ** 2 + (yy - cy) ** 2) < (w / 2) ** 2
        img[mask] = color
    img = img + rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


PALETTE = np.array([
    [ 61,  82, 117], [116, 144, 166], [176, 193, 186], [222, 217, 184],
    [196, 156, 108], [142, 114,  92], [ 84, 106,  74], [210, 180, 170],
], dtype=np.float32)


def make_painting(rng, size) -> np.ndarray:
    """Painterly: smooth color fields snapped toward a soft palette, plus
    low-amplitude brush-stroke banding."""
    img = _smooth_field(rng, size, cells=int(rng.integers(4, 9))).astype(np.float32)
    # soft palette pull
    flat = img.reshape(-1, 3)
    d = ((flat[:, None, :] - PALETTE[None]) ** 2).sum(-1)
    nearest = PALETTE[d.argmin(1)]
    img = 0.45 * flat + 0.55 * nearest
    img = img.reshape(size, size, 3)
    # brush banding
    yy = np.arange(size, dtype=np.float32)
    band = 6.0 * np.sin(yy / rng.uniform(2.5, 5.0))[:, None, None]
    return np.clip(img + band, 0, 255).astype(np.uint8)


def write_dataset(root: Path, n_photos=200, n_paintings=100, size=128, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    pdir, mdir = root / "photos", root / "monet"
    pdir.mkdir(parents=True, exist_ok=True)
    mdir.mkdir(parents=True, exist_ok=True)
    for i in range(n_photos):
        Image.fromarray(make_photo(rng, size), "RGB").save(
            pdir / f"p{i:04d}.jpg", quality=95)
    for i in range(n_paintings):
        Image.fromarray(make_painting(rng, size), "RGB").save(
            mdir / f"m{i:04d}.jpg", quality=95)
    return pdir, mdir


# --------------------------------------------------------------------------- #

def run(steps: int, size: int, data_root: Path, out_root: Path,
        flagship: bool = False, stretch512: bool = False):
    import shutil

    from gan_variant_research_tpu.core.config import load_config, override_config
    from gan_variant_research_tpu.train.loop import train_cut

    # LossTracker appends to train_log.txt — clear any previous run so
    # analyze() never mixes two trainings' trajectories
    shutil.rmtree(out_root, ignore_errors=True)

    pdir, mdir = write_dataset(data_root, size=size,
                               n_photos=300 if (flagship or stretch512) else 200,
                               n_paintings=150 if (flagship or stretch512) else 100)
    config = load_config(REPO / "gan_variant_research_tpu" / "configs"
                         / ("train_gan_cutpp_512.yaml" if stretch512
                            else "train_gan_cutpp.yaml"))
    overrides = [
        f"data.photos_dir={pdir}",
        f"data.monet_dir={mdir}",
        f"output.checkpoint_dir={out_root/'ckpt'}",
        f"output.log_dir={out_root/'logs'}",
        f"image_size={size}",
        f"max_steps={steps}",
        "metrics.save_checkpoint_every=100000",
        "log.every_steps=25" if flagship else "log.every_steps=50",
        "log.verbose=false",
    ]
    if stretch512:
        # the 512² stretch config at its per-chip shard (global 64 = 8/chip
        # on 8 chips; batch 8 on this one chip) — the same static shapes the
        # capacity grid measured (docs/PERF.md). Full production model,
        # warmup 20000 → the run stays in the annealing warm phase.
        overrides += ["batch_size=8"]
    elif flagship:
        # the UNREDUCED production config (ngf 64, 9 blocks, batch 32,
        # warmup 20000 — the same static shapes the benchmark compiles), so
        # the whole run stays in the annealing warm phase
        overrides += ["batch_size=32"]
    else:
        overrides += [
            "batch_size=16",
            f"warmup_steps={max(1, steps // 3)}",
            "model.generator.ngf=32",
            "model.generator.n_blocks=4",
            "model.discriminator.ndf=32",
            "patchnce.num_patches=128",
        ]
    config = override_config(config, overrides)
    train_cut(config)
    return config


def analyze(log_dir: Path, steps: int, warmup: int, flagship: bool = False,
            identity_warm: float = 0.1):
    # contract: ``Step N: {json}`` per line (train/loss_tracker.py)
    lines = []
    for raw in (log_dir / "train_log.txt").read_text().splitlines():
        prefix, _, payload = raw.partition(": ")
        if not payload.strip().startswith("{"):
            continue
        entry = json.loads(payload)
        entry["step"] = int(prefix.split()[1])
        lines.append(entry)
    by = {k: np.array([ln[k] for ln in lines if k in ln])
          for k in ("step", "d_loss", "g_loss", "nce", "identity",
                    "identity_weight")}
    n = len(by["step"])
    first_q = slice(0, max(1, n // 4))
    last_q = slice(-max(1, n // 4), None)
    checks = {
        "all_finite": bool(np.isfinite(np.concatenate(
            [by["d_loss"], by["g_loss"], by["nce"]])).all()),
        "nce_decreasing": float(by["nce"][last_q].mean())
                          < 0.85 * float(by["nce"][first_q].mean()),
        "d_loss_hinge_band": 0.2 <= float(by["d_loss"][last_q].mean()) <= 2.5,
        "g_adv_nonconstant": float(np.std(by["g_loss"])) > 1e-3,
    }
    if flagship:
        # the production warmup (20k in the shipped YAML) dwarfs a short run:
        # the weight only anneals linearly — check it tracks the schedule
        step_last = float(by["step"][-1])
        expected_w = identity_warm * max(0.0, 1.0 - step_last / warmup)
        checks["identity_weight_tracks_schedule"] = (
            abs(float(by["identity_weight"][-1]) - expected_w) < 5e-4)
        checks["identity_l1_decreasing"] = (
            float(by["identity"][last_q].mean())
            < float(by["identity"][first_q].mean()))
    else:
        checks["identity_weight_annealed"] = (
            float(by["identity_weight"][-1]) <= 1e-4)
    summary = {
        "steps": int(by["step"][-1]),
        "nce_first_quarter": round(float(by["nce"][first_q].mean()), 4),
        "nce_last_quarter": round(float(by["nce"][last_q].mean()), 4),
        "d_loss_last_quarter": round(float(by["d_loss"][last_q].mean()), 4),
        "g_loss_last_quarter": round(float(by["g_loss"][last_q].mean()), 4),
        "identity_last": round(float(by["identity"][-1]), 4),
        "identity_weight_last": float(by["identity_weight"][-1]),
        "checks": checks,
    }
    return summary, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--workdir", type=str, default="/tmp/convergence_smoke")
    ap.add_argument("--flagship", action="store_true",
                    help="run the UNREDUCED production config (256², ngf 64, "
                         "9 blocks, batch 32, warmup 20000)")
    ap.add_argument("--stretch512", action="store_true",
                    help="run the 512² stretch config "
                         "(train_gan_cutpp_512.yaml) at its per-chip shard "
                         "(batch 8 on one chip)")
    args = ap.parse_args()
    if args.flagship:
        args.size = 256
    if args.stretch512:
        args.size = 512

    production = args.flagship or args.stretch512
    work = Path(args.workdir)
    config = run(args.steps, args.size, work / "data", work / "run",
                 flagship=args.flagship, stretch512=args.stretch512)
    summary, by = analyze(
        Path(config["output"]["log_dir"]), args.steps, config["warmup_steps"],
        flagship=production,
        identity_warm=config["loss_weights"].get("identity_warm", 0.1))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(by["step"], by["d_loss"], label="d_loss")
    axes[0].plot(by["step"], by["g_loss"], label="g_loss")
    axes[0].set_title("adversarial"); axes[0].legend(); axes[0].set_xlabel("step")
    axes[1].plot(by["step"], by["nce"], color="tab:green")
    axes[1].set_title("PatchNCE"); axes[1].set_xlabel("step")
    axes[2].plot(by["step"], by["identity"], label="identity L1")
    axes[2].plot(by["step"], by["identity_weight"], label="weight (annealed)")
    axes[2].set_title("identity warmup"); axes[2].legend(); axes[2].set_xlabel("step")
    tag = ("stretch512" if args.stretch512
           else "flagship" if args.flagship else "smoke")
    desc = ("512² STRETCH config (train_gan_cutpp_512.yaml at its per-chip "
            "shard: ngf 64, 9 blocks, batch 8, remat off, warmup 20000)"
            if args.stretch512 else
            "FULL production config (ngf 64, 9 blocks, batch 32, warmup "
            "20000 — the benchmarked model)" if args.flagship else
            "Reduced CUT config, batch 16 (ngf 32, 4 blocks)")
    fig.suptitle(f"CUT convergence {tag} — synthetic two-domain, "
                 f"{args.size}² × {summary['steps']} steps")
    fig.tight_layout()
    png = REPO / "docs" / f"convergence_{tag}.png"
    fig.savefig(png, dpi=110)

    md = REPO / "docs" / f"convergence_{tag}.md"
    passed = all(summary["checks"].values())
    md.write_text(
        f"# Convergence {tag} (synthetic two-domain CUT run)\n\n"
        f"{desc}, {args.size}²×{summary['steps']} steps, synthetic "
        f"photo-like vs painting-like domains "
        f"(scripts/convergence_smoke.py). Reference trajectory spec: "
        f"QUICKSTART_BASELINE.md:38-42 (nce decreasing, identity tracking "
        f"its annealed weight, d/g hinge losses O(1)).\n\n"
        f"```json\n{json.dumps(summary, indent=2)}\n```\n\n"
        f"**Result: {'PASS' if passed else 'FAIL'}** — see "
        f"{png.name} for the curves.\n"
    )
    print(json.dumps(summary, indent=2))
    print("PASS" if passed else "FAIL")
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())

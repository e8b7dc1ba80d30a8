"""CycleGAN convergence smoke: train the Basic_GAN-stack loop on the same
synthetic two-domain dataset as the CUT smoke and check trajectory shape.

The reference documents no loss anchors for Basic_GAN, but its structure
implies the standard CycleGAN shape: λ_cyc-dominated G loss strictly
decreasing as the cycle reconstruction is learned, LSGAN D losses settling
near 0.25 (MSE of 0.5-ish logits), identity term shrinking. This script runs
the real ``train_cyclegan`` loop (reference Basic_GAN/src/train.py:33-137
behavior) end-to-end and asserts:

- all epoch-averaged losses finite (the loop itself NaN-trips),
- cycle loss last-quarter < 0.6 × first-quarter,
- D_A/D_B in a sane LSGAN band at the end (0.05..0.7).

Artifacts: docs/cyclegan_smoke.md (+ curves png).

Usage: python scripts/cyclegan_smoke.py [--steps 1000] [--size 64]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.convergence_smoke import write_dataset  # noqa: E402  (same domains)


def run(steps: int, size: int, work: Path, generator: str = "resnet"):
    from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan

    pdir, mdir = write_dataset(work / "data", size=size)
    config = {
        "data": {"root": str(work / "data"), "domain_a": "photos",
                 "domain_b": "monet", "img_size": size,
                 "load_size": size + size // 8, "num_workers": 4},
        "training": {"epochs": 40, "batch_size": 8, "amp": False, "seed": 0,
                     "save_dir": str(work / "ckpt"), "log_dir": str(work / "logs"),
                     "save_every": 1000, "max_steps": steps},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 20},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 16, "ndf": 16, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": generator},
        "runtime": {"precision": "bf16"},
        "parallel": {"num_devices": 1},
    }
    # capture the loop's per-epoch lines (the reference's console contract)
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        train_cyclegan(config)
    (work / "console.txt").write_text(buf.getvalue())
    return buf.getvalue()


LINE = re.compile(
    r"Epoch (\d+)/\d+ (.*?) \| [\d.]+ img/s")


def analyze(console: str):
    rows = []
    for m in LINE.finditer(console):
        kv = dict(p.split(": ") for p in m.group(2).split(" | "))
        rows.append({"epoch": int(m.group(1)),
                     **{k: float(v) for k, v in kv.items()}})
    if not rows:
        raise SystemExit("no epoch lines parsed from the loop output")
    by = {k: np.array([r[k] for r in rows]) for k in rows[0]}
    n = len(rows)
    q = max(1, n // 4)
    checks = {
        "all_finite": bool(all(np.isfinite(v).all() for v in by.values())),
        # 40 epochs is 1/5 of the reference's 200-epoch schedule; a ~30%+
        # monotone decline in that window is a decisive "learning" signal
        "cycle_decreasing": float(by["cycle"][-q:].mean())
                            < 0.7 * float(by["cycle"][:q].mean()),
        "d_lsgan_band": bool(0.05 <= by["D_A"][-q:].mean() <= 0.7
                             and 0.05 <= by["D_B"][-q:].mean() <= 0.7),
    }
    summary = {
        "epochs": int(by["epoch"][-1]),
        "cycle_first_quarter": round(float(by["cycle"][:q].mean()), 3),
        "cycle_last_quarter": round(float(by["cycle"][-q:].mean()), 3),
        "G_last": round(float(by["G"][-1]), 3),
        "D_A_last_quarter": round(float(by["D_A"][-q:].mean()), 3),
        "D_B_last_quarter": round(float(by["D_B"][-q:].mean()), 3),
        "idt_last": round(float(by["idt"][-1]), 3),
        "checks": checks,
    }
    return summary, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--workdir", type=str, default="/tmp/cyclegan_smoke")
    ap.add_argument("--analyze-only", action="store_true",
                    help="re-analyze <workdir>/console.txt without retraining")
    ap.add_argument("--generator", choices=["resnet", "unet"],
                    default="resnet",
                    help="unet = the notebook-lineage U-Net generator "
                         "(GAN_baseline_Sujit.ipynb cell 4); artifacts get "
                         "a _unet suffix")
    args = ap.parse_args()

    if args.analyze_only:
        console = (Path(args.workdir) / "console.txt").read_text()
    else:
        console = run(args.steps, args.size, Path(args.workdir),
                      generator=args.generator)
    summary, by = analyze(console)
    tag = "" if args.generator == "resnet" else f"_{args.generator}"

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(by["epoch"], by["G"], label="G total")
    axes[0].plot(by["epoch"], by["adv"], label="adv")
    axes[0].set_title("generator"); axes[0].legend(); axes[0].set_xlabel("epoch")
    axes[1].plot(by["epoch"], by["cycle"], color="tab:green", label="cycle")
    axes[1].plot(by["epoch"], by["idt"], color="tab:orange", label="identity")
    axes[1].set_title("reconstruction"); axes[1].legend(); axes[1].set_xlabel("epoch")
    axes[2].plot(by["epoch"], by["D_A"], label="D_A")
    axes[2].plot(by["epoch"], by["D_B"], label="D_B")
    axes[2].set_title("discriminators (LSGAN)"); axes[2].legend()
    axes[2].set_xlabel("epoch")
    fig.suptitle(f"CycleGAN convergence smoke ({args.generator} G) — "
                 f"synthetic two-domain, {args.size}², "
                 f"{summary['epochs']} epochs")
    fig.tight_layout()
    fig.savefig(REPO / "docs" / f"cyclegan_smoke{tag}.png", dpi=110)

    passed = all(summary["checks"].values())
    (REPO / "docs" / f"cyclegan_smoke{tag}.md").write_text(
        "# CycleGAN convergence smoke (synthetic two-domain run)\n\n"
        f"Real `train_cyclegan` loop (Basic_GAN stack), {args.generator} "
        f"generator, {args.size}² batch 8, "
        f"ngf/ndf 16, {summary['epochs']} epochs on the synthetic "
        "photo-like vs painting-like domains shared with the CUT smoke.\n\n"
        f"```json\n{json.dumps(summary, indent=2)}\n```\n\n"
        f"**Result: {'PASS' if passed else 'FAIL'}** — curves in "
        f"cyclegan_smoke{tag}.png.\n"
    )
    print(json.dumps(summary, indent=2))
    print("PASS" if passed else "FAIL")
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())

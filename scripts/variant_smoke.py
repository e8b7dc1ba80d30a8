"""Variant smoke: train with EVERY restored deleted feature enabled at once.

The reference's baseline reversion deleted its experimental features but kept
their config/constructor surfaces (Documentation/BASELINE_REVERSION.md:8-30:
self-/channel-attention, AdaIN style dropout, feature matching, Lab palette
prior, k-NN repulsion, in-training FID/d_min metrics, early stopping). This
repo restored each as a working opt-in with unit tests; this script is the
integration proof — one reduced CUT run on the synthetic two-domain dataset
with ALL of them active simultaneously:

    model.generator.{use_attention, use_channel_attn, use_style_dropout}
    loss_weights.{featmatch, palette, repulsion}   (> 0)
    metrics.{compute_fid, compute_clip_distance}   (inline metrics layer)
    early_stop.enable                              (armed, not triggered)

and checks that the combined step trains: every loss finite, the variant
loss terms actually contribute (nonzero), NCE trends down, the attention
modules exist in the trained checkpoint, and metrics_log.jsonl is written.

Artifacts (committed for the record):
    docs/variant_smoke.png   — loss curves incl. the variant terms
    docs/variant_smoke.md    — numbers + pass/fail of each check

Usage:
    python scripts/variant_smoke.py [--steps 300] [--size 96]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.convergence_smoke import write_dataset  # noqa: E402


def run(steps: int, size: int, work: Path):
    import shutil

    from gan_variant_research_tpu.core.config import load_config, override_config
    from gan_variant_research_tpu.train.loop import train_cut

    shutil.rmtree(work / "run", ignore_errors=True)
    pdir, mdir = write_dataset(work / "data", n_photos=120, n_paintings=60,
                               size=size)
    config = load_config(REPO / "gan_variant_research_tpu" / "configs"
                         / "train_gan_cutpp.yaml")
    config = override_config(config, [
        f"data.photos_dir={pdir}",
        f"data.monet_dir={mdir}",
        f"output.checkpoint_dir={work/'run'/'ckpt'}",
        f"output.log_dir={work/'run'/'logs'}",
        f"image_size={size}",
        f"max_steps={steps}",
        "batch_size=4",
        f"warmup_steps={max(1, steps // 2)}",
        # reduced trunk, with the variant blocks placed inside its range
        "model.generator.ngf=32",
        "model.generator.n_blocks=4",
        "model.discriminator.ndf=32",
        "patchnce.num_patches=128",
        # --- restored deleted features, ALL ON ---
        "model.generator.use_attention=true",
        "model.generator.attn_layers=[1]",
        "model.generator.use_channel_attn=true",
        "model.generator.channel_attn_layers=[2]",
        "model.generator.use_style_dropout=true",
        "loss_weights.featmatch=1.0",
        "loss_weights.palette=0.5",
        "loss_weights.repulsion=0.2",
        # margin 1.0 >> typical d_min of random-weight pool3 embeddings, so
        # the hinge is active (nonzero) for the whole run
        "repulsion.margin=1.0",
        "clip_features.allow_random=true",
        f"clip_features.monet_feats_path={work/'run'/'bank.npz'}",
        "clip_features.build_on_first_run=true",
        "metrics.compute_fid=true",
        "metrics.compute_clip_distance=true",
        f"metrics.eval_every={max(1, steps // 4)}",
        "metrics.save_checkpoint_every=100000",
        "eval.num_samples=4",
        # armed but out of reach: proves the tracker runs without stopping.
        # The alarm is an ABSOLUTE floor (d_min < threshold fires;
        # inline_metrics.py) and cosine distances are >= 0, so a 0.0 floor
        # is armed-but-unreachable. (The pre-910f422 drop-below-max
        # semantics made 10.0 the unreachable value; with floor semantics
        # 10.0 fires at the first eval.)
        "early_stop.enable=true",
        "early_stop.patience=1000000",
        "early_stop.dmin_drop_threshold=0.0",
        f"log.every_steps={max(1, steps // 40)}",
        "log.verbose=false",
    ])
    state, trainer = train_cut(config)
    return config, state, trainer


def analyze(config, g_modules: set):
    log_dir = Path(config["output"]["log_dir"])
    lines = []
    for raw in (log_dir / "train_log.txt").read_text().splitlines():
        prefix, _, payload = raw.partition(": ")
        if payload.strip().startswith("{"):
            entry = json.loads(payload)
            entry["step"] = int(prefix.split()[1])
            lines.append(entry)
    keys = ("step", "d_loss", "g_loss", "nce", "identity",
            "featmatch", "palette", "repulsion")
    by = {k: np.array([ln[k] for ln in lines if k in ln]) for k in keys}
    n = len(by["step"])
    first_q, last_q = slice(0, max(1, n // 4)), slice(-max(1, n // 4), None)

    metrics_lines = [
        json.loads(l) for l in
        (log_dir / "metrics_log.jsonl").read_text().strip().splitlines()
    ]

    # which attention core served the run: the routing decision is static
    # per shape/backend (models/attention.py::flash_eligible), so recompute
    # it from the run config — at 256² (trunk HW=4096, c=4·ngf) on TPU the
    # Pallas flash kernel is eligible and this smoke doubles as the proof
    # that a real multi-step training run trains THROUGH the kernel
    from gan_variant_research_tpu.models.attention import flash_eligible

    g = config["model"]["generator"]
    hw = (config["image_size"] // 4) ** 2
    c = int(g["ngf"]) * 4
    attn_core = ("pallas_flash" if flash_eligible(
        hw, max(c // 8, 1), c, g.get("attn_flash", "auto"),
        batch=config["batch_size"]) else "einsum")

    checks = {
        "all_finite": bool(all(np.isfinite(by[k]).all() for k in keys)),
        "nce_decreasing": float(by["nce"][last_q].mean())
                          < 0.9 * float(by["nce"][first_q].mean()),
        "featmatch_active": float(by["featmatch"].mean()) > 1e-4,
        "palette_active": float(by["palette"].mean()) > 1e-6,
        "repulsion_active": float(by["repulsion"].mean()) > 1e-4,
        "attention_params_in_state": {"attn_1", "channel_attn_2"} <= g_modules,
        "metrics_log_written": len(metrics_lines) >= 2
                               and {"step", "fid", "d_min"}
                               <= set(metrics_lines[0]),
        "metrics_finite": bool(np.isfinite(
            [[m["fid"], m["d_min"]] for m in metrics_lines]).all()),
        # the per-step CSV is the ground truth (the JSON log is averaged
        # every log.every_steps, so its last step rounds down)
        "ran_to_completion": (
            len((log_dir / "losses_history.csv").read_text()
                .strip().splitlines()) - 1 == config["max_steps"]),
    }
    summary = {
        "steps": int(by["step"][-1]),
        "nce_first_quarter": round(float(by["nce"][first_q].mean()), 4),
        "nce_last_quarter": round(float(by["nce"][last_q].mean()), 4),
        "featmatch_last_quarter": round(float(by["featmatch"][last_q].mean()), 4),
        "palette_last_quarter": round(float(by["palette"][last_q].mean()), 6),
        "repulsion_last_quarter": round(float(by["repulsion"][last_q].mean()), 4),
        "d_loss_last_quarter": round(float(by["d_loss"][last_q].mean()), 4),
        "metrics_evals": len(metrics_lines),
        "fid_trajectory": [round(m["fid"], 2) for m in metrics_lines],
        "d_min_trajectory": [round(m["d_min"], 4) for m in metrics_lines],
        "generator_modules": sorted(g_modules),
        "attn_core": attn_core,
        "checks": checks,
    }
    return summary, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--workdir", type=str, default="/tmp/variant_smoke")
    ap.add_argument("--tag", type=str, default="",
                    help="artifact-name suffix (e.g. 'tpu_flash') so a run "
                         "on other hardware/shapes doesn't overwrite the "
                         "committed record")
    ap.add_argument("--analyze-only", action="store_true",
                    help="re-analyze an existing run from its final "
                         "checkpoint instead of retraining")
    args = ap.parse_args()

    if args.analyze_only:
        from gan_variant_research_tpu.train.checkpoint import load_checkpoint

        blob = load_checkpoint(
            Path(args.workdir) / "run" / "ckpt" / "ckpt_final.msgpack")
        config = blob["config"]
        g_modules = set(blob["payload"]["generator"])
    else:
        config, state, _ = run(args.steps, args.size, Path(args.workdir))
        g_modules = set(state.g_params)
    summary, by = analyze(config, g_modules)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(by["step"], by["d_loss"], label="d_loss")
    axes[0].plot(by["step"], by["g_loss"], label="g_loss")
    axes[0].set_title("adversarial"); axes[0].legend(); axes[0].set_xlabel("step")
    axes[1].plot(by["step"], by["nce"], label="nce")
    axes[1].plot(by["step"], by["identity"], label="identity")
    axes[1].set_title("NCE / identity"); axes[1].legend(); axes[1].set_xlabel("step")
    axes[2].plot(by["step"], by["featmatch"], label="featmatch")
    axes[2].plot(by["step"], by["palette"], label="palette")
    axes[2].plot(by["step"], by["repulsion"], label="repulsion")
    axes[2].set_title("restored variant losses"); axes[2].legend()
    axes[2].set_xlabel("step")
    fig.suptitle(f"Variant smoke — ALL restored opt-ins on, "
                 f"{args.size}² × {summary['steps']} steps")
    fig.tight_layout()
    suffix = f"_{args.tag}" if args.tag else ""
    png = REPO / "docs" / f"variant_smoke{suffix}.png"
    fig.savefig(png, dpi=110)

    passed = all(v if isinstance(v, bool) else True
                 for v in summary["checks"].values())
    md = REPO / "docs" / f"variant_smoke{suffix}.md"
    md.write_text(
        "# Variant smoke (every restored deleted feature on at once)\n\n"
        "Reduced CUT run (ngf 32, 4 blocks, batch 4) on the synthetic "
        "two-domain dataset with self-attention, channel attention, style "
        "dropout, feature matching, Lab palette prior, k-NN repulsion, "
        "inline FID/d_min metrics, and an armed early-stop tracker all "
        "enabled simultaneously (`scripts/variant_smoke.py`). The reference "
        "deleted these features in its baseline reversion "
        "(Documentation/BASELINE_REVERSION.md:8-30) but kept their config "
        "surface; each is unit-tested individually — this run proves they "
        "compose.\n\n"
        f"```json\n{json.dumps(summary, indent=2)}\n```\n\n"
        f"**Result: {'PASS' if passed else 'FAIL'}** — see {png.name}.\n"
    )
    print(json.dumps(summary, indent=2))
    print("PASS" if passed else "FAIL")
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())

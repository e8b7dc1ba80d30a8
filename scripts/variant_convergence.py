"""Variant-stack convergence + mid-run SIGKILL/resume (VERDICT r3 next #4).

scripts/variant_smoke.py proved the restored deleted features *compose* for
~200 steps; this script proves they hold up as a TRAINING CONFIGURATION:

  A   uninterrupted run: everything-on CUT (self-attention served by the
      Pallas flash kernel at flash-eligible trunk shapes, channel attention,
      AdaIN style dropout, feature matching, Lab palette prior, k-NN
      repulsion against a feature bank built from the painting images) with
      the lax.scan window path (runtime.steps_per_call=8), identity-anneal
      boundary pulled inside the run.
  B   same seed/config, SIGKILLed mid-flight at an off-cadence step
      (mid R1 period, before the anneal boundary).
  B'  `--resume auto` from B's last periodic checkpoint — the resumed
      segment re-crosses the identity-anneal boundary, the R1 cadence, and
      every scan-window boundary to max_steps.

Pass requires (1) per-step d/g-loss equality of A vs B+B' over the WHOLE
run (checkpointed PRNG + loader fast-forward must also carry the variant
state: style-dropout keys, attention params, the replicated repulsion
bank), (2) the variant-smoke trajectory checks at convergence scale (NCE
down, variant losses active, identity weight annealed to 0, hinge d_loss
banded), and (3) a sample grid from the final EMA checkpoint.

Artifacts (committed):
    docs/variant_convergence.md            — evidence table
    docs/variant_convergence.png           — loss curves (A)
    docs/variant_convergence_samples.png   — input / G(photo) / paintings

Usage:  python scripts/variant_convergence.py [--steps 900] [--kill-at 230]
        (child mode is internal)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

SIZE = 128
WINDOW = 8
CKPT_EVERY = 200


def build_overrides(data: Path, out: Path, steps: int, bank: Path):
    warmup = max(WINDOW, (steps // 3) // WINDOW * WINDOW)
    return [
        f"data.photos_dir={data / 'photos'}",
        f"data.monet_dir={data / 'monet'}",
        f"output.checkpoint_dir={out / 'ckpt'}",
        f"output.log_dir={out / 'logs'}",
        f"image_size={SIZE}",
        f"max_steps={steps}",
        "batch_size=16",
        # identity anneal ends inside the run (weight → 0, static-branch
        # switch crossed by the resumed segment)
        f"warmup_steps={warmup}",
        # reduced trunk, flash-ELIGIBLE attention shapes: trunk HW =
        # (128/4)² = 1024 ≥ 1024 and % 512 == 0; c = 4·ngf = 128 % 128 == 0
        # (models/attention.py::flash_eligible) — on the TPU backend the
        # run trains THROUGH the Pallas kernel at convergence length
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
        "repulsion.margin=1.0",
        # bank built ONCE from the painting images (run A builds, B/B'
        # load the identical file); allow_random because the canonical
        # Inception weights need egress — the embedder is still the same
        # frozen net for bank and step, so the hinge is meaningful
        "clip_features.allow_random=true",
        f"clip_features.monet_feats_path={bank}",
        "clip_features.build_on_first_run=true",
        # the lax.scan window path — the resume realigns against this grid
        f"runtime.steps_per_call={WINDOW}",
        f"metrics.save_checkpoint_every={CKPT_EVERY}",
        "checkpoint.keep_last_n=10",
        f"log.every_steps={WINDOW}",
        "log.verbose=false",
    ]


def child(args) -> None:
    from gan_variant_research_tpu.core.config import load_config, override_config
    from gan_variant_research_tpu.train.loop import train_cut

    config = load_config(
        REPO / "gan_variant_research_tpu" / "configs" / "train_gan_cutpp.yaml")
    config = override_config(
        config, build_overrides(Path(args.data), Path(args.out), args.steps,
                                Path(args.bank)))
    train_cut(config, resume=args.resume)


def _spawn(data: Path, out: Path, steps: int, bank: Path,
           resume: str | None = None) -> subprocess.Popen:
    cmd = [sys.executable, __file__, "--child", "--data", str(data),
           "--out", str(out), "--steps", str(steps), "--bank", str(bank)]
    if resume:
        cmd += ["--resume", resume]
    with open(out / f"child_{int(time.time())}.log", "w") as log:
        # the child duplicates the fd; the parent's handle can close at once
        return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=str(REPO))


def _csv_max_step(path: Path) -> int:
    if not path.exists():
        return -1
    last = -1
    try:
        with open(path) as f:
            for row in csv.DictReader(f):
                last = max(last, int(row["step"]))
    except Exception:
        pass
    return last


def _read_losses(path: Path) -> dict[int, tuple[float, float]]:
    out: dict[int, tuple[float, float]] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            out[int(row["step"])] = (float(row["d_loss"]), float(row["g_loss"]))
    return out


def _read_jsonlog(log_dir: Path) -> dict[str, np.ndarray]:
    lines = []
    for raw in (log_dir / "train_log.txt").read_text().splitlines():
        prefix, _, payload = raw.partition(": ")
        if payload.strip().startswith("{"):
            entry = json.loads(payload)
            entry["step"] = int(prefix.split()[1])
            lines.append(entry)
    keys = ("step", "d_loss", "g_loss", "nce", "identity", "identity_weight",
            "featmatch", "palette", "repulsion")
    return {k: np.array([ln[k] for ln in lines if k in ln]) for k in keys}


def sample_grid(ckpt: Path, photos_dir: Path, monet_dir: Path, out_png: Path,
                gen_out: Path, n: int = 6) -> None:
    """input photos / EMA G(photo) / target-domain paintings, n columns."""
    from PIL import Image
    try:
        subprocess.run(
            [sys.executable, "-m",
             "gan_variant_research_tpu.cli.generate_folder",
             "--ckpt", str(ckpt), "--photos", str(photos_dir),
             "--out", str(gen_out), "--size", str(SIZE), "--batch", str(n),
             "--limit", str(n)],
            cwd=str(REPO), check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        # surface the child's traceback — it is the only diagnostic left
        # at the end of a ~45-minute A/B/B' run
        print(e.stdout, file=sys.stderr)
        print(e.stderr, file=sys.stderr)
        raise
    photos = sorted(photos_dir.glob("*.jpg"))[:n]
    fakes = sorted(gen_out.rglob("*.jpg"))[:n]
    paintings = sorted(monet_dir.glob("*.jpg"))[:n]
    grid = Image.new("RGB", (SIZE * n, SIZE * 3), "white")
    for row, paths in enumerate((photos, fakes, paintings)):
        for col, p in enumerate(paths):
            grid.paste(Image.open(p).resize((SIZE, SIZE)), (SIZE * col, SIZE * row))
    grid.save(out_png)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--kill-at", type=int, default=230)
    ap.add_argument("--work", default="/tmp/variant_convergence")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--data")
    ap.add_argument("--out")
    ap.add_argument("--bank")
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    work = Path(args.work)
    data = work / "data"
    bank = work / "bank.npz"
    out_a = work / "A_uninterrupted"
    out_b = work / "B_killed_resumed"
    import shutil

    for d in (out_a, out_b):
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True)
    bank.unlink(missing_ok=True)

    if not (data / "photos").exists():
        from convergence_smoke import write_dataset

        print("Writing synthetic dataset...")
        write_dataset(data, n_photos=300, n_paintings=150, size=SIZE)

    t0 = time.time()
    print(f"[A] uninterrupted everything-on run, {args.steps} steps...")
    pa = _spawn(data, out_a, args.steps, bank)
    assert pa.wait() == 0, (
        f"run A failed — see {sorted(out_a.glob('child_*.log'))[-1]}")
    t_a = time.time() - t0
    print(f"[A] done in {t_a / 60:.1f} min")

    print(f"[B] run to be SIGKILLed past step {args.kill_at}...")
    pb = _spawn(data, out_b, args.steps, bank)
    csv_b = out_b / "logs" / "losses_history.csv"
    while pb.poll() is None:
        if _csv_max_step(csv_b) >= args.kill_at:
            os.kill(pb.pid, signal.SIGKILL)
            print(f"[B] killed at logged step {_csv_max_step(csv_b)}")
            break
        time.sleep(1)
    pb.wait()
    killed_at = _csv_max_step(csv_b)
    assert killed_at >= args.kill_at, "run B exited before the kill point"
    assert killed_at < args.steps - 1, "run B finished before being killed"

    print("[B'] resuming with --resume auto...")
    pb2 = _spawn(data, out_b, args.steps, bank, resume="auto")
    assert pb2.wait() == 0, (
        f"resumed run failed — see {sorted(out_b.glob('child_*.log'))[-1]}")

    # ---- resume equality over the whole trajectory ----
    a = _read_losses(out_a / "logs" / "losses_history.csv")
    b = _read_losses(csv_b)
    assert set(a) == set(b), (
        f"step coverage differs: only-A={sorted(set(a) - set(b))[:5]} "
        f"only-B={sorted(set(b) - set(a))[:5]}")
    max_d = max(abs(a[s][0] - b[s][0]) for s in a)
    max_g = max(abs(a[s][1] - b[s][1]) for s in a)
    n_exact = sum(1 for s in a if a[s] == b[s])
    resume_step = max(s for s in range(0, killed_at + 1, CKPT_EVERY))
    resume_verdict = ("bitwise" if max_d == max_g == 0.0
                      else "tolerance" if max(max_d, max_g) < 1e-5 else "FAIL")

    # ---- convergence-shape checks on run A ----
    by = _read_jsonlog(out_a / "logs")
    n = len(by["step"])
    first_q, last_q = slice(0, max(1, n // 4)), slice(-max(1, n // 4), None)
    warmup = max(WINDOW, (args.steps // 3) // WINDOW * WINDOW)

    # Sample grid FIRST: generate_folder is a subprocess with its own jax
    # client, and flash_eligible("auto") below initializes a client in THIS
    # process — the axon chip hangs under two concurrent clients (probed
    # 2026-08-20, full_schedule_soak.py OPERATIONAL note), so every child
    # must finish before the parent's backend init.
    # A grid failure must NOT abort: the convergence plot + .md verdict are
    # the primary artifacts of a ~45-minute A/B/B' run and are written below.
    print("[samples] grid from B's final EMA checkpoint...")
    samples_err = None
    try:
        sample_grid(out_b / "ckpt" / "ckpt_final.msgpack", data / "photos",
                    data / "monet",
                    REPO / "docs" / "variant_convergence_samples.png",
                    gen_out=work / "_variant_gen")
    except Exception as e:  # subprocess/IO failure — keep the run's verdict
        samples_err = f"{type(e).__name__}: {e}"
        print(f"[samples] FAILED (continuing to plot/verdict): {samples_err}")

    from gan_variant_research_tpu.models.attention import flash_eligible

    attn_core = ("pallas_flash" if flash_eligible(
        (SIZE // 4) ** 2, 128 // 8, 128, "auto", batch=16) else "einsum")

    checks = {
        "resume_equality": resume_verdict != "FAIL",
        "all_finite": bool(all(np.isfinite(by[k]).all() for k in by)),
        "nce_decreasing": float(by["nce"][last_q].mean())
                          < 0.85 * float(by["nce"][first_q].mean()),
        "identity_weight_annealed_to_zero":
            float(by["identity_weight"][-1]) == 0.0,
        "d_loss_hinge_band": 0.1 <= float(by["d_loss"][last_q].mean()) <= 2.5,
        "featmatch_active": float(by["featmatch"].mean()) > 1e-4,
        "palette_active": float(by["palette"].mean()) > 1e-6,
        "repulsion_active": float(by["repulsion"].mean()) > 1e-4,
        "no_variant_loss_blowup": bool(
            float(by["featmatch"][last_q].mean())
            < 3 * max(1e-3, float(by["featmatch"][first_q].mean()))
            and float(by["palette"][last_q].mean())
            < 3 * max(1e-3, float(by["palette"][first_q].mean()))),
    }
    summary = {
        "steps": int(by["step"][-1]),
        "window": WINDOW,
        "warmup_steps": warmup,
        "killed_at": killed_at,
        "resume_step": resume_step,
        "resume_verdict": resume_verdict,
        "bitwise_equal_steps": f"{n_exact}/{len(a)}",
        "max_abs_d_loss_delta": float(max_d),
        "max_abs_g_loss_delta": float(max_g),
        "attn_core": attn_core,
        "nce_first_quarter": round(float(by["nce"][first_q].mean()), 4),
        "nce_last_quarter": round(float(by["nce"][last_q].mean()), 4),
        "featmatch_last_quarter": round(float(by["featmatch"][last_q].mean()), 4),
        "palette_last_quarter": round(float(by["palette"][last_q].mean()), 4),
        "repulsion_last_quarter": round(float(by["repulsion"][last_q].mean()), 4),
        "d_loss_last_quarter": round(float(by["d_loss"][last_q].mean()), 4),
        "identity_weight_last": float(by["identity_weight"][-1]),
        "run_minutes_A": round(t_a / 60, 1),
        "sample_grid_error": samples_err,
        "checks": checks,
    }

    # ---- artifacts ----
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(by["step"], by["d_loss"], label="d_loss")
    axes[0].plot(by["step"], by["g_loss"], label="g_loss")
    axes[0].axvline(killed_at, ls="--", c="gray", lw=0.8)
    axes[0].set_title("adversarial (dashed: B's kill step)")
    axes[0].legend(); axes[0].set_xlabel("step")
    axes[1].plot(by["step"], by["nce"], label="nce")
    axes[1].plot(by["step"], by["identity"], label="identity")
    axes[1].plot(by["step"], by["identity_weight"], label="identity weight")
    axes[1].axvline(warmup, ls=":", c="gray", lw=0.8)
    axes[1].set_title("NCE / identity anneal"); axes[1].legend()
    axes[1].set_xlabel("step")
    axes[2].plot(by["step"], by["featmatch"], label="featmatch")
    axes[2].plot(by["step"], by["palette"], label="palette")
    axes[2].plot(by["step"], by["repulsion"], label="repulsion")
    axes[2].set_title("restored variant losses"); axes[2].legend()
    axes[2].set_xlabel("step")
    fig.suptitle(f"Variant convergence — everything on, {SIZE}² × "
                 f"{summary['steps']} steps, scan window {WINDOW}, "
                 f"attn core: {attn_core}")
    fig.tight_layout()
    fig.savefig(REPO / "docs" / "variant_convergence.png", dpi=110)

    passed = all(checks.values())
    (REPO / "docs" / "variant_convergence.md").write_text(f"""# Variant-stack convergence + kill/resume ({time.strftime('%Y-%m-%d')})

Everything-on CUT (self-attention [{attn_core}], channel attention, style
dropout, feature matching, Lab palette prior, k-NN repulsion against a
feature bank built from the painting images), {SIZE}² batch 16, ngf 32 /
4 blocks, scan window {WINDOW}, identity anneal ending at step
{warmup} — `scripts/variant_convergence.py`, one v5e chip. The reference
deleted these features (Documentation/BASELINE_REVERSION.md:8-30, roadmap:
"add incrementally as deltas from this proven baseline"); this run is the
proof the restored stack trains as a combined configuration, survives
SIGKILL, and resumes exactly.

| run | what happened |
|---|---|
| A | uninterrupted steps 0..{args.steps} ({t_a / 60:.1f} min) |
| B | SIGKILLed at logged step {killed_at} (mid R1 period, before the anneal boundary) |
| B' | `--resume auto` from the step-{resume_step} checkpoint → {args.steps}, re-crossing the anneal boundary, the R1 cadence, and every scan-window boundary |

**Resume: {resume_verdict}** — {n_exact}/{len(a)} steps bitwise-equal to A,
max |Δ d_loss| = {max_d:.3e}, max |Δ g_loss| = {max_g:.3e}. The resumed
trajectory carries the variant state: attention/style-gate params, the
style-dropout PRNG stream, and the replicated repulsion bank.

```json
{json.dumps(summary, indent=2)}
```

**Result: {'PASS' if passed else 'FAIL'}** — curves in
variant_convergence.png; variant_convergence_samples.png shows input
photos (top), EMA G(photo) (middle), target-domain paintings (bottom).

Reproduce: `python scripts/variant_convergence.py --steps {args.steps} --kill-at {args.kill_at}`
""")
    print(json.dumps(summary, indent=2))
    print("PASS" if passed else "FAIL")
    assert passed, summary


if __name__ == "__main__":
    main()

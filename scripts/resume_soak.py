"""Soak + mid-run kill/resume at the flagship config (VERDICT r2 next #6).

Three runs of the PRODUCTION CUT config (256², ngf 64, 9 blocks, batch 32,
bf16) on synthetic two-domain data:

  A  uninterrupted:  steps 0..N
  B  killed:         SIGKILL mid-flight once the loss CSV passes --kill-at
                     (an off-cadence step: mid R1 period, and before the
                     identity-anneal boundary, which is pulled inside the
                     run via warmup_steps=2000)
  B' resumed:        --resume auto from B's last periodic checkpoint,
                     through the R1 cadence AND the anneal boundary, to N

The checkpoint stores the PRNG key and step counter, and the loader
fast-forwards its index streams by start_step (data/loader.py), so B'
must retrace A *step for step*. The script asserts per-step equality of
d_loss/g_loss over the whole run and writes the evidence table to
docs/resume_soak.md. Reference contract being exceeded: the reference's
--resume restores params/optimizers but loses RNG and iterator state
(train_cutpp.py:392-397).

Usage:  python scripts/resume_soak.py [--steps 5000] [--kill-at 1100]
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

TINY = False
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def build_overrides(data_root: Path, out_root: Path, steps: int, size: int,
                    tiny: bool = False):
    ov = [
        f"data.photos_dir={data_root / 'photos'}",
        f"data.monet_dir={data_root / 'monet'}",
        f"output.checkpoint_dir={out_root / 'ckpt'}",
        f"output.log_dir={out_root / 'logs'}",
        f"image_size={size}",
        f"max_steps={steps}",
        "batch_size=32",
        # pull the identity-anneal boundary inside the run (weight hits 0 at
        # step 2000); R1 keeps its production every=16 cadence
        "warmup_steps=2000",
        "metrics.save_checkpoint_every=1000",
        "checkpoint.keep_last_n=10",
        "log.every_steps=200",
        "log.verbose=true",
    ]
    if tiny:  # CPU plumbing check, not the soak
        ov += ["batch_size=4", "warmup_steps=8",
               "metrics.save_checkpoint_every=10", "log.every_steps=5",
               "model.generator.ngf=4", "model.generator.n_blocks=2",
               "model.discriminator.ndf=4", "model.discriminator.n_layers=2",
               "patchnce.num_patches=16", "r1.every=4",
               "runtime.precision=fp32", "parallel.num_devices=2"]
    return ov


def child(args) -> None:
    from gan_variant_research_tpu.core.config import load_config, override_config
    from gan_variant_research_tpu.train.loop import train_cut

    config = load_config(
        REPO / "gan_variant_research_tpu" / "configs" / "train_gan_cutpp.yaml")
    config = override_config(
        config, build_overrides(Path(args.data), Path(args.out), args.steps,
                                args.size, tiny=args.tiny))
    train_cut(config, resume=args.resume)


def _spawn(data: Path, out: Path, steps: int, size: int,
           resume: str | None = None) -> subprocess.Popen:
    cmd = [sys.executable, __file__, "--child", "--data", str(data),
           "--out", str(out), "--steps", str(steps), "--size", str(size)]
    if TINY:
        cmd += ["--tiny"]
    if resume:
        cmd += ["--resume", resume]
    log = open(out / f"child_{int(time.time())}.log", "w")
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
            # resumed runs append; the LAST occurrence of a step wins
            out[int(row["step"])] = (float(row["d_loss"]), float(row["g_loss"]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--kill-at", type=int, default=1100)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--work", default="/tmp/resume_soak")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--data")
    ap.add_argument("--out")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken CPU plumbing check (not the soak)")
    args = ap.parse_args()
    global TINY
    TINY = args.tiny

    if args.child:
        child(args)
        return

    work = Path(args.work)
    data = work / "data"
    out_a = work / "A_uninterrupted"
    out_b = work / "B_killed_resumed"
    for d in (out_a, out_b):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True)

    if not (data / "photos").exists():
        from convergence_smoke import write_dataset

        print("Writing synthetic dataset...")
        if TINY:
            write_dataset(data, n_photos=24, n_paintings=16, size=args.size)
        else:
            write_dataset(data, n_photos=300, n_paintings=150, size=args.size)

    t0 = time.time()
    print(f"[A] uninterrupted {args.steps}-step run...")
    pa = _spawn(data, out_a, args.steps, args.size)
    assert pa.wait() == 0, "run A failed"
    t_a = time.time() - t0
    print(f"[A] done in {t_a/60:.1f} min")

    print(f"[B] run to be SIGKILLed past step {args.kill_at}...")
    pb = _spawn(data, out_b, args.steps, args.size)
    csv_b = out_b / "logs" / "losses_history.csv"
    while pb.poll() is None:
        if _csv_max_step(csv_b) >= args.kill_at:
            os.kill(pb.pid, signal.SIGKILL)
            print(f"[B] killed at logged step {_csv_max_step(csv_b)}")
            break
        time.sleep(0.2 if TINY else 2)
    pb.wait()
    killed_at = _csv_max_step(csv_b)
    assert killed_at >= args.kill_at, "run B exited before the kill point"
    assert killed_at < args.steps - 1, "run B finished before being killed"

    print("[B'] resuming with --resume auto...")
    pb2 = _spawn(data, out_b, args.steps, args.size, resume="auto")
    assert pb2.wait() == 0, "resumed run failed"

    a = _read_losses(out_a / "logs" / "losses_history.csv")
    b = _read_losses(csv_b)
    assert set(a) == set(b), (
        f"step coverage differs: only-A={sorted(set(a)-set(b))[:5]} "
        f"only-B={sorted(set(b)-set(a))[:5]}")

    diffs = {s: (abs(a[s][0] - b[s][0]), abs(a[s][1] - b[s][1])) for s in a}
    max_d = max(v[0] for v in diffs.values())
    max_g = max(v[1] for v in diffs.values())
    n_exact = sum(1 for v in diffs.values() if v == (0.0, 0.0))
    ckpt_every = 10 if TINY else 1000
    resume_step = max(
        (s for s in a if s <= killed_at and s % ckpt_every == 0), default=0)

    verdict = "PASS (bitwise)" if max_d == max_g == 0.0 else (
        "PASS (within float tolerance)" if max(max_d, max_g) < 1e-5 else "FAIL")

    md = (work / "resume_soak.md") if TINY else (REPO / "docs" / "resume_soak.md")
    md.write_text(f"""# Flagship soak + mid-run resume (r3, {time.strftime('%Y-%m-%d')})

Production CUT config (256², ngf 64, n_blocks 9, batch 32, bf16,
R1 every 16, warmup_steps pulled to 2000 so the identity-anneal boundary
sits inside the run) on synthetic two-domain data; one v5e chip.

| run | what happened |
|---|---|
| A | uninterrupted steps 0..{args.steps} ({t_a/60:.1f} min) |
| B | SIGKILLed at logged step {killed_at} (mid R1 period; identity still annealing) |
| B' | `--resume auto` from the step-{resume_step} checkpoint → {args.steps} |

Resume machinery under test: checkpointed PRNG key + step counter
(`train/checkpoint.py`) and loader index fast-forward
(`UnpairedLoader(start_step=…)`, `data/loader.py`) — the resumed run must
consume exactly the batches the uninterrupted run saw.

**Result: {verdict}.**

- steps compared: {len(diffs)} (every logged step 0..{args.steps - 1})
- bitwise-equal steps: {n_exact}/{len(diffs)}
- max |Δ d_loss| = {max_d:.3e}, max |Δ g_loss| = {max_g:.3e}
- boundaries crossed by the resumed segment: R1 cadence (every 16) and the
  identity-anneal end at step 2000 (weight → 0, static-branch switch)

Reproduce: `python scripts/resume_soak.py --steps {args.steps} --kill-at {args.kill_at}`
""")
    print(md.read_text())
    result = {"verdict": verdict, "max_d": max_d, "max_g": max_g,
              "steps": len(diffs), "bitwise": n_exact}
    print(json.dumps(result))
    assert verdict != "FAIL", result


if __name__ == "__main__":
    main()

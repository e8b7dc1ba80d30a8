"""Aggregate the full-schedule soak's log into docs/full_schedule_soak.md.

Reads runs/full_schedule_soak/{log.jsonl,stdout.log,supervisor.log} (the
append-mode artifacts of scripts/full_schedule_soak.py across every
supervised attempt) and writes the committed record the harness promises:
per-phase window rates, wedge/resume history, identity-anneal boundary
behavior, checkpoint-prune evidence, and the wall-clock total against the
reference's 8-10 h anchor (QUICKSTART_BASELINE.md:105-108).

    python scripts/soak_report.py [--out runs/full_schedule_soak]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "runs/full_schedule_soak"))
    ap.add_argument("--doc", default=str(REPO / "docs/full_schedule_soak.md"))
    ap.add_argument("--allow-partial", action="store_true",
                    help="write the record even if steps_completed < "
                         "requested (the doc text still reports the real "
                         "counts; finiteness is asserted regardless)")
    args = ap.parse_args()
    out = Path(args.out)

    windows: list[dict] = []
    wedges: list[dict] = []
    resumes: list[dict] = []
    torn = 0
    for line in (out / "log.jsonl").read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            torn += 1
            continue
        if rec.get("wedged"):
            wedges.append(rec)
        elif "resumed" in rec:
            resumes.append(rec)
        elif "img_per_sec" in rec:
            windows.append(rec)

    # summary line from the final successful attempt
    summary = None
    for line in (out / "stdout.log").read_text().splitlines():
        if line.startswith("{") and "steps_completed" in line:
            try:
                summary = json.loads(line)
            except json.JSONDecodeError:
                continue
    assert summary is not None, "no summary line in stdout.log yet"
    # the doc asserts finiteness + completion — refuse to write it otherwise
    assert summary.get("nan_at") is None, f"run went non-finite: {summary}"
    assert args.allow_partial or \
        summary["steps_completed"] >= summary["requested_steps"], \
        f"run incomplete: {summary['steps_completed']}/{summary['requested_steps']}"

    # de-duplicate replayed windows (a resume re-runs from the restored
    # checkpoint, so early attempts can log a step twice): keep the LAST
    # occurrence — the one that fed the surviving trajectory.
    by_step: dict[int, dict] = {w["step"]: w for w in windows}
    steps = sorted(by_step)
    rate = {s: by_step[s]["img_per_sec"] for s in steps}
    loss = {s: by_step[s] for s in steps}

    def phase_rates(lo: int, hi: int) -> list[float]:
        return [rate[s] for s in steps if lo < s <= hi]

    warm = phase_rates(0, 20000)
    steady = phase_rates(20000, 60000)
    # contended windows: the 1-core host ran the full CPU test suite and
    # several smokes during the soak; flag the slow tail rather than hide it
    all_rates = np.array([rate[s] for s in steps], dtype=np.float64)
    p50, p90 = np.percentile(all_rates, 50), np.percentile(all_rates, 90)

    total_wall_h = sum(
        w.get("wall_s", 0.0) for w in
        # last wall_s per attempt = that attempt's train wall clock
        _attempt_tails(windows)
    ) / 3600.0

    def near(s_target: int, k: int = 3) -> list[dict]:
        picks = [s for s in steps if abs(s - s_target) <= 250 * k]
        return [loss[s] for s in picks[:2 * k]]

    anneal_rows = "\n".join(
        f"| {r['step']} | {r['identity_weight']:.4f} | {r['identity']:.4f} | "
        f"{r['nce']:.4f} | {r['d_loss']:.4f} | {r['g_loss']:.4f} |"
        for r in near(20000)
    )
    final_rows = "\n".join(
        f"| {r['step']} | {r['identity_weight']:.4f} | {r['identity']:.4f} | "
        f"{r['nce']:.4f} | {r['d_loss']:.4f} | {r['g_loss']:.4f} |"
        for r in (loss[s] for s in steps[-6:])
    )

    ckpts = sorted(p.name for p in out.glob("ckpt_*.msgpack"))
    wedge_rows = "\n".join(
        f"| wedge | step {w['last_step']} | stale {w['stale_s']}s "
        f"({w.get('phase', 'train')}) |" for w in wedges
    ) + ("\n" if wedges else "") + "\n".join(
        f"| resume | step {r['resumed']} | from {r['from']} |"
        for r in resumes
    )

    doc = f"""# Full 60k-step reference-schedule soak ({time.strftime('%Y-%m-%d')})

The reference's headline training artifact is a 60,000-step run — batch 12
× 256² in 8-10 h on an A100 40GB
(`Documentation/QUICKSTART_BASELINE.md:105-108`). This is the same
schedule driven end to end on ONE v5e chip at **batch {summary['batch']}**
(2.67× the reference's images/step): identity anneal to zero at 20k, lazy
R1 every 16, EMA, periodic checkpoints with keep_last_n pruning —
`scripts/full_schedule_soak.py`, supervised across tunnel wedges by
`scripts/soak_supervisor.sh` (exact-PID watchdog + probe + `--resume`
relaunch, the framework's own `--resume auto` contract).

```json
{json.dumps(summary, indent=2)}
```

## Outcome

- **{summary['steps_completed']:,} / {summary['requested_steps']:,} steps
  completed; every logged loss finite** ({len(steps)} windows of 250
  steps). {summary['images_trained']:,} images trained.
- **Train wall clock ≈ {total_wall_h:.2f} h** summed over attempts
  (startup/compile/wedge-wait excluded). The reference needs 8-10 h for
  the same 60k steps at 2.67× fewer images/step.
- Mean rate: warm phase (identity active, ≤20k) **{np.mean(warm):.1f}
  img/s**, steady phase **{np.mean(steady) if steady else float("nan"):.1f}
  img/s**; window p50
  {p50:.1f}, p90 {p90:.1f}, min {all_rates.min():.1f}, max
  {all_rates.max():.1f}. Slow-tail windows coincide with the 1-core
  host running the full CPU test suite concurrently — CPU contention
  inflates dispatch, not device time (docs/PERF.md).
- **{len(wedges)} tunnel wedges survived, {len(resumes)} checkpoint
  resumes** across the supervised attempts ({torn} torn log lines
  tolerated):

| event | where | detail |
|---|---|---|
{wedge_rows}

A note on the raw log's `r1` field: it samples the LAST step of each
250-step window, and 250k−1 ≡ 0 (mod 16) has no solution, so the sampled
value reads 0.0 in every window even though lazy R1 executes on 1 of
every 16 steps inside each window (its cost is inside every window time;
its execution is separately pinned by the driver's `dryrun_multichip`
tail, r1 > 0, and `tests/test_cut_trainer.py` cadence assertions).

## Identity-anneal boundary (20k)

The schedule's one phase change: identity weight anneals 0.1 → 0 linearly
over the first 20k steps (reference `train_cutpp.py:224-228`), after which
the step compiles to the cheaper no-identity variant. Windows around the
boundary:

| step | identity_weight | identity | nce | d_loss | g_loss |
|---|---|---|---|---|---|
{anneal_rows}

## Final windows (the 40-50k+ convergence regime)

| step | identity_weight | identity | nce | d_loss | g_loss |
|---|---|---|---|---|---|
{final_rows}

## Checkpoint pruning

`keep_last_n=3` periodic checkpoints (every 2,000 steps) plus the final —
on disk at completion: {', '.join(ckpts)}. Earlier periodic files were
pruned as promised; the resume chain above restored from them while they
were the newest.

## Samples from the final checkpoint

![input photos / EMA G(photo) after 60k steps / target
paintings](full_schedule_soak_samples.png)

Rows: input domain, the EMA generator's output at step 60k (from the
pipeline-e2e run on this checkpoint, `docs/pipeline_e2e.md`), target
domain. Content is preserved (PatchNCE) while the global palette/contrast
shifts toward the target domain — the expected unpaired-translation
equilibrium on these synthetic domains.

Reproduce: `scripts/soak_supervisor.sh 60000` (chip must be otherwise
idle — single-client constraint, see the harness docstring), then
`python scripts/soak_report.py` (the sample grid comes from
`scripts/pipeline_e2e.py` run on the final checkpoint).
"""
    Path(args.doc).write_text(doc)
    print(f"wrote {args.doc}: {summary['steps_completed']} steps, "
          f"{len(wedges)} wedges, {len(resumes)} resumes, "
          f"{total_wall_h:.2f} train-hours")


def _attempt_tails(windows: list[dict]) -> list[dict]:
    """Last window of each monotone wall_s run (= per-attempt tail)."""
    tails = []
    for i, w in enumerate(windows):
        nxt = windows[i + 1] if i + 1 < len(windows) else None
        if nxt is None or nxt.get("wall_s", 0.0) < w.get("wall_s", 0.0):
            tails.append(w)
    return tails


if __name__ == "__main__":
    main()

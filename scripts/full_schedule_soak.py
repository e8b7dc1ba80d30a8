"""Run the COMPLETE reference training schedule (60k steps) on one chip.

The reference trains GAN_Variant1 for 60,000 steps at batch 12 × 256² in
8–10 h on an A100 40GB (Documentation/QUICKSTART_BASELINE.md:105-108).
bench.py measures the per-step rate in 16-step windows; this soak is the
end-to-end proof: the full 60k-step schedule — identity-anneal boundary at
20k, R1 cadence, EMA, periodic checkpoints with keep_last_n — at batch
**32** (2.67× the reference's images/step) completed on one v5e, with the
wall clock, per-phase step times, and loss finiteness recorded for every
window. Data is the structured synthetic two-domain set of the
convergence smokes, pre-staged on device (the axon tunnel's ~25 MB/s
host→device path is an artifact of THIS harness, not the hardware —
docs/PERF.md "End-to-end training loop in THIS harness").

    python scripts/full_schedule_soak.py [--steps 60000] [--log-every 250]

Artifacts: runs/full_schedule_soak/log.jsonl (one line per window),
checkpoints every --ckpt-every (2k) steps with keep_last_n=3,
docs/full_schedule_soak.md (final record, written by scripts/soak_report.py).

OPERATIONAL: the axon chip does NOT tolerate concurrent clients (two
simultaneous processes hang where one finishes in 3 s — probed
2026-08-20). This run holds the chip for ~4-5 h; launch it only at the
START of a work session, with `setsid nohup`, and never when the
driver's end-of-round bench.py could fire. A 200-step sanity run
passed end to end (finite losses, checkpoints written, 91.9 img/s
non-R1 windows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.convergence_smoke import make_painting, make_photo  # noqa: E402

N_BATCHES = 48


def staged_batches(rng: np.random.Generator, batch: int, size: int,
                   sharding) -> tuple[list, list]:
    import jax

    photos = np.stack([make_photo(rng, size) for _ in range(256)])
    paintings = np.stack([make_painting(rng, size) for _ in range(256)])
    p_batches = [
        jax.device_put(photos[rng.choice(len(photos), batch, replace=False)],
                       sharding)
        for _ in range(N_BATCHES)
    ]
    m_batches = [
        jax.device_put(
            paintings[rng.choice(len(paintings), batch, replace=False)],
            sharding)
        for _ in range(N_BATCHES)
    ]
    jax.block_until_ready((p_batches, m_batches))
    return p_batches, m_batches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60000)
    ap.add_argument("--log-every", type=int, default=250)
    ap.add_argument("--ckpt-every", type=int, default=2000)
    ap.add_argument("--out", default=str(REPO / "runs" / "full_schedule_soak"))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256,
                    help="--batch/--size exist so the resume/supervisor "
                         "machinery can be driven at CPU scale; the soak "
                         "record itself is batch 32 x 256^2")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in --out and "
                         "append to its log. This is the recovery half of the "
                         "wedge watchdog: scripts/soak_supervisor.sh relaunches "
                         "a wedged soak with --resume once the chip grant "
                         "releases, exactly the framework's own `--resume auto` "
                         "contract (train/loop.py:118-170)")
    ap.add_argument("--sync-every", type=int, default=10,
                    help="fetch one loss scalar every N steps to bound the "
                         "in-flight dispatch queue. Evidence 2026-08-20: "
                         "wedge frequency tracks queue depth — per-step sync "
                         "(the train CLI, resume_soak) ran for hours, "
                         "bench.py's <=18-deep windows never wedged, this "
                         "harness's 50-deep sync wedged within minutes as "
                         "the tunnel degraded through the day, and the "
                         "original 250-deep enqueue wedged twice within "
                         "~25 min (futex-blocked fetch, relay idle). 10 "
                         "costs <3% of a window and keeps the queue shallow")
    ap.add_argument("--wedge-timeout", type=float, default=600.0,
                    help="abort if no window completes for this many seconds "
                         "(a wedged tunnel RPC blocks the fetch forever — "
                         "observed 2026-08-20: ~90 s windows stopped dead "
                         "with the main thread in a futex wait and the axon "
                         "relay idle; without a watchdog that silently eats "
                         "the rest of a session)")
    args = ap.parse_args()

    from gan_variant_research_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from __graft_entry__ import _flagship_config
    from gan_variant_research_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # The exact PID holding the chip grant — operators must kill THIS (never
    # a pattern match) to free a wedged client. Scoped to the run dir so a
    # concurrent CPU-scale run (the test suite drives one) can't clobber
    # the pid of the chip run an operator actually needs to kill.
    (out / "soak.pid").write_text(str(os.getpid()))
    log_path = out / "log.jsonl"
    log_f = open(log_path, "a" if args.resume else "w")

    # Wedge watchdog: device fetches block in an uninterruptible futex wait
    # when the tunnel drops a session, so no in-band timeout can fire. A
    # daemon thread tracks the last completed window and hard-exits with a
    # self-explanatory record if progress stops. It starts BEFORE the first
    # device touch: client creation, resume-restore, staging, and compile
    # can all wedge too (attempt 2 on 2026-08-20 hung before its first
    # window). Those startup phases get a fixed 900 s allowance (cold +
    # CPU-contended compile was measured at 435 s); the configured timeout
    # applies once the train loop is producing windows.
    import threading

    # phase: "startup" and "saving" get the fixed 900 s allowance (cold +
    # CPU-contended compile measured at 435 s; a checkpoint save fetches a
    # multi-hundred-MB payload over the degradable ~25 MB/s tunnel, so a
    # healthy-but-slow save must not be misclassified as a wedge); the
    # configured timeout applies only while the train loop produces windows.
    progress = {"t": time.time(), "step": 0, "phase": "startup"}

    def _watchdog() -> None:
        while True:
            time.sleep(15.0)
            stale = time.time() - progress["t"]
            limit = args.wedge_timeout if progress["phase"] == "train" else 900.0
            if stale > limit:
                rec = {"wedged": True, "last_step": progress["step"],
                       "stale_s": round(stale, 1),
                       "phase": progress["phase"]}
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
                print(f"[soak] WEDGED: no progress for {stale:.0f}s at step "
                      f"{progress['step']} — tunnel RPC hang; aborting",
                      file=sys.stderr, flush=True)
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    batch, size = args.batch, args.size
    cfg = _flagship_config(image_size=size, batch_size=batch)
    cfg["max_steps"] = args.steps
    trainer = CUTTrainer(cfg)

    start_step = 0
    if args.resume:
        ckpt = latest_checkpoint(out)
        if ckpt is not None:
            blob = load_checkpoint(ckpt)
            start_step = blob["step"]
            state = trainer.state_from_payload(blob["payload"], start_step)
            rec = {"resumed": start_step, "from": ckpt.name}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            print(f"[soak] resumed at step {start_step} from {ckpt.name}",
                  file=sys.stderr, flush=True)
        else:
            state = trainer.init_state()
            print("[soak] --resume: no checkpoint yet, fresh start",
                  file=sys.stderr, flush=True)
    else:
        state = trainer.init_state()

    rng = np.random.default_rng(7)
    sharding = trainer.mesh.batch_sharding(4)
    print("[soak] staging synthetic batches on device...", file=sys.stderr,
          flush=True)
    p_batches, m_batches = staged_batches(rng, batch, size, sharding)

    print("[soak] warm compile (all 4 step variants)...", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    trainer.warm_compile(state, p_batches[0], m_batches[0], parallel=True)
    print(f"[soak] compiles done in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    progress["t"], progress["step"] = time.time(), start_step
    progress["phase"] = "train"

    warmup = cfg["warmup_steps"]
    t_start = time.perf_counter()
    t_win = t_start
    win_start = start_step
    losses = None
    nan_at = None
    for s in range(start_step, args.steps):
        p = p_batches[s % N_BATCHES]
        m = m_batches[(s + s // N_BATCHES) % N_BATCHES]
        state, losses = trainer.train_step(state, p, m, step=s)
        # Heartbeat every dispatch, not just every sync: under CPU
        # contention, dispatching sync_every steps can legitimately take
        # minutes (1-core host), and the watchdog must only fire when a
        # FETCH blocks (the loop stops moving), not when dispatch is slow.
        progress["t"] = time.time()

        if (s + 1) % args.sync_every == 0:
            float(losses["g_loss"])  # bound the in-flight queue (see --help)
            progress["t"], progress["step"] = time.time(), s + 1

        if (s + 1) % args.log_every == 0 or s + 1 == args.steps:
            vals = {k: float(v) for k, v in losses.items()}  # sync point
            progress["t"], progress["step"] = time.time(), s + 1
            now = time.perf_counter()
            n_win = s + 1 - win_start
            win_start = s + 1
            rate = batch * n_win / (now - t_win)
            rec = {"step": s + 1, "wall_s": round(now - t_start, 1),
                   "img_per_sec": round(rate, 1),
                   **{k: round(v, 4) for k, v in vals.items()}}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            t_win = time.perf_counter()
            if not all(np.isfinite(v) for v in vals.values()):
                nan_at = s + 1
                print(f"[soak] NON-FINITE at step {nan_at}: {vals}",
                      file=sys.stderr, flush=True)
                break

        if (s + 1) % args.ckpt_every == 0 and s + 1 != args.steps:
            progress["phase"] = "saving"
            save_checkpoint(out / f"ckpt_step{s + 1}.msgpack", s + 1,
                            trainer.checkpoint_payload(state), config=cfg,
                            keep_last_n=3)
            progress["t"], progress["phase"] = time.time(), "train"
            t_win = time.perf_counter()  # don't bill the save to the window

    wall = time.perf_counter() - t_start
    progress["phase"] = "saving"
    save_checkpoint(out / "ckpt_final.msgpack", int(state.step),
                    trainer.checkpoint_payload(state), config=cfg)
    progress["t"] = time.time()
    log_f.close()

    # Aggregate across the WHOLE log (append-mode resumes included), so a
    # supervised run that survived wedges reports the full trajectory.
    all_windows: list[tuple[int, float]] = []
    wedges = resumes = torn_lines = 0
    for line in log_path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            # A prior attempt's os._exit(3) skips buffered flushes and the
            # watchdog thread writes to the same file object, so a torn
            # partial line is possible; it must not crash the summary of an
            # otherwise-successful resumed run.
            torn_lines += 1
            continue
        if rec.get("wedged"):
            wedges += 1
        elif "resumed" in rec:
            resumes += 1
        elif "img_per_sec" in rec:
            all_windows.append((rec["step"], rec["img_per_sec"]))

    warm_rates = [r for st, r in all_windows if st <= warmup]
    steady_rates = [r for st, r in all_windows if st > warmup]
    summary = {
        "steps_completed": int(state.step),
        "requested_steps": args.steps,
        "batch": batch,
        "image_size": size,
        "wall_hours_final_attempt": round(wall / 3600.0, 3),
        "images_trained": int(state.step) * batch,
        "mean_img_per_sec_warm": round(float(np.mean(warm_rates)), 1)
        if warm_rates else None,
        "mean_img_per_sec_steady": round(float(np.mean(steady_rates)), 1)
        if steady_rates else None,
        "min_window_img_per_sec": round(min(r for _, r in all_windows), 1),
        "max_window_img_per_sec": round(max(r for _, r in all_windows), 1),
        "tunnel_wedges_survived": wedges,
        "resumes": resumes,
        "torn_log_lines": torn_lines,
        "all_finite": nan_at is None,
        "nan_at": nan_at,
        "reference_anchor": "60k steps @ batch 12 in 8-10 h (A100 40GB, "
                            "QUICKSTART_BASELINE.md:105-108)",
    }
    print(json.dumps(summary), flush=True)
    ok = nan_at is None and int(state.step) == args.steps
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

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
checkpoints every 15k steps, docs/full_schedule_soak.md (final record).

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
    ap.add_argument("--ckpt-every", type=int, default=15000)
    ap.add_argument("--out", default=str(REPO / "runs" / "full_schedule_soak"))
    ap.add_argument("--sync-every", type=int, default=50,
                    help="fetch one loss scalar every N steps to bound the "
                         "in-flight dispatch queue. Evidence 2026-08-20: "
                         "runs that keep <=18 steps in flight (bench.py) or "
                         "sync per step (the train CLI, resume_soak) run for "
                         "hours on the axon tunnel; this harness's original "
                         "250-deep enqueue wedged twice within ~25 min "
                         "(futex-blocked fetch, relay idle)")
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
    from gan_variant_research_tpu.train.checkpoint import save_checkpoint
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    log_path = out / "log.jsonl"
    log_f = open(log_path, "w")

    batch, size = 32, 256
    cfg = _flagship_config(image_size=size, batch_size=batch)
    cfg["max_steps"] = args.steps
    trainer = CUTTrainer(cfg)
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

    # Wedge watchdog: device fetches block in an uninterruptible futex wait
    # when the tunnel drops a session, so no in-band timeout can fire. A
    # daemon thread tracks the last completed window and hard-exits with a
    # self-explanatory record if progress stops. Compile/staging phases are
    # covered too (they complete before this point).
    import threading

    progress = {"t": time.time(), "step": 0}

    def _watchdog() -> None:
        while True:
            time.sleep(15.0)
            stale = time.time() - progress["t"]
            if stale > args.wedge_timeout:
                rec = {"wedged": True, "last_step": progress["step"],
                       "stale_s": round(stale, 1)}
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
                print(f"[soak] WEDGED: no window for {stale:.0f}s at step "
                      f"{progress['step']} — tunnel RPC hang; aborting",
                      file=sys.stderr, flush=True)
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    warmup = cfg["warmup_steps"]
    t_start = time.perf_counter()
    t_win = t_start
    losses = None
    nan_at = None
    window_rates: list[tuple[int, float]] = []
    for s in range(args.steps):
        p = p_batches[s % N_BATCHES]
        m = m_batches[(s + s // N_BATCHES) % N_BATCHES]
        state, losses = trainer.train_step(state, p, m, step=s)

        if (s + 1) % args.sync_every == 0:
            float(losses["g_loss"])  # bound the in-flight queue (see --help)
            progress["t"], progress["step"] = time.time(), s + 1

        if (s + 1) % args.log_every == 0 or s + 1 == args.steps:
            vals = {k: float(v) for k, v in losses.items()}  # sync point
            progress["t"], progress["step"] = time.time(), s + 1
            now = time.perf_counter()
            n_win = args.log_every if (s + 1) % args.log_every == 0 else \
                (s + 1) % args.log_every
            rate = batch * n_win / (now - t_win)
            window_rates.append((s + 1, rate))
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
            save_checkpoint(out / f"ckpt_step{s + 1}.msgpack", s + 1,
                            trainer.checkpoint_payload(state), config=cfg,
                            keep_last_n=3)

    wall = time.perf_counter() - t_start
    save_checkpoint(out / "ckpt_final.msgpack", int(state.step),
                    trainer.checkpoint_payload(state), config=cfg)
    log_f.close()

    warm_rates = [r for st, r in window_rates if st <= warmup]
    steady_rates = [r for st, r in window_rates if st > warmup]
    summary = {
        "steps_completed": int(state.step),
        "requested_steps": args.steps,
        "batch": batch,
        "image_size": size,
        "wall_hours": round(wall / 3600.0, 3),
        "images_trained": int(state.step) * batch,
        "mean_img_per_sec_warm": round(float(np.mean(warm_rates)), 1)
        if warm_rates else None,
        "mean_img_per_sec_steady": round(float(np.mean(steady_rates)), 1)
        if steady_rates else None,
        "min_window_img_per_sec": round(min(r for _, r in window_rates), 1),
        "max_window_img_per_sec": round(max(r for _, r in window_rates), 1),
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

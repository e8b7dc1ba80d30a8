"""Profile the flagship CUT train step and print an HLO-category table.

Captures a `jax.profiler` trace of N steady-state steps (R1-cadence aligned,
device-staged batches — bench.py methodology) and aggregates device time by
the trace's `hlo_category`, with per-category bytes and achieved bandwidth.
This is how the r2/r3 attribution tables in docs/PERF.md were produced.

Usage:
    python scripts/profile_step.py [--steps 8] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def capture(out_dir: str, n_steps: int) -> None:
    from gan_variant_research_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from __graft_entry__ import _flagship_config
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    cfg = _flagship_config(image_size=256, batch_size=32)
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    sharding = trainer.mesh.batch_sharding(4)
    batches = [
        jax.device_put(
            (rng.integers(0, 256, (32, 256, 256, 3), dtype=np.uint8),
             rng.integers(0, 256, (32, 256, 256, 3), dtype=np.uint8)),
            sharding)
        for _ in range(2)
    ]
    jax.block_until_ready(batches)
    trainer.warm_compile(state, *batches[0])

    start = cfg["warmup_steps"] + 16  # steady phase, R1-cadence aligned
    s, losses = state, None
    for k in range(4):  # pipeline warm
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + k)
    float(losses["g_loss"])  # axon: block_until_ready is unreliable
    jax.profiler.start_trace(out_dir)
    for k in range(n_steps):
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + 4 + k)
    float(losses["g_loss"])
    jax.profiler.stop_trace()


def summarize(out_dir: str, n_steps: int) -> None:
    traces = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise FileNotFoundError(f"no trace under {out_dir}")
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    # device pid: the process named /device:TPU:* (CPU backend: TFRT)
    dev_pids = {e["pid"] for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "CPU" not in e["args"].get("name", "")}
    ev = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in dev_pids]
    dur = collections.Counter()
    byt = collections.Counter()
    for e in ev:
        a = e.get("args") or {}
        c = a.get("hlo_category")
        if not c:
            continue
        dur[c] += e["dur"]
        byt[c] += int(a.get("bytes_accessed", 0))
    total = sum(dur.values()) / n_steps / 1000
    print(f"device time, categorized: {total:.1f} ms/step over {n_steps} steps")
    print(f"{'ms/step':>8}  {'category':28s} {'GB/step':>8} {'GB/s':>7}")
    for c, d in dur.most_common():
        ms = d / n_steps / 1000
        gb = byt[c] / n_steps / 1e9
        gbps = gb / (ms / 1000) if ms > 0.01 else 0.0
        print(f"{ms:8.2f}  {c:28s} {gb:8.2f} {gbps:7.0f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/prof_step")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.out, args.steps)
    summarize(args.out, args.steps)


if __name__ == "__main__":
    main()

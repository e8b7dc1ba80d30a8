"""Probe: CUT train-step throughput at an arbitrary batch size.

Same methodology as bench.py (device-staged batches, warm_compile, windows
starting on the R1 cadence, scalar-fetch completion, best-of windows), but
with --batch free — built for the apples-to-apples row against the
reference's OWN training regime (batch 12 @ 256², the A100 anchor of
Documentation/QUICKSTART_BASELINE.md:105-108 ⇒ ~22.5 img/s).

    python scripts/probe_cut_batch.py --batch 12
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16,
                    help="steps per timed window (multiple of r1.every)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from gan_variant_research_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from __graft_entry__ import _flagship_config
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    cfg = _flagship_config(image_size=args.size, batch_size=args.batch)
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    sharding = trainer.mesh.batch_sharding(4)
    shape = (args.batch, args.size, args.size, 3)
    batches = [
        jax.device_put(
            (rng.integers(0, 256, shape, dtype=np.uint8),
             rng.integers(0, 256, shape, dtype=np.uint8)),
            sharding,
        )
        for _ in range(2)
    ]
    jax.block_until_ready(batches)
    trainer.warm_compile(state, *batches[0])

    def window(start_step: int, n: int) -> float:
        nonlocal state
        s, losses = state, None
        for k in range(2):
            p, m = batches[k % len(batches)]
            s, losses = trainer.train_step(s, p, m, step=start_step + k)
        float(losses["g_loss"])  # axon: block_until_ready is unreliable
        t0 = time.perf_counter()
        for k in range(n):
            p, m = batches[k % len(batches)]
            s, losses = trainer.train_step(s, p, m, step=start_step + k)
        float(losses["g_loss"])
        state = s
        return (time.perf_counter() - t0) / n

    warm = [window(0, args.steps) for _ in range(args.reps)]
    steady = [window(cfg["warmup_steps"] + 16, args.steps)
              for _ in range(args.reps)]
    t_warm, t_steady = min(warm), min(steady)
    warm_frac = min(1.0, cfg["warmup_steps"] / 60000.0)
    dt = warm_frac * t_warm + (1.0 - warm_frac) * t_steady
    print(json.dumps({
        "batch": args.batch,
        "image_size": args.size,
        "blended_img_per_sec": round(args.batch / dt, 2),
        "steady_img_per_sec": round(args.batch / t_steady, 2),
        "warm_ms_per_step": [round(1000 * t, 1) for t in warm],
        "steady_ms_per_step": [round(1000 * t, 1) for t in steady],
        "warm_stddev_ms": round(1000 * statistics.pstdev(warm), 2),
        "steady_stddev_ms": round(1000 * statistics.pstdev(steady), 2),
    }))


if __name__ == "__main__":
    main()

"""Probe: pad-free reflect trunk convs vs the materialized-pad baseline.

Targets the one sub-roofline slice of the 230 ms steady CUT step
(docs/PERF.md r3 attribution): ~27 ms of layout copies, 36 of them the
(32, 66, 66, 256) reflect-pad materializations of the 18 trunk convs
(fwd+bwd). `model.generator.pad_free` recomputes each as zero-pad conv
(folded into the conv window — no copy) + four exact border-strip convs
(ops/nn_ops.py::conv3x3_reflect_padfree; exactness tests in
tests/test_padfree_conv.py).

Methodology = bench.py steady phase: device-staged batches, 16-step
windows on the R1 cadence, scalar-fetch completion, best-of reps. Each
cell runs in its own process.

    python scripts/probe_padfree.py              # both cells
    python scripts/probe_padfree.py --cell base  # one cell
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_cell(pad_free: bool) -> dict:
    from gan_variant_research_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_config
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    batch, size = 32, 256
    cfg = _flagship_config(image_size=size, batch_size=batch)
    cfg["model"]["generator"]["pad_free"] = pad_free
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    sharding = trainer.mesh.batch_sharding(4)
    shape = (batch, size, size, 3)
    batches = [
        jax.device_put(
            (rng.integers(0, 256, shape, dtype=np.uint8),
             rng.integers(0, 256, shape, dtype=np.uint8)),
            sharding,
        )
        for _ in range(2)
    ]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    trainer.warm_compile(state, *batches[0],
                         variants=[(True, False), (False, False)])
    compile_s = time.perf_counter() - t0

    def window(start_step: int, n: int = 16) -> float:
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

    start = cfg["warmup_steps"] + 16
    steady = [window(start) for _ in range(4)]
    return {
        "pad_free": pad_free,
        "steady_ms_per_step": [round(1000 * t, 1) for t in steady],
        "best_ms": round(1000 * min(steady), 1),
        "stddev_ms": round(1000 * statistics.pstdev(steady), 2),
        "img_per_sec": round(batch / min(steady), 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", choices=("base", "padfree"), default=None)
    args = ap.parse_args()

    if args.cell is not None:
        print(json.dumps(run_cell(args.cell == "padfree")), flush=True)
        return

    for cell in ("base", "padfree"):
        print(f"[grid] {cell}", file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--cell", cell],
                cwd=str(REPO), env=dict(os.environ), capture_output=True,
                text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            # emit the same JSON error contract instead of dying with a
            # traceback that leaves the previous cell's line as the tail
            print(json.dumps({"cell": cell, "error": "timeout after 2400s"}),
                  flush=True)
            continue
        if proc.returncode != 0:
            print(json.dumps({"cell": cell, "error": proc.stderr[-800:]}),
                  flush=True)
        else:
            print(proc.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()

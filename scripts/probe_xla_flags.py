"""Probe: XLA compiler-flag grid on the flagship CUT steady-state step.

The r3 profile (docs/PERF.md "Step-time attribution") leaves one
sub-roofline slice in the 230 ms steady step: ~27 ms of layout copies at
~half HBM bandwidth (the reflect-pad materializations XLA cannot absorb
into convs). The direct Pallas fix is a measured end-to-end loss; the one
remaining compiler-side lever is fusion sizing — `
--xla_tpu_scoped_vmem_limit_kib` raises the VMEM budget the fusion
allocator may scope, letting bigger fusion clusters keep operands resident.

Each cell runs in its own subprocess (XLA flags must be fixed before the
backend initializes; the persistent compile cache keys on compile options,
so cells do not cross-pollute). Methodology per cell = bench.py steady
phase only: device-staged batches, windows on the R1 cadence, scalar-fetch
completion, best-of reps.

    python scripts/probe_xla_flags.py            # full grid
    python scripts/probe_xla_flags.py --cell ""  # one cell (control)

MEASURED 2026-08-19 (one v5e over the axon tunnel): control reproduces
the 229.4 ms record, but this environment's client XLA build hard-aborts
on TPU compiler flags (`F parse_flags_from_env: Unknown flag in
XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib=...`) — the axon client does
not link libtpu's flag table and compilation happens server-side, so
compiler-flag tuning is NOT probe-able here. The grid remains valid on a
real TPU VM, where libtpu parses these from XLA_FLAGS.
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

GRID: dict[str, str] = {
    "control": "",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
}


def run_cell(flags: str) -> dict:
    from gan_variant_research_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_config
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    batch, size = 32, 256
    cfg = _flagship_config(image_size=size, batch_size=batch)
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
    # steady phase only: identity off; the 16-step window pays one R1 step
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
    steady = [window(start) for _ in range(3)]
    return {
        "flags": flags,
        "steady_ms_per_step": [round(1000 * t, 1) for t in steady],
        "best_ms": round(1000 * min(steady), 1),
        "stddev_ms": round(1000 * statistics.pstdev(steady), 2),
        "img_per_sec": round(batch / min(steady), 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default=None,
                    help="run ONE cell in-process with these raw flags")
    args = ap.parse_args()

    if args.cell is not None:
        print(json.dumps(run_cell(args.cell)), flush=True)
        return

    results = []
    for name, flags in GRID.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"[grid] {name}: XLA_FLAGS={env['XLA_FLAGS']!r}",
              file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, __file__, f"--cell={flags}"],
            cwd=str(REPO), env=env, capture_output=True, text=True,
            timeout=1800)
        if proc.returncode != 0:
            results.append({"name": name, "flags": flags,
                            "error": proc.stderr[-500:]})
        else:
            results.append({"name": name, **json.loads(
                proc.stdout.strip().splitlines()[-1])})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"grid": results}), flush=True)


if __name__ == "__main__":
    main()

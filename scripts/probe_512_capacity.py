"""512² remat × per-chip-batch capacity probe (docs/PERF.md capacity table).

Runs the FULL CUT train step (steady phase, R1-cadence-aligned 16-step
windows — bench.py's methodology) for one (batch, remat) cell per process,
so each run's HBM high-water mark is clean:

    python scripts/probe_512_capacity.py <batch> <true|false>

Prints one JSON line: steady ms/step ×3 windows, img/s, peak HBM (where
the backend exposes memory_stats; the axon tunnel does not — there,
"fits" = runs without OOM).
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

batch = int(sys.argv[1])
remat = sys.argv[2] == "true"

from gan_variant_research_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from gan_variant_research_tpu.core.config import load_config
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

cfg = load_config(
    REPO / "gan_variant_research_tpu/configs/train_gan_cutpp_512.yaml")
cfg["batch_size"] = batch
cfg["model"]["generator"]["remat"] = remat
cfg["parallel"]["num_devices"] = 1
cfg["max_steps"] = 10**6

trainer = CUTTrainer(cfg)
state = trainer.init_state()

rng = np.random.default_rng(0)
sharding = trainer.mesh.batch_sharding(4)
batches = [
    jax.device_put(
        (rng.integers(0, 256, (batch, 512, 512, 3), dtype=np.uint8),
         rng.integers(0, 256, (batch, 512, 512, 3), dtype=np.uint8)),
        sharding,
    )
    for _ in range(2)
]
jax.block_until_ready(batches)

start = cfg["warmup_steps"] + 16  # steady phase, window starts on r1 cadence


def window(n=16):
    global state
    s, losses = state, None
    for k in range(2):  # warm the dispatch path, force completion
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + k)
    float(losses["g_loss"])
    t0 = time.perf_counter()
    for k in range(n):
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + k)
    float(losses["g_loss"])  # device-resident timing: fetch one scalar
    state = s
    return (time.perf_counter() - t0) / n


times = [window() for _ in range(3)]
stats = jax.devices()[0].memory_stats() or {}
print(json.dumps({
    "batch": batch, "remat": remat,
    "steady_ms_per_step": [round(1000 * t, 1) for t in times],
    "best_ms": round(1000 * min(times), 1),
    "img_per_s": round(batch / min(times), 1),
    "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
}))

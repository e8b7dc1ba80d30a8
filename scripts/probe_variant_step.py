"""Step-cost probe for the restored variant features (docs/PERF.md row).

Times the FULL CUT steady-phase step (bench.py methodology: device-staged
batches, R1-cadence-aligned 16-step windows, best-of) in two builds at the
same batch/resolution:

- baseline: the shipped flagship config;
- variants: self-attention (layers 3,7), channel attention (layer 5),
  style dropout, feature matching, Lab palette prior, and k-NN repulsion
  (random-weight inception embedder + a synthetic bank — weight VALUES
  don't change the cost, only the graph does).

Usage (one cell per process so the HBM high-water mark is clean):

    python scripts/probe_variant_step.py <batch> <baseline|variants|variants_repK>

variants_repK adds repulsion.every=K (the lazy embed cadence) on top of the
everything-on build; K must divide 16 so the measured window mean is the
amortized per-step cost.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

batch = int(sys.argv[1])
mode = sys.argv[2]
# variants_repK (e.g. variants_rep4): the everything-on build with the
# repulsion.every=K lazy cadence (VERDICT r4 #7). K must divide the 16-step
# window so every window holds exactly 16/K active embed steps and the
# measured mean IS the amortized per-step cost.
rep_every = 1
if mode.startswith("variants_rep"):
    rep_every = int(mode[len("variants_rep"):])
    assert 16 % rep_every == 0, "K must divide the 16-step window"
    mode = "variants"
assert mode in ("baseline", "variants")

from gan_variant_research_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from __graft_entry__ import _flagship_config
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

cfg = _flagship_config(image_size=256, batch_size=batch)
if mode == "variants":
    import tempfile

    from PIL import Image

    work = Path(tempfile.mkdtemp(prefix="variant_probe_"))
    monets = work / "monet"
    monets.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray(rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
                        ).save(monets / f"m{i:02d}.jpg", quality=95)
    g = cfg["model"]["generator"]
    g.update(use_attention=True, attn_layers=[3, 7],
             use_channel_attn=True, channel_attn_layers=[5],
             use_style_dropout=True)
    cfg["loss_weights"].update(featmatch=10.0, palette=2.0, repulsion=0.5)
    cfg["repulsion"] = {"enabled": True, "margin": 0.25, "every": rep_every}
    cfg["clip_features"] = {
        "backbone": "inception_pool3",
        "monet_feats_path": str(work / "bank.npz"),
        "build_on_first_run": True,
        "allow_random": True,  # cost probe: weight values are irrelevant
    }
    cfg["data"] = {"monet_dir": str(monets)}

trainer = CUTTrainer(cfg)
state = trainer.init_state()

rng = np.random.default_rng(1)
sharding = trainer.mesh.batch_sharding(4)
batches = [
    jax.device_put(
        (rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8),
         rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)),
        sharding,
    )
    for _ in range(2)
]
jax.block_until_ready(batches)

start = cfg["warmup_steps"] + 16  # steady phase, window starts on r1 cadence


def window(n=16):
    global state
    s, losses = state, None
    for k in range(2):
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + k)
    float(losses["g_loss"])
    t0 = time.perf_counter()
    for k in range(n):
        p, m = batches[k % 2]
        s, losses = trainer.train_step(s, p, m, step=start + k)
    float(losses["g_loss"])
    state = s
    return (time.perf_counter() - t0) / n


times = [window() for _ in range(3)]
stats = jax.devices()[0].memory_stats() or {}
print(json.dumps({
    "mode": mode if rep_every == 1 else f"variants_rep{rep_every}",
    "batch": batch,
    "steady_ms_per_step": [round(1000 * t, 1) for t in times],
    "best_ms": round(1000 * min(times), 1),
    "img_per_s": round(batch / min(times), 1),
    "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
}))

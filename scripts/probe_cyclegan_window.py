"""Probe: lax.scan windows for the CycleGAN step at the reference's regime.

The reference trains Basic_GAN at batch 1 (configs/baseline.yaml), where the
measured step is dispatch-bound (52.8 ms/step at 256² on one v5e vs ~30 ms
of compute — docs/PERF.md "CycleGAN step"). ``runtime.steps_per_call`` scans
K steps per dispatch (cyclegan_trainer.train_window); this times plain
stepping vs K=16 windows at batch 1 and 4, scalar-fetch timing
(block_until_ready is unreliable over the axon tunnel — docs/PERF.md).

Usage: python scripts/probe_cyclegan_window.py [--iters 48]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gan_variant_research_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from gan_variant_research_tpu.train.cyclegan_trainer import CycleGANTrainer


def config(batch: int, generator: str = "resnet") -> dict:
    return {
        "data": {"root": "unused", "domain_a": "a", "domain_b": "b",
                 "img_size": 256, "load_size": 286},
        "training": {"epochs": 200, "batch_size": batch, "amp": False,
                     "seed": 0, "save_dir": "unused", "log_dir": "unused",
                     "save_every": 10},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 100},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0,
                 "lambda_identity": 0.5},
        "model": {"ngf": 64, "ndf": 64, "n_blocks": 9, "n_layers": 3,
                  "spectral_norm_d": False, "generator": generator},
        "runtime": {"precision": "bf16"},
        "parallel": {"num_devices": 1},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--batches", type=str, default="1,4",
                    help="comma-separated batch sizes to sweep (the "
                         "reference regime is 1; larger values record the "
                         "throughput-mode rate)")
    ap.add_argument("--generator", type=str, default="resnet",
                    choices=("resnet", "unet"),
                    help="generator family (unet = the notebook-lineage "
                         "U-Net, GAN_baseline_Sujit.ipynb cell 4)")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    for batch in (int(b) for b in args.batches.split(",")):
        trainer = CycleGANTrainer(config(batch, args.generator),
                                  steps_per_epoch=10_000)
        state = trainer.init_state()
        a = jax.device_put(rng.integers(
            0, 256, (batch, 286, 286, 3), dtype=np.uint8))
        b = jax.device_put(rng.integers(
            0, 256, (batch, 286, 286, 3), dtype=np.uint8))
        k = args.window
        a_w = jnp.stack([a] * k)
        b_w = jnp.stack([b] * k)
        jax.block_until_ready((a_w, b_w))

        # plain stepping
        s, losses = state, None
        for _ in range(4):
            s, losses = trainer.train_step(s, a, b)
        float(losses["G"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, losses = trainer.train_step(s, a, b)
        float(losses["G"])
        plain_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # K-step scan windows
        s, lw = state, None
        s, lw = trainer.train_window(s, a_w, b_w)
        float(lw["G"][-1])
        t0 = time.perf_counter()
        for _ in range(max(1, args.iters // k)):
            s, lw = trainer.train_window(s, a_w, b_w)
        float(lw["G"][-1])
        win_ms = ((time.perf_counter() - t0)
                  / (max(1, args.iters // k) * k) * 1e3)

        print(json.dumps({
            "generator": args.generator,
            "batch": batch, "window": k,
            "plain_ms_per_step": round(plain_ms, 1),
            "window_ms_per_step": round(win_ms, 1),
            "speedup": round(plain_ms / win_ms, 2),
            "img_per_s_plain": round(batch / plain_ms * 1e3, 1),
            "img_per_s_window": round(batch / win_ms * 1e3, 1),
        }))


if __name__ == "__main__":
    main()

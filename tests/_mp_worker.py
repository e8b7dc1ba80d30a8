"""Subprocess worker for the multi-process DP tests (test_multiprocess_dp.py).

Runs `train_cut` as one process of an N-process `jax.distributed` job on the
CPU backend (each process gets its own virtual devices via
--xla_force_host_platform_device_count, set by the spawning test). With
N=1 it is the single-process control run over the same global device count —
the loss trajectories of both configurations must match step for step, which
is exactly the SURVEY §2.4/§5 "per-host data sharding" acceptance bar.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_config(data_dir: str, out_dir: str) -> dict:
    return {
        "image_size": 32,
        "batch_size": 8,
        "seed": 42,
        "warmup_steps": 3,  # identity anneal boundary inside the run
        "max_steps": 6,
        "grad_clip_g": 10.0,
        "grad_clip_d": 10.0,
        "data": {"photos_dir": f"{data_dir}/photos", "monet_dir": f"{data_dir}/monet"},
        "output": {"checkpoint_dir": f"{out_dir}/ckpt", "log_dir": f"{out_dir}/logs"},
        "optim": {
            "G": {"lr": 2e-4, "betas": [0.5, 0.999]},
            "D": {"lr": 2e-4, "betas": [0.5, 0.999]},
        },
        "loss_weights": {"adv": 1.0, "patchnce": 1.0,
                         "identity_warm": 0.1, "identity_final": 0.0},
        "model": {
            "generator": {"ngf": 4, "n_blocks": 2},
            "discriminator": {"ndf": 4, "n_layers": 2, "num_scales": 1},
        },
        "patchnce": {"num_patches": 16, "temperature": 0.07,
                     "nce_layers": [0, 4, 8, 12, 16]},
        "diffaugment": {"enable": True, "policy": ["color", "translation", "cutout"]},
        "r1": {"gamma": 10.0, "every": 2},  # R1 boundary inside the run
        "ema": {"decay": 0.999},
        "log": {"every_steps": 1, "verbose": False},
        "runtime": {"precision": "fp32"},
        "parallel": {},
    }


def build_cyclegan_config(data_dir: str, out_dir: str) -> dict:
    """Micro CycleGAN config: 8 images per domain at batch 8 → 1 step per
    epoch, so the loop's per-epoch JSON-lines metrics are per-step."""
    return {
        "data": {"root": data_dir, "domain_a": "photos", "domain_b": "monet",
                 "img_size": 24, "load_size": 28, "num_workers": 2},
        "training": {"epochs": 4, "batch_size": 8, "amp": False, "seed": 42,
                     "save_dir": f"{out_dir}/ckpt", "log_dir": f"{out_dir}/logs",
                     "save_every": 100},
        "optim": {"lr_g": 2e-4, "lr_d": 2e-4, "betas": [0.5, 0.999],
                  "lr_decay_after": 2},
        "loss": {"gan": "lsgan", "lambda_cycle": 10.0, "lambda_identity": 0.5},
        "model": {"ngf": 4, "ndf": 4, "n_blocks": 6, "n_layers": 2,
                  "spectral_norm_d": False, "generator": "resnet"},
        "runtime": {"precision": "fp32"},
        "parallel": {},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--stack", choices=["cut", "cyclegan"], default="cut")
    args = ap.parse_args()

    import faulthandler
    import os
    if os.environ.get("MP_WORKER_DUMP"):
        faulthandler.dump_traceback_later(90, repeat=True, exit=False)

    import jax

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes
        # Align processes right before the first device execution. XLA-CPU's
        # gloo collective-context init has a hard 30 s key-value timeout; on
        # a contended single-core CI host, import/compile skew between the
        # workers can exceed that. The coordination-service barrier rides
        # plain grpc with a long timeout, so post-barrier skew is only the
        # (identical) trainer-build work.
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "mp_worker_start", timeout_in_ms=600_000
        )
        # ...and establish the gloo communicator NOW, while the processes
        # are still aligned (a trivial global collective): the context init
        # happens on the first cross-process op, and if that op only came
        # after the skewed trainer-build/compile work, the 30 s window
        # could still be missed.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gloo_warmup")

    if args.stack == "cyclegan":
        from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan

        config = build_cyclegan_config(args.data, args.out)
        state, _ = train_cyclegan(config, max_steps_override=args.steps)
    else:
        config = build_config(args.data, args.out)
        config["max_steps"] = args.steps

        from gan_variant_research_tpu.train.loop import train_cut

        state, _ = train_cut(config, resume=args.resume)
    print(json.dumps({
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": len(jax.local_devices()),
        "final_step": int(state.step),
    }))
    print("WORKER_DONE", flush=True)


if __name__ == "__main__":
    main()

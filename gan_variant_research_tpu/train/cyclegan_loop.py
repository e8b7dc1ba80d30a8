"""CycleGAN baseline training loop (Basic_GAN/src/train.py:33-137 behavior):
epoch loop, per-epoch LR decay (inside the step's schedule), checkpoint dict
every ``save_every`` epochs. Unpaired sampling: domain A drives the epoch
length max(|A|, |B|) (src/data.py:52-62); both domains stream as
independently reshuffled epochs."""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from gan_variant_research_tpu.data.loader import UnpairedLoader
from gan_variant_research_tpu.train.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from gan_variant_research_tpu.train.cyclegan_trainer import CycleGANTrainer
from gan_variant_research_tpu.train.loss_tracker import Averager


def train_cyclegan(config: dict, max_steps_override: int | None = None,
                   resume: str | None = None):
    import jax

    from gan_variant_research_tpu.data.loader import make_source
    from gan_variant_research_tpu.parallel.mesh import process_batch_bounds

    data_cfg = config["data"]
    t_cfg = config["training"]
    root = Path(data_cfg["root"])
    # count through make_source, not list_images: the domains may be
    # TFRecord shards (data/tfrecord.py), where an image glob returns 0 and
    # would silently truncate training to zero steps. Built ONCE and handed
    # to the loader below — a TFRecord source indexes every shard at
    # construction, and the loader's own make_source passes prebuilt
    # sources through.
    load_size = data_cfg.get("load_size", 286)
    source_a = make_source(root / data_cfg["domain_a"], load_size)
    source_b = make_source(root / data_cfg["domain_b"], load_size)
    steps_per_epoch = max(len(source_a), len(source_b)) // t_cfg["batch_size"]
    trainer = CycleGANTrainer(config, steps_per_epoch=steps_per_epoch)

    # resolve the resume point BEFORE building the loader so the index
    # streams fast-forward to exactly the batches the uninterrupted run
    # would consume (same deterministic-resume contract as the CUT loop;
    # the reference's Basic_GAN has no resume at all, src/train.py)
    start_step = 0
    resume_blob = None
    if resume:
        path = (latest_checkpoint(Path(t_cfg["save_dir"]))
                if resume == "auto" else resume)
        if resume == "auto" and path is None:
            print("No checkpoint found for auto-resume; starting fresh")
        elif path is not None:
            resume_blob = load_checkpoint(path)
            start_step = resume_blob["step"]
            print(f"Resuming from step {start_step} ({path})")
    # all hosts must agree on the resume point (same contract as the CUT
    # loop — see parallel/mesh.py::assert_agreement_across_processes)
    from gan_variant_research_tpu.parallel.mesh import (
        assert_agreement_across_processes,
    )

    assert_agreement_across_processes(start_step, "resume start_step")

    loader = UnpairedLoader(
        source_a,
        source_b,
        batch_size=t_cfg["batch_size"],
        size=data_cfg.get("load_size", 286),
        seed=t_cfg.get("seed", 0),
        num_workers=data_cfg.get("num_workers", 4),
        start_step=start_step,
        # same staging + per-host slicing as the CUT loop (train/loop.py)
        device_sharding=trainer.mesh.batch_sharding(4),
        process_bounds=process_batch_bounds(trainer.mesh, t_cfg["batch_size"]),
    )
    state = (trainer.state_from_payload(resume_blob["payload"], start_step)
             if resume_blob is not None else trainer.init_state())

    is_main = jax.process_index() == 0
    save_dir = Path(t_cfg["save_dir"])
    # per-epoch machine-readable metrics (the reference's Basic_GAN only
    # prints to stdout, src/train.py:118-123; the JSON-lines sink mirrors the
    # CUT loop's train_log.txt contract)
    log_path = (Path(t_cfg["log_dir"]) / "cyclegan_log.jsonl"
                if t_cfg.get("log_dir") else None)
    if is_main:
        save_dir.mkdir(parents=True, exist_ok=True)
        if log_path:
            log_path.parent.mkdir(parents=True, exist_ok=True)
            if start_step == 0:
                log_path.write_text("")  # fresh run truncates; resume appends

    total_epochs = t_cfg["epochs"]
    max_steps = max_steps_override or t_cfg.get("max_steps") or (
        total_epochs * steps_per_epoch
    )
    save_every = t_cfg.get("save_every", 10)
    # epoch checkpoints overlap training (training.async_save, default on);
    # the last save is flushed before the loop returns
    ckpt_writer = (AsyncCheckpointer()
                   if is_main and t_cfg.get("async_save", True) else None)
    averager = Averager()

    # >1 → lax.scan windows (one dispatch per K steps; see
    # CycleGANTrainer.train_window). Windows are clamped so they never
    # cross an epoch boundary — every per-epoch bookkeeping below runs at a
    # point where `state` matches the completed-step count exactly.
    runtime_cfg = config.get("runtime") or {}
    steps_per_call = int(runtime_cfg.get("steps_per_call", 1))
    if steps_per_call > 1 and jax.process_count() > 1:
        # window stacking needs fully-addressable arrays (same limitation
        # as the CUT loop, train/loop.py) — and the amortization is worth
        # ~0 on a pod where dispatch runs ahead anyway
        print("runtime.steps_per_call>1 is single-host only; using 1")
        steps_per_call = 1

    step = start_step
    t0 = time.perf_counter()
    try:
        while step < max_steps:
            to_boundary = steps_per_epoch - (step % max(1, steps_per_epoch))
            k_win = max(1, min(steps_per_call, to_boundary, max_steps - step))
            if k_win > 1:
                import jax.numpy as jnp

                window = [next(loader) for _ in range(k_win)]
                a_w = jnp.stack([b[0] for b in window])
                b_w = jnp.stack([b[1] for b in window])
                state, losses_w = trainer.train_window(state, a_w, b_w)
                host_w = {kk: np.asarray(v) for kk, v in losses_w.items()}
                for i in range(k_win):
                    averager.add({kk: float(v[i]) for kk, v in host_w.items()})
            else:
                a_u8, b_u8 = next(loader)
                state, losses = trainer.train_step(state, a_u8, b_u8)
                averager.add({k: float(v) for k, v in losses.items()})
            step += k_win

            if step % steps_per_epoch == 0 or step == max_steps:
                epoch = step // max(1, steps_per_epoch)
                avg = averager.averages()
                rate = ((step - start_step) * t_cfg["batch_size"]
                        / (time.perf_counter() - t0))
                if is_main:
                    print(
                        f"Epoch {epoch}/{total_epochs} "
                        + " | ".join(f"{k}: {v:.3f}" for k, v in avg.items())
                        + f" | {rate:.1f} img/s"
                    )
                    if log_path:
                        import json

                        with open(log_path, "a") as f:
                            f.write(json.dumps(
                                {"epoch": epoch, "step": step, **avg,
                                 "images_per_sec": rate}) + "\n")
                averager.clear()
                if any(not np.isfinite(v) for v in avg.values()):
                    raise ValueError(f"NaN loss at epoch {epoch}: {avg}")
                if (epoch % save_every == 0 or step == max_steps) and is_main:
                    path = save_dir / f"ckpt_e{epoch}.msgpack"
                    if ckpt_writer is not None:
                        ckpt_writer.save(
                            path, int(state.step),
                            trainer.checkpoint_payload(state),
                            config=config, metrics={"epoch": epoch},
                            on_done=lambda p: print(f"Saved checkpoint to {p}"),
                            # donated buffers die at the next step
                            snapshot=trainer.donate,
                        )
                    else:
                        save_checkpoint(
                            path, int(state.step),
                            trainer.checkpoint_payload(state),
                            config=config, metrics={"epoch": epoch},
                        )
                        print(f"Saved checkpoint to {path}")
        if ckpt_writer is not None:
            ckpt_writer.wait()  # surface any pending write error on success
    finally:
        if ckpt_writer is not None:
            try:
                ckpt_writer.close()
            except Exception:
                pass  # success path already surfaced this via wait()
        loader.close()
    return state, trainer

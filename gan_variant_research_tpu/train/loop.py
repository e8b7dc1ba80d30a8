"""CUT training loop — behavior of train_cutpp.main() (train_cutpp.py:340-498).

Flow: config → seed → dirs → tracker → loaders → trainer → (resume) →
step loop with per-step CSV logging, per-N-step averaged JSON lines,
periodic checkpoints, a fail-fast NaN tripwire, final checkpoint + loss
plot. TPU-specific behavior:

- loss scalars are fetched with a one-step delay so the host never blocks
  the device pipeline (the reference calls .item() every step, forcing a
  sync, train_cutpp.py:315-329);
- ``--resume auto`` scans the checkpoint dir for the newest checkpoint
  (preemptible-VM recovery, SURVEY.md §5 "Failure detection");
- the JSON log line gains images/sec and step-time fields.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from gan_variant_research_tpu.data.loader import UnpairedLoader
from gan_variant_research_tpu.train.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer
from gan_variant_research_tpu.train.loss_tracker import Averager, LossTracker
from gan_variant_research_tpu.train.plotting import plot_training_losses


def resolve_ckpt_every(config: dict) -> int:
    """Checkpoint cadence in steps.

    The reference reads ``metrics.save_checkpoint_every`` (train_cutpp.py:464)
    and ships a dead ``checkpoint.every_steps`` key in the same YAML
    (train_gan_cutpp.yaml:107,118 — SURVEY §2.6-3's silent-drift class). We
    honor either, but a user who sets one must not be silently overridden by
    the other's YAML default: if both are present and disagree, fail loudly.
    """
    m = (config.get("metrics") or {}).get("save_checkpoint_every")
    c = (config.get("checkpoint") or {}).get("every_steps")
    if m is not None and c is not None and int(m) != int(c):
        raise ValueError(
            f"metrics.save_checkpoint_every={m} and checkpoint.every_steps={c} "
            "disagree. They are aliases for the checkpoint cadence (the "
            "reference reads metrics.save_checkpoint_every and ignores "
            "checkpoint.every_steps); set both to the same value or drop one "
            "from the config."
        )
    value = m if m is not None else c
    every = int(value) if value is not None else 2000
    # 0 = periodic checkpoints disabled (the final checkpoint still writes)
    return every


def _check_finite(step: int, losses: dict):
    bad = {k: v for k, v in losses.items()
           if k != "identity_weight" and not np.isfinite(v)}
    if bad:
        raise ValueError(
            f"NaN loss detected at step {step}: {losses}. "
            "Training stopped to prevent corruption."
        )


def train_cut(config: dict, resume: str | None = None, max_steps_override: int | None = None):
    """Run CUT training; returns (final state, trainer)."""
    from gan_variant_research_tpu.parallel.mesh import process_batch_bounds

    out_cfg = config["output"]
    ckpt_dir = Path(out_cfg["checkpoint_dir"])
    log_dir = Path(out_cfg["log_dir"])
    # in a multi-process run only process 0 touches the filesystem (logs,
    # checkpoints, plots); every process computes the identical replicated
    # state, so nothing is lost
    is_main = jax.process_index() == 0
    if is_main:
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        log_dir.mkdir(parents=True, exist_ok=True)

    tracker = LossTracker(log_dir).start() if is_main else None
    averager = Averager()

    trainer = CUTTrainer(config)

    # Inline training-time metrics + early stopping (the reference's deleted
    # metrics/ layer — train/inline_metrics.py). Off by default; single-host
    # only (pods evaluate offline through the EVAL suite).
    metrics_cfg = config.get("metrics") or {}
    inline_eval = None
    early = None
    if metrics_cfg.get("compute_fid") or metrics_cfg.get("compute_clip_distance"):
        if jax.process_count() > 1:
            print("Inline metrics are single-host only; skipping "
                  "(use the EVAL suite offline)")
        else:
            from gan_variant_research_tpu.train.inline_metrics import (
                EarlyStoppingTracker,
                InlineEvaluator,
            )

            # validate BEFORE the (weight-loading) evaluator so a config
            # typo fails in milliseconds
            early = EarlyStoppingTracker.from_config(
                config.get("early_stop") or {})
            inline_eval = InlineEvaluator(config)

    # resolve the resume point BEFORE building the loader: the index streams
    # are fast-forwarded by start_step so the resumed run consumes exactly
    # the batches the uninterrupted run would have (deterministic resume —
    # the reference loses iterator position, train_cutpp.py:392-397)
    start_step = 0
    resume_blob = None
    if resume:
        path = latest_checkpoint(ckpt_dir) if resume == "auto" else resume
        if resume == "auto" and path is None:
            print("No checkpoint found for auto-resume; starting fresh")
        elif path is not None:
            resume_blob = load_checkpoint(path)
            start_step = resume_blob["step"]
            print(f"Resuming from step {start_step} ({path})")
    # all hosts must agree on the resume point, or the pod silently diverges
    # (different loader fast-forwards / step variants) and hangs at exit
    from gan_variant_research_tpu.parallel.mesh import (
        assert_agreement_across_processes,
    )

    assert_agreement_across_processes(start_step, "resume start_step")

    io_cfg = config.get("io") or {}
    # data.use_tfrec switches to the Kaggle TFRecord shards — the reference
    # declares photos_tfrec/monet_tfrec (train_gan_cutpp.yaml:11-12) but its
    # reader is vestigial (photos_dataset.py:93-102); here they work
    # (data/tfrecord.py)
    data_cfg = config["data"]
    if data_cfg.get("use_tfrec"):
        photos_path, monet_path = data_cfg["photos_tfrec"], data_cfg["monet_tfrec"]
    else:
        photos_path, monet_path = data_cfg["photos_dir"], data_cfg["monet_dir"]
    loader = UnpairedLoader(
        photos_path,
        monet_path,
        batch_size=config["batch_size"],
        size=config["image_size"],
        seed=config.get("seed", 42),
        num_workers=io_cfg.get("num_workers", config.get("num_workers", 8)),
        prefetch=config.get("prefetch_factor", 4),
        # stage batches on device from the prefetch thread: the H2D copy
        # overlaps compute instead of serializing inside the jit dispatch
        device_sharding=trainer.mesh.batch_sharding(4),
        # each process decodes only its slice of the global batch
        process_bounds=process_batch_bounds(trainer.mesh, config["batch_size"]),
        start_step=start_step,
    )
    if is_main:
        print(f"Photos: {loader.num_photos}, Monet: {loader.num_monets}")

    if resume_blob is not None:
        state = trainer.state_from_payload(resume_blob["payload"],
                                           resume_blob["step"])
    else:
        state = trainer.init_state()
    n_g = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(state.g_params))
    if is_main:
        print(f"Generator parameters: {int(n_g):,}")

    max_steps = max_steps_override or config.get("max_steps")
    if not max_steps:
        # reference derives steps from the photos loader alone
        # (train_cutpp.py:400-402)
        steps_per_epoch = loader.num_photos // config["batch_size"]
        max_steps = config.get("epochs", 70) * steps_per_epoch
    print(f"Training for {max_steps} steps")

    log_every = (config.get("log") or {}).get("every_steps", config.get("log_every", 100))
    ckpt_every = resolve_ckpt_every(config)
    ckpt_cfg = config.get("checkpoint") or {}
    keep_last_n = ckpt_cfg.get("keep_last_n", 5)
    # periodic saves overlap training by default (checkpoint.async_save);
    # the final checkpoint is always written synchronously
    ckpt_writer = (AsyncCheckpointer()
                   if is_main and ckpt_cfg.get("async_save", True) else None)

    pending: list[tuple[int, dict]] = []  # one-step-delayed loss fetch
    step = start_step
    t_window = time.perf_counter()
    imgs_in_window = 0
    # >1 → lax.scan K steps per dispatch (amortizes host/tunnel dispatch
    # latency; exactly equivalent to K single steps)
    runtime_cfg = config.get("runtime") or {}
    steps_per_call = int(runtime_cfg.get("steps_per_call", 1))
    if steps_per_call > 1 and jax.process_count() > 1:
        # the window path stacks K batches with a host-side jnp.stack, which
        # requires fully-addressable arrays — not true of multi-host global
        # batches. The window is a dispatch-latency amortization (worth ~0 on
        # a pod where steps are dispatched ahead anyway), so fall back.
        print("runtime.steps_per_call>1 is single-host only; using 1")
        steps_per_call = 1
    if steps_per_call > 1:
        # state exists only at window boundaries, so every state-dependent
        # cadence must land on one — otherwise a checkpoint labeled step s
        # would silently contain state up to K-1 steps further along
        for name, every in (("log cadence", log_every),
                            ("checkpoint cadence", ckpt_every),
                            ("inline-metrics cadence",
                             inline_eval.eval_every if inline_eval else 0)):
            if every and every % steps_per_call:
                raise ValueError(
                    f"runtime.steps_per_call={steps_per_call} requires the "
                    f"{name} ({every}) to be a multiple of it — bookkeeping "
                    "runs at window boundaries where the state matches its "
                    "label exactly")
    # capture a jax.profiler trace of steps [10, 20) when configured
    profile_dir = runtime_cfg.get("profile_dir")
    profile_span = (start_step + 10, start_step + 20)
    profiling = False

    def drain(entry):
        s, device_losses = entry
        host = {k: float(v) for k, v in device_losses.items()}
        _check_finite(s, host)
        if tracker is not None:
            tracker.log(s, host["d_loss"], host["g_loss"])
        averager.add(host)

    stop_early = False

    last_tick = start_step  # completed-step count at the last log boundary

    def per_step_bookkeeping(s: int):
        nonlocal t_window, imgs_in_window, stop_early, last_tick
        if log_every and s % log_every == 0 and s > 0:
            avg = averager.averages()
            dt = time.perf_counter() - t_window
            if dt > 0:
                avg["images_per_sec"] = imgs_in_window / dt
                # steps actually executed since the last boundary — after a
                # mid-cadence resume the first window is shorter than
                # log_every and dividing by the cadence would misreport it
                avg["step_time_ms"] = 1000.0 * dt / max(1, s - last_tick)
            last_tick = s
            if tracker is not None:
                tracker.log_json_line(s, avg)
            if is_main and (config.get("log") or {}).get("verbose", True):
                print(f"Step {s}: " + " | ".join(
                    f"{k}: {v:.4f}" for k, v in avg.items()))
            averager.clear()
            t_window = time.perf_counter()
            imgs_in_window = 0
        # s == max_steps is excluded: the loop writes ckpt_final with this
        # exact state right after exiting, so the periodic save would be an
        # immediate duplicate full-state serialization whenever max_steps is
        # a multiple of the cadence (the shipped config's common case)
        if (ckpt_every and s % ckpt_every == 0 and s > 0 and s != max_steps
                and is_main):
            path = ckpt_dir / f"ckpt_step{s}.msgpack"
            if ckpt_writer is not None:
                # state arrays are immutable — capture by reference, write in
                # the background; the "Saved" line prints once durable
                ckpt_writer.save(
                    path, int(state.step), trainer.checkpoint_payload(state),
                    config=config, keep_last_n=keep_last_n,
                    on_done=lambda p: print(f"\nSaved checkpoint to {p}"),
                    # under donation the next step frees these buffers —
                    # fetch to host before dispatching it
                    snapshot=trainer.donate,
                )
            else:
                save_checkpoint(
                    path, int(state.step), trainer.checkpoint_payload(state),
                    config=config, keep_last_n=keep_last_n,
                )
                print(f"\nSaved checkpoint to {path}")
        if (inline_eval is not None and inline_eval.eval_every and s > 0
                and s % inline_eval.eval_every == 0):
            from gan_variant_research_tpu.train.inline_metrics import (
                append_metrics_line,
            )

            m = inline_eval.evaluate(trainer, state)
            append_metrics_line(log_dir, s, m)
            print(f"[metrics] step {s}: " + " | ".join(
                f"{k}: {v:.4f}" for k, v in m.items()))
            if early is not None and early.update(**m):
                print(f"Early stopping at step {s}: {early.reason}")
                stop_early = True

    try:
        while step < max_steps and not stop_early:
            if profile_dir and not profiling and step >= profile_span[0]:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            # clamp to the K grid as well as the horizon: a resume from an
            # off-grid step (ckpt_final at an arbitrary max_steps, then
            # extended) would otherwise shift every window label off the
            # cadence grid and silently skip all remaining checkpoints/logs;
            # one short first window realigns it
            k = min(steps_per_call, max_steps - step,
                    steps_per_call - step % steps_per_call)
            if k > 1:
                import jax.numpy as jnp

                stacked = [next(loader) for _ in range(k)]
                # batches are already device-resident; stack on device
                photos_w = jnp.stack([b[0] for b in stacked])
                monets_w = jnp.stack([b[1] for b in stacked])
                state, losses_w = trainer.train_window(state, photos_w, monets_w, step)
                for i in range(k):
                    pending.append(
                        (step + i,
                         jax.tree_util.tree_map(lambda x, i=i: x[i], losses_w))
                    )
            else:
                photos_u8, monets_u8 = next(loader)
                state, losses = trainer.train_step(state, photos_u8, monets_u8,
                                                   step=step)
                pending.append((step, losses))
            imgs_in_window += config["batch_size"] * k
            while len(pending) > 1:
                drain(pending.pop(0))
            # bookkeeping labels carry the COMPLETED-step count, which equals
            # state.step here — in both modes, so a checkpoint named
            # ckpt_step{s} stores exactly step s (the single-step path used to
            # label with the pre-increment loop index, storing s+1 under a
            # filename claiming s, and checkpointed one step later than the
            # window path for the same cadence)
            per_step_bookkeeping(step + k)
            step += k
            if profiling and step >= profile_span[1]:
                jax.profiler.stop_trace()
                print(f"Saved profiler trace to {profile_dir}")
                profile_dir = None  # capture once
                profiling = False

        while pending:
            drain(pending.pop(0))

        if is_main:
            if ckpt_writer is not None:
                ckpt_writer.wait()  # surface any pending write error here
            final = ckpt_dir / "ckpt_final.msgpack"
            save_checkpoint(final, int(state.step),
                            trainer.checkpoint_payload(state), config=config)
            print(f"\nTraining complete. Final checkpoint: {final}")
    finally:
        if profiling:
            jax.profiler.stop_trace()
        if ckpt_writer is not None:
            try:
                ckpt_writer.close()  # flush pending write on every exit path
            except Exception:
                # success paths already surfaced this via wait(); don't mask
                # an in-flight training exception with the write error
                pass
        if tracker is not None:
            tracker.close()
        loader.close()

    if tracker is not None:
        history = tracker.load_history()
        if history["steps"]:
            plot_training_losses(
                log_dir, history["steps"], history["d_losses"], history["g_losses"]
            )
    return state, trainer

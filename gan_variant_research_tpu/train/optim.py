"""Optimizer and schedule factories (optax).

Equivalent of the reference's optimizer setup
(GAN_Variant1/training/sched_optim.py:5-47, Basic_GAN/src/train.py:45-57):
Adam(lr 2e-4, betas (0.5, 0.999), wd 0) per network with global-norm grad
clipping (the AMP unscale-clip path, utils/amp_utils.py:29-41, becomes a
plain optax.clip_by_global_norm under bf16 — no loss scaling on TPU).

Schedules: the reference YAML declares a cosine schedule it never wires
(SURVEY.md §2.6 item 2) — here ``scheduler.enabled`` actually controls it.
The CycleGAN linear decay (epoch 100→200, Basic_GAN/src/train.py:27-31) and
linear warmup+decay (sched_optim.py:31-47) are provided as optax schedules.
"""

from __future__ import annotations

import optax


def make_optimizer(
    lr: float = 2e-4,
    betas: tuple[float, float] = (0.5, 0.999),
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    schedule=None,
) -> optax.GradientTransformation:
    """Adam chain: clip-by-global-norm → adam(schedule or constant lr)."""
    lr_or_schedule = schedule if schedule is not None else lr
    if weight_decay and weight_decay > 0:
        opt = optax.adamw(
            lr_or_schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay
        )
    else:
        opt = optax.adam(lr_or_schedule, b1=betas[0], b2=betas[1])
    if grad_clip is not None and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def cosine_schedule(lr: float, lr_min: float, total_steps: int):
    return optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(1, total_steps), alpha=lr_min / lr
    )


def linear_decay_after(lr: float, start_decay_step: int, total_steps: int):
    """Constant then linear decay to 0 — the CycleGAN LambdaLR rule
    (Basic_GAN/src/train.py:27-31), expressed in steps."""

    def schedule(count):
        import jax.numpy as jnp

        frac = (count - start_decay_step) / max(1, total_steps - start_decay_step)
        factor = jnp.clip(1.0 - frac, 0.0, 1.0)
        return lr * jnp.where(count < start_decay_step, 1.0, factor)

    return schedule


def linear_warmup_decay(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup then linear decay to 0 (sched_optim.py:31-47)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, max(1, warmup_steps)),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup_steps)),
        ],
        boundaries=[warmup_steps],
    )


def optimizer_from_config(opt_cfg: dict, grad_clip: float | None, max_steps: int | None):
    """Build an optimizer from a reference-shaped optim config block
    (configs/train_gan_cutpp.yaml:18-33)."""
    lr = float(opt_cfg.get("lr", 2e-4))
    betas = tuple(opt_cfg.get("betas", [0.5, 0.999]))
    wd = float(opt_cfg.get("weight_decay", 0.0))
    sched_cfg = opt_cfg.get("scheduler") or {}
    schedule = None
    if sched_cfg.get("enabled", False):
        kind = sched_cfg.get("type", "cosine")
        if kind == "cosine":
            if not max_steps:
                raise ValueError("cosine scheduler requires max_steps")
            schedule = cosine_schedule(lr, float(sched_cfg.get("lr_min", 0.0)), max_steps)
        else:
            raise ValueError(f"Unknown scheduler type: {kind!r}")
    return make_optimizer(lr, betas, wd, grad_clip, schedule)

"""Adversarial losses on raw logit maps.

- Hinge (CUT lineage): GAN_Variant1/losses/adv_hinge.py:6-62 — per scale,
  D: 0.5·(mean relu(1−D(real)) + mean relu(1+D(fake))); G: −mean D(fake);
  averaged over scales; accepts a single map or a list (multiscale).
- LSGAN / BCE (CycleGAN lineage): Basic_GAN/src/losses.py:5-24 — MSE or
  sigmoid-CE against all-ones / all-zeros targets.

Losses are reduced in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_list(preds):
    return preds if isinstance(preds, (list, tuple)) else [preds]


def discriminator_hinge_loss(real_preds, fake_preds) -> jnp.ndarray:
    real_preds, fake_preds = _as_list(real_preds), _as_list(fake_preds)
    loss = 0.0
    for real, fake in zip(real_preds, fake_preds):
        real = real.astype(jnp.float32)
        fake = fake.astype(jnp.float32)
        loss_real = jnp.mean(jax.nn.relu(1.0 - real))
        loss_fake = jnp.mean(jax.nn.relu(1.0 + fake))
        loss += (loss_real + loss_fake) * 0.5
    return loss / len(real_preds)


def generator_hinge_loss(fake_preds) -> jnp.ndarray:
    fake_preds = _as_list(fake_preds)
    loss = 0.0
    for fake in fake_preds:
        loss += -jnp.mean(fake.astype(jnp.float32))
    return loss / len(fake_preds)


def gan_loss(pred, is_real: bool, mode: str = "lsgan") -> jnp.ndarray:
    """LSGAN (MSE) or BCE-with-logits against constant targets, averaged
    over scales when given a list."""
    preds = _as_list(pred)
    total = 0.0
    for p in preds:
        p = p.astype(jnp.float32)
        target = jnp.ones_like(p) if is_real else jnp.zeros_like(p)
        if mode == "lsgan":
            total += jnp.mean(jnp.square(p - target))
        elif mode == "bce":
            # sigmoid cross-entropy with logits
            total += jnp.mean(
                jnp.maximum(p, 0.0) - p * target + jnp.log1p(jnp.exp(-jnp.abs(p)))
            )
        else:
            raise ValueError(f"Unknown gan mode: {mode!r}")
    return total / len(preds)

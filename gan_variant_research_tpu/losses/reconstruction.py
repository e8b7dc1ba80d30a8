"""L1 reconstruction losses: identity and cycle.

- identity (CUT lineage): L1(G(monet), monet) forced to fp32
  (GAN_Variant1/losses/identity_l1.py:6-22 — the fp32 island survives the
  bf16 policy; weight is annealed by the trainer, train_cutpp.py:224-228).
- cycle / identity (CycleGAN lineage): λ·L1 (Basic_GAN/src/losses.py:27-30).
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def identity_loss(reconstructed: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """fp32 L1; the caller must run the generator forward in fp32 too to
    preserve the reference's autocast(enabled=False) island."""
    return l1_loss(reconstructed, target)


def cycle_loss(reconstructed: jnp.ndarray, source: jnp.ndarray, lam: float) -> jnp.ndarray:
    return lam * l1_loss(reconstructed, source)

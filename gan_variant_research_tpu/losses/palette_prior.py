"""Palette-prior loss: match low-frequency Lab color statistics.

The reference's ``losses/palette_prior_lab.py`` ("Palette prior loss (Lab
color statistics)") was deleted in the baseline reversion
(Documentation/BASELINE_REVERSION.md §1); what survives in the tree are its
building blocks — ``rgb_to_lab`` and ``get_low_freq_stats``
(GAN_Variant1/dataio/transforms.py:89-141), both already ported to
``ops/color.py`` — and the dead ``loss_weights.palette`` config key. This is
the working re-design built from exactly those surviving pieces:

    loss = ‖E_b[μ_Lab(fake_b)] − E_b[μ_Lab(target_b)]‖₁
         + ‖E_b[σ_Lab(fake_b)] − E_b[σ_Lab(target_b)]‖₁

where μ/σ are the per-image low-frequency Lab stats (adaptive-avg-pool to
32², then channel mean/std) and the expectation is over the batch. The
target-domain batch (Monets) is stop-gradiented: the prior pulls the
generator's *palette* toward the target distribution without prescribing
content. Everything is a handful of reductions on tensors already resident
on device — negligible step cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_variant_research_tpu.ops.color import (
    denormalize,
    get_low_freq_stats,
    rgb_to_lab,
)


def lab_stats(images: jnp.ndarray, target_size: int = 32):
    """Batch-mean low-frequency Lab (mean, std), each (3,). ``images`` are
    NHWC in [−1, 1] (the training convention)."""
    lab = rgb_to_lab(denormalize(images.astype(jnp.float32)))
    mean, std = get_low_freq_stats(lab, target_size=target_size, eps=1e-12)
    return mean.mean(axis=0), std.mean(axis=0)


def palette_prior_loss(
    fake: jnp.ndarray,
    target: jnp.ndarray,
    target_size: int = 32,
) -> jnp.ndarray:
    """L1 distance between the batch-mean Lab palette stats of generated
    images and of a target-domain batch (gradient flows into ``fake`` only).
    """
    f_mean, f_std = lab_stats(fake, target_size)
    t_mean, t_std = lab_stats(jax.lax.stop_gradient(target), target_size)
    return jnp.sum(jnp.abs(f_mean - t_mean)) + jnp.sum(jnp.abs(f_std - t_std))

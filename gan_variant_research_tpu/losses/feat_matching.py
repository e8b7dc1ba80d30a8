"""Feature-matching loss on discriminator intermediate features.

The reference's ``losses/feat_matching.py`` ("Feature matching loss for
stability") was deleted in the baseline reversion
(Documentation/BASELINE_REVERSION.md §1) — only its consumer hook survives:
``get_intermediate_features`` on the PatchGAN discriminator
(GAN_Variant1/models/discriminator_patchgan.py:60-71), documented as
"(unused) feature matching" (SURVEY.md §2.1). This is the working re-design:
the standard pix2pixHD-style formulation (Wang et al. 2018) — mean L1
between the discriminator's per-layer activations on fake vs real images,
averaged over layers and scales, with the real-side features treated as
constants so the gradient flows only through the generator.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def feature_matching_loss(
    real_feats: Sequence[Sequence[jnp.ndarray]] | Sequence[jnp.ndarray],
    fake_feats: Sequence[Sequence[jnp.ndarray]] | Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Mean-L1 feature matching, averaged over layers (and scales).

    Accepts either one discriminator's feature list or the multiscale
    nested lists from ``MultiscaleDiscriminator(extract_features=True)``.
    Real-side features are stop-gradiented here, so callers can pass them
    straight from a differentiable forward.
    """

    def flatten(fs):
        out = []
        for f in fs:
            if isinstance(f, (list, tuple)):
                out.extend(flatten(f))
            else:
                out.append(f)
        return out

    real_flat = flatten(real_feats)
    fake_flat = flatten(fake_feats)
    if len(real_flat) != len(fake_flat):
        raise ValueError(
            f"feature list length mismatch: {len(real_flat)} vs {len(fake_flat)}"
        )
    total = jnp.zeros((), jnp.float32)
    for r, f in zip(real_flat, fake_flat):
        r = jax.lax.stop_gradient(r).astype(jnp.float32)
        total = total + jnp.mean(jnp.abs(f.astype(jnp.float32) - r))
    return total / max(len(real_flat), 1)

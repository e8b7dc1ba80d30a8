"""k-NN repulsion loss: feature-space anti-memorization.

The reference's ``losses/repulsion_knn.py`` ("k-NN repulsion loss
(CLIP-based anti-memorization)") was deleted in the baseline reversion
(Documentation/BASELINE_REVERSION.md §1). What survives in its tree is the
consumer surface: the ``clip_features`` config block (backbone,
``monet_feats_path`` feature bank, ``margin_path``,
``build_on_first_run`` — configs/train_gan_cutpp.yaml:132-137), the dead
``loss_weights.repulsion`` key, the ``repulsion.enabled`` gate, and the
early-stop ``dmin_drop_threshold`` that monitors the same quantity
(memorization = the min distance to the training set collapsing).

This is the working re-design. Semantics: embed generated images with a
frozen pretrained feature net, find each fake's nearest neighbor in a
precomputed bank of target-domain (Monet) features under cosine distance
(the CLIP-space metric, and the same |cos| geometry MiFID's memorization
penalty uses — EVAL/eval/mifid.py), and hinge-penalize fakes that sit
closer than a margin:

    d_min_i = 1 − max_j cos(f_i, bank_j)
    loss    = mean_i relu(margin − d_min_i)

The gradient pushes memorized fakes radially away from their nearest
training image while leaving fakes beyond the margin untouched.

TPU-native divergence (documented): the backbone is pluggable and defaults
to the in-tree InceptionV3 pool3 (evalsuite/inception.py) rather than CLIP
ViT-B/32 — CLIP weights are not reachable in this environment, and pool3
is the exact space MiFID's memorization term is scored in, making the
repulsion target the same metric the Kaggle evaluation penalizes. The
distance computation is one (B,D)×(D,N) matmul on normalized embeddings —
MXU-shaped, no per-sample loops.

A second documented-divergence knob, ``repulsion.every`` (default 1), lets
the embed ride a lazy cadence: every K-th step computes the embed + hinge
with the penalty scaled ×K (the amortized-gradient scheme lazy R1 uses),
compiled as a ``lax.cond`` so off steps skip the embed FLOPs at runtime.
See train/cut_trainer.py and docs/PERF.md for the measured cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_rows(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """L2-normalize along the last axis (fp32 accumulation)."""
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def min_cosine_distances(
    embeds: jnp.ndarray,
    bank: jnp.ndarray,
    bank_normalized: bool = False,
) -> jnp.ndarray:
    """Per-row min cosine distance from ``embeds`` (B,D) to ``bank`` (N,D).

    The bank is treated as a constant (stop-gradient): repulsion moves the
    generator, never the reference features. Pass ``bank_normalized=True``
    when the bank rows were L2-normalized once at load time (the trainer
    does this) so the per-step work is only the B embedding rows, not the
    whole bank. Returns (B,) in [0, 2].
    """
    e = normalize_rows(embeds)
    b = jax.lax.stop_gradient(bank)
    if not bank_normalized:
        b = normalize_rows(b)
    sims = e @ b.T                       # (B, N), one MXU matmul
    return 1.0 - jnp.max(sims, axis=-1)


def repulsion_loss(
    embeds: jnp.ndarray,
    bank: jnp.ndarray,
    margin: float,
    bank_normalized: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hinge repulsion from the nearest bank neighbor.

    Returns ``(loss, d_min)``: the scalar mean hinge and the per-sample
    min distances (for d_min monitoring — the early-stop tracker watches
    their collapse as a memorization alarm).
    """
    d_min = min_cosine_distances(embeds, bank, bank_normalized=bank_normalized)
    loss = jnp.mean(jax.nn.relu(margin - d_min))
    return loss, d_min

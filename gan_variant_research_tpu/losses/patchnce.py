"""PatchNCE contrastive loss (CUT), fully batched for the MXU.

Behavioral match of GAN_Variant1/losses/patchnce_cut.py:42-149 with the
reference's Python per-batch-item loop replaced by one batched matmul:

- per layer, ONE shared set of ``num_patches`` spatial indices is drawn and
  reused across the batch and between src/tgt (reference quirk, :63 —
  SURVEY.md §2.6 item 4);
- patches are L2-normalized with eps 1e-6 (torch F.normalize: v/max(‖v‖,eps));
- logits = tgt @ srcᵀ / τ, clamped to ±50, cross-entropy against the
  diagonal (positives are same-location patches);
- negatives never cross batch items
  (nce_includes_all_negatives_from_minibatch: false);
- non-finite per-layer losses fall back to 0 (reference NaN guard :97-108);
- averaged over batch then over layers.

Source features must be stop-gradiented by the caller (the reference
extracts them under no_grad and detaches, :138-142). All math runs in fp32
— the tensors are tiny (B×256×256) next to the conv trunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _layer_nce(key, src_feat, tgt_feat, temperature: float, num_patches: int):
    """One NCE layer on NHWC features; returns a scalar fp32 loss."""
    b, h, w, c = src_feat.shape
    hw = h * w
    n = min(num_patches, hw)

    patch_ids = jax.random.randint(key, (n,), 0, hw)

    # gather in the native dtype FIRST, cast the tiny (B, n, C) patch set to
    # fp32 after: casting the full (B, HW, C) maps before the gather forced
    # XLA to materialize fp32 copies of the 256² stem taps (~0.5 GB each,
    # ~12 ms/step profiled on a v5e); the gather itself does no arithmetic,
    # so the ordering is numerically identical
    src = src_feat.reshape(b, hw, c)
    tgt = tgt_feat.reshape(b, hw, c)
    src_p = jnp.take(src, patch_ids, axis=1).astype(jnp.float32)  # (B, n, C)
    tgt_p = jnp.take(tgt, patch_ids, axis=1).astype(jnp.float32)

    def normalize(v):
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(norm, 1e-6)

    src_p = normalize(src_p)
    tgt_p = normalize(tgt_p)

    logits = jnp.einsum("bnc,bmc->bnm", tgt_p, src_p,
                        preferred_element_type=jnp.float32) / temperature
    logits = jnp.clip(logits, -50.0, 50.0)

    # cross-entropy against labels = arange(n): positives on the diagonal
    logz = jax.nn.logsumexp(logits, axis=-1)            # (B, n)
    pos = jnp.diagonal(logits, axis1=1, axis2=2)        # (B, n)
    loss = jnp.mean(logz - pos)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def patch_nce_loss(
    key: jax.Array,
    src_feats: list,
    tgt_feats: list,
    temperature: float = 0.07,
    num_patches: int = 256,
) -> jnp.ndarray:
    """Average NCE loss over tapped layers. ``src_feats`` are detached here
    for safety (idempotent if the caller already did)."""
    total = 0.0
    for i, (src, tgt) in enumerate(zip(src_feats, tgt_feats)):
        layer_key = jax.random.fold_in(key, i)
        total += _layer_nce(
            layer_key, jax.lax.stop_gradient(src), tgt, temperature, num_patches
        )
    return total / len(src_feats)

"""Experimental generator attention blocks (the reference's deleted variant
surface, re-designed TPU-first).

The reference's ``models/attention_blocks.py`` — self-attention, channel
attention, and AdaIN style gates, wired into ``ResNetGenerator`` as
``self_attns`` / ``channel_attns`` / ``style_gates`` ModuleDicts — was
deleted in the baseline reversion (Documentation/BASELINE_REVERSION.md
"What Was Removed" §2), leaving only the constructor flags
(generator_resnet_attn.py:88-99: ``use_attention``, ``attn_layers``,
``use_channel_attn``, ``channel_attn_layers``, ``use_style_dropout``,
``alpha_min``/``alpha_max``). The reversion doc's own roadmap is "any new
features should be added incrementally as deltas from this proven
baseline" — these modules are those deltas, implemented from the flags'
documented intent (the deleted source is not in the reference tree, so the
exact internals are re-designed, not transcribed):

- :class:`SelfAttention2d` — SAGAN-style non-local block (Zhang et al.
  2019): 1×1 query/key/value convs, (HW×HW) attention, zero-init residual
  gain γ so an enabled block starts as an exact identity.
- :class:`ChannelAttention` — squeeze-and-excitation gate (Hu et al. 2018)
  with a ``2·sigmoid`` output scale and zero-init final layer so the
  at-init scale is exactly 1 (identity), keeping enable-the-flag a
  continuation of the same model rather than a re-init.
- :class:`StyleGate` — the AdaIN-style "style dropout": a learned
  per-channel restyling ``γ·IN(x)+β`` blended with the input by a
  per-sample α ~ U[alpha_min, alpha_max] drawn fresh each step. Without a
  key (inference) the gate is a no-op, i.e. the dropout is train-only.

TPU notes: the attention map is two batched matmuls (MXU work) with the
softmax reduction in fp32; at the trunk resolution (64×64 ⇒ HW=4096) the
(B, 4096, 4096) logits are the dominant memory cost, which is why the
blocks are opt-in per layer rather than global.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.models.layers import Conv2d
from gan_variant_research_tpu.ops.nn_ops import instance_norm


class SelfAttention2d(nn.Module):
    """SAGAN self-attention over the spatial grid of an NHWC tensor.

    ``out = x + γ · (softmax(Q Kᵀ / 1) V) W_o`` with γ a scalar parameter
    initialized to 0 — enabling the block leaves the forward numerically
    identical until γ moves off zero.
    """

    channels: int
    reduction: int = 8
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = max(c // self.reduction, 1)
        kw = dict(kernel_size=1, padding=0, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        q = Conv2d(inner, name="query", **kw)(x).reshape(b, h * w, inner)
        k = Conv2d(inner, name="key", **kw)(x).reshape(b, h * w, inner)
        v = Conv2d(c, name="value", **kw)(x).reshape(b, h * w, c)

        # (B, HW, HW) attention logits: one batched matmul; softmax in fp32
        # (bf16 logsumexp over 4096 terms loses too much precision), the
        # row-normalized weights return to the compute dtype for the second
        # matmul so both contractions ride the MXU in bf16.
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = Conv2d(c, name="out", **kw)(out)

        gamma = self.param("gamma", nn.initializers.zeros, (), self.param_dtype)
        return x + gamma.astype(x.dtype) * out


class ChannelAttention(nn.Module):
    """Squeeze-and-excitation channel gate for NHWC tensors.

    ``out = x · 2σ(W₂ relu(W₁ avgpool(x)))`` with W₂ zero-initialized so the
    at-init scale is exactly 1 (2σ(0) = 1): enabling the flag is an exact
    identity until training moves the gate.
    """

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        inner = max(c // self.reduction, 1)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        h = nn.Dense(inner, name="fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(pooled)
        h = jax.nn.relu(h)
        z = nn.Dense(c, name="fc2", kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        scale = 2.0 * jax.nn.sigmoid(z.astype(jnp.float32))
        return x * scale[:, None, None, :].astype(x.dtype)


class StyleGate(nn.Module):
    """AdaIN-style style-dropout gate (train-only stochastic restyling).

    A learned global style (per-channel γ, β applied to the instance-normed
    activation — the AdaIN form with a learned rather than encoded style)
    is blended with the untouched activation by a per-sample
    α ~ U[alpha_min, alpha_max]:

        out = α · x + (1 − α) · (γ · IN(x) + β)

    γ init 1, β init 0 make the styled branch start as plain instance norm.
    With ``key=None`` (inference, and the baseline's eval path) the gate
    returns ``x`` unchanged — the "dropout" exists only while training,
    mirroring how the reference's deleted gates were absent from
    ``get_feature_layers`` (BASELINE_REVERSION.md "Key Code Changes" §2).
    """

    channels: int
    alpha_min: float = 0.4
    alpha_max: float = 0.9
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.channels,), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros,
                          (self.channels,), self.param_dtype)
        if key is None:
            return x
        styled = gamma.astype(x.dtype) * instance_norm(x) + beta.astype(x.dtype)
        alpha = jax.random.uniform(
            key, (x.shape[0], 1, 1, 1), jnp.float32,
            minval=self.alpha_min, maxval=self.alpha_max,
        ).astype(x.dtype)
        return alpha * x + (1.0 - alpha) * styled

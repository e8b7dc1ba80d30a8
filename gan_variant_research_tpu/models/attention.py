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
blocks are opt-in per layer rather than global. On TPU the map never has to
touch HBM at all: ``flash=True``/``"auto"`` routes eligible shapes through
the Pallas flash-attention kernel (see :func:`flash_spatial_attention`) —
measured 25.5 vs 130.3 ms fwd+bwd per block at (32, 4096) on one v5e
(docs/PERF.md "Variant self-attention: flash kernel").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.models.layers import Conv2d
from gan_variant_research_tpu.ops.nn_ops import instance_norm

_FLASH_HEAD_DIM = 128  # MXU lane width; also the kernel's preferred tiling


def flash_eligible(n: int, inner: int, c: int, flash: bool | str,
                   mesh=None, batch: int | None = None) -> bool:
    """Static routing decision for the SAGAN attention core.

    The Pallas flash kernel needs: a TPU target (``"auto"`` resolves from
    the mesh's device platform when one is wired, else from
    ``jax.default_backend()``; the kernel does not run on CPU), a spatial
    sequence that its 512-wide blocks tile (``n % 512 == 0`` and big enough
    for the traffic win to matter), value channels that split into 128-wide
    heads, and q/k channels that zero-pad into one head. On a multi-device
    mesh the kernel additionally needs the batch to split evenly across the
    ``data`` axis — Mosaic kernels cannot be auto-partitioned by GSPMD, so
    the multi-device route goes through an explicit ``shard_map`` (see
    :class:`SelfAttention2d`) whose shards must be non-empty. Ineligible
    shapes fall back to the exact einsum path — tiny test grids, odd
    channel counts, CPU runs, and non-dividing batches are all served
    there.
    """
    if flash not in (True, False, "auto"):
        # "Auto", "false", "off"… would otherwise be truthy strings that
        # silently force the kernel on
        raise ValueError(
            f"attn_flash must be true, false or 'auto', got {flash!r}")
    if flash == "auto":
        if mesh is not None:
            platform = mesh.mesh.devices.flat[0].platform
        else:
            platform = jax.default_backend()
        flash = platform == "tpu"
    if mesh is not None and mesh.num_devices > 1:
        if batch is None or batch % mesh.num_devices != 0:
            return False
    return (bool(flash) and n >= 1024 and n % 512 == 0
            and c % _FLASH_HEAD_DIM == 0 and inner <= _FLASH_HEAD_DIM)


def flash_spatial_attention(q: jnp.ndarray, k: jnp.ndarray,
                            v: jnp.ndarray) -> jnp.ndarray:
    """``softmax(q kᵀ) v`` without materializing the (B, HW, HW) map.

    The SAGAN core has mismatched widths — q/k at C/8, v at C — while the
    Pallas TPU flash kernel (jax.experimental.pallas.ops.tpu.flash_attention)
    wants one head dim for all three. Both adaptations are EXACT:

    - q/k are zero-padded to 128 columns (zero columns add nothing to qkᵀ);
    - v splits into C/128 heads of 128 channels, with the padded q/k
      broadcast to every head — the attention weights are shared across v
      channels, so per-head weights are identical to the one-head map.

    The win is HBM traffic: the einsum path writes+reads the fp32
    (B, HW, HW) logits and bf16 weights forward AND backward (~6 GB/step at
    (32, 4096)); the flash kernel keeps every tile in VMEM with fp32 online
    softmax (numerics equivalent to the einsum path's fp32-softmax policy).
    Block sizes are 512/1024: the library defaults (128-wide k blocks)
    measured 4× slower at these shapes — see docs/PERF.md.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, n, inner = q.shape
    c = v.shape[-1]
    heads = c // _FLASH_HEAD_DIM
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, _FLASH_HEAD_DIM - inner)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, _FLASH_HEAD_DIM - inner)))
    qh = jnp.broadcast_to(qp[:, None], (b, heads, n, _FLASH_HEAD_DIM))
    kh = jnp.broadcast_to(kp[:, None], (b, heads, n, _FLASH_HEAD_DIM))
    vh = v.reshape(b, n, heads, _FLASH_HEAD_DIM).transpose(0, 2, 1, 3)
    blk = 1024 if n % 1024 == 0 else 512
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    o = flash_attention(qh, kh, vh, causal=False, sm_scale=1.0,
                        block_sizes=bs)
    return o.transpose(0, 2, 1, 3).reshape(b, n, c)


class SelfAttention2d(nn.Module):
    """SAGAN self-attention over the spatial grid of an NHWC tensor.

    ``out = x + γ · (softmax(Q Kᵀ / 1) V) W_o`` with γ a scalar parameter
    initialized to 0 — enabling the block leaves the forward numerically
    identical until γ moves off zero.
    """

    channels: int
    reduction: int = 8
    # route the attention core through the Pallas flash kernel when the
    # target/shape allow it ("auto" = on TPU; see flash_eligible) — the
    # einsum fallback is the same math with the map materialized
    flash: bool | str = "auto"
    # the DP MeshContext the surrounding jit shards batches over. Mosaic
    # kernels cannot be auto-partitioned by GSPMD ("Mosaic kernels cannot
    # be automatically partitioned" at lowering), so on a >1-device mesh
    # the kernel runs under an explicit shard_map over the batch axis —
    # per-sample math, so sharding it is exact. Trainers/serving wire this
    # (cut_trainer.build_generator, generate_folder.stylize_folder).
    mesh: Any = None
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

        if flash_eligible(h * w, inner, c, self.flash,
                          mesh=self.mesh, batch=b):
            fn = flash_spatial_attention
            if self.mesh is not None and self.mesh.num_devices > 1:
                from jax.sharding import PartitionSpec as P

                spec = P(self.mesh.data_axis)
                # check_vma=False: pallas_call doesn't annotate varying
                # mesh axes; the body is collective-free per-shard math,
                # so there is nothing for the checker to verify anyway
                fn = jax.shard_map(fn, mesh=self.mesh.mesh,
                                   in_specs=(spec, spec, spec),
                                   out_specs=spec, check_vma=False)
            out = fn(q, k, v).reshape(b, h, w, c)
        else:
            # (B, HW, HW) attention logits: one batched matmul; softmax in
            # fp32 (bf16 logsumexp over 4096 terms loses too much
            # precision), the row-normalized weights return to the compute
            # dtype for the second matmul so both contractions ride the MXU
            # in bf16.
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

"""ResNet-9 generator with PatchNCE feature taps (NHWC, bf16-ready).

Capability match of the reference's two ResNet generators:

- GAN_Variant1/models/generator_resnet_attn.py:74-235 (``ResNetGenerator``:
  reflect-pad 7×7 stem → 2× stride-2 downsample → 9 residual blocks → 2×
  ConvTranspose upsample → 7×7 + tanh; ``get_feature_layers`` taps indexed
  0=stem, 1..2=downsample ReLUs, 3..11=res blocks, 12..13=upsample ReLUs).
- Basic_GAN/src/models.py:23-65 (same topology, bias-free convs) — select
  with ``use_bias=False``.

Design notes (TPU-first, not a translation):

- One forward optionally returns BOTH the output image and the tapped
  features (``extract=...``): the reference recomputes the full generator
  up to 5× per training step (SURVEY.md §3.1); here the fake image and the
  source-side NCE features come from a single fused forward, and unused
  tail layers of a taps-only call are dead-code-eliminated by XLA.
- Tap ids not in range are silently skipped exactly like the reference —
  note the default nce_layers [0,4,8,12,16] contains id 16 which does not
  exist (valid ids are 0..13), so the reference effectively uses 4 taps;
  we reproduce that.
- The experimental flags the reference deleted in its baseline reversion
  (attention / channel attention / style dropout,
  generator_resnet_attn.py:88-99 + Documentation/BASELINE_REVERSION.md §2)
  are WORKING opt-in variants here (models/attention.py), re-designed
  TPU-first as the reversion doc's own "add incrementally as deltas from
  this proven baseline" roadmap prescribes. All three start as exact
  identities at init (zero-init gains / closed gates), so enabling a flag
  continues the baseline model rather than re-initializing it; with every
  flag at its default the parameter tree, the feature-tap ids, and the
  compiled HLO are bit-identical to the baseline.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.models.layers import (
    Conv2d,
    ConvTranspose2d,
    pad_2d,
    activation_fn,
)
from gan_variant_research_tpu.ops.nn_ops import instance_norm


def _norm(x, kind: str):
    if kind == "instance":
        return instance_norm(x)
    if kind in ("none", "identity"):
        return x
    if kind == "batch":
        raise NotImplementedError("batch norm is not supported in the TPU rebuild")
    raise ValueError(f"Unknown norm: {kind!r}")


class ResidualBlock(nn.Module):
    """pad→conv3×3→norm→act→pad→conv3×3→norm, residual add
    (generator_resnet_attn.py:7-71).

    With ``use_pallas=True`` and baseline flags (reflect/instance/relu,
    biased convs, lane-aligned channels, VMEM-sized plane) the whole block
    runs through the fused Pallas pad+conv kernels (ops/pallas/resblock.py);
    otherwise a plain XLA path with identical semantics."""

    channels: int
    padding_type: str = "reflect"
    norm: str = "instance"
    activation: str = "relu"
    use_bias: bool = True
    use_pallas: bool = False
    # compute reflect-pad convs as zero-pad conv + exact border correction,
    # skipping the (B, H+2, W+2, C) pad materialization
    # (ops/nn_ops.py::conv3x3_reflect_padfree)
    pad_free: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from gan_variant_research_tpu.models.layers import _pair
        from gan_variant_research_tpu.ops.nn_ops import (
            torch_conv_bias_init,
            torch_conv_kernel_init,
        )

        c = self.channels
        kshape = (3, 3, x.shape[-1], c)
        fan_in = 9 * x.shape[-1]
        k1 = self.param("conv1_kernel", torch_conv_kernel_init, kshape,
                        self.param_dtype)
        k2 = self.param("conv2_kernel", torch_conv_kernel_init, kshape,
                        self.param_dtype)
        if self.use_bias:
            b1 = self.param("conv1_bias", torch_conv_bias_init(fan_in), (c,),
                            self.param_dtype)
            b2 = self.param("conv2_bias", torch_conv_bias_init(fan_in), (c,),
                            self.param_dtype)
        else:
            b1 = b2 = jnp.zeros((c,), self.param_dtype)

        if self._pallas_eligible(x):
            from gan_variant_research_tpu.ops.pallas.resblock import fused_resblock

            return fused_resblock(x.astype(self.dtype), k1, b1, k2, b2)

        act = activation_fn(self.activation)
        zero_pad = self.padding_type == "zero"

        pad_free = (self.pad_free and self.padding_type == "reflect"
                    and x.shape[1] >= 2 and x.shape[2] >= 2)

        def conv(h, kernel, bias):
            if pad_free:
                from gan_variant_research_tpu.ops.nn_ops import (
                    conv3x3_reflect_padfree,
                )

                y = conv3x3_reflect_padfree(h, kernel.astype(self.dtype))
            else:
                if not zero_pad:
                    h = pad_2d(h, 1, self.padding_type)
                pad = ((1, 1), (1, 1)) if zero_pad else ((0, 0), (0, 0))
                y = jax.lax.conv_general_dilated(
                    h, kernel.astype(self.dtype), (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            if self.use_bias:
                y = y + bias.astype(self.dtype)
            return y

        h = conv(x, k1, b1)
        h = _norm(h, self.norm)
        h = act(h)
        h = conv(h, k2, b2)
        h = _norm(h, self.norm)
        return x + h

    def _pallas_eligible(self, x) -> bool:
        if not self.use_pallas:
            return False
        if (self.padding_type != "reflect" or self.norm != "instance"
                or self.activation != "relu" or not self.use_bias):
            return False
        if x.shape[-1] != self.channels:
            return False
        import jax as _jax

        from gan_variant_research_tpu.ops.pallas.resblock import resblock_supported

        if _jax.default_backend() == "cpu":
            return False  # interpreter mode is for tests only
        return resblock_supported(x.shape, self.channels)


class ResNetGenerator(nn.Module):
    """See module docstring. ``__call__(x)`` → image in [−1,1];
    ``__call__(x, extract=ids)`` → (image, [tapped features])."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    n_downsampling: int = 2
    padding_type: str = "reflect"
    norm: str = "instance"
    activation: str = "relu"
    use_bias: bool = True        # Basic_GAN lineage uses False
    # Experimental variant features (reference constructor args,
    # generator_resnet_attn.py:88-99; working re-designs in
    # models/attention.py — see module docstring)
    use_attention: bool = False
    attn_layers: Sequence[int] = (3, 7)
    # Pallas flash kernel for the attention core ("auto" = on TPU when the
    # shape is eligible; models/attention.py::flash_eligible) + the DP mesh
    # it must shard_map over when the surrounding jit spans >1 device
    attn_flash: Any = "auto"
    attn_mesh: Any = None
    use_channel_attn: bool = False
    channel_attn_layers: Sequence[int] = (5,)
    use_style_dropout: bool = False
    alpha_min: float = 0.4
    alpha_max: float = 0.9
    # jax.checkpoint the residual trunk: recompute activations in the
    # backward pass instead of keeping 9 blocks of 64×64×4·ngf live —
    # trades ~15% FLOPs for roughly half the activation HBM, enabling
    # larger batches (the HBM-bandwidth lever from the build brief)
    remat: bool = False
    # route eligible residual blocks through the fused Pallas pad+conv
    # kernels (ops/pallas/resblock.py)
    use_pallas: bool = False
    # trunk reflect-pad convs as zero-pad conv + exact border correction —
    # removes the per-conv (B, H+2, W+2, C) pad copies the profiler flagged
    # (docs/PERF.md); exact, float-reordered only at the 1-px output border
    pad_free: bool = False
    # exact space-to-depth schedule for the 7×7 stem/head convs (ops/s2d.py):
    # same parameters and math, ~4× faster on the MXU for 3-channel tensors
    use_s2d: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        extract: Sequence[int] | None = None,
        style_key: jax.Array | None = None,
    ):
        act = activation_fn(self.activation)
        stem_pad = 3 if self.padding_type != "reflect" else 0
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        feats: list = []
        tap_set = set(extract) if extract is not None else None
        layer_idx = 0

        def tap(h):
            nonlocal layer_idx
            if tap_set is not None and layer_idx in tap_set:
                feats.append(h)
            layer_idx += 1

        x = x.astype(self.dtype)

        # Stem: ReflectionPad(3) + 7×7 conv + norm + act (ref :105-115)
        h = pad_2d(x, 3, self.padding_type) if self.padding_type == "reflect" else x
        h = Conv2d(
            self.ngf, kernel_size=7, padding=stem_pad, use_bias=self.use_bias,
            s2d=self.use_s2d, name="initial_conv", **kw,
        )(h)
        h = _norm(h, self.norm)
        h = act(h)
        tap(h)

        # Downsampling ×n (ref :118-127)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = Conv2d(
                self.ngf * mult * 2, kernel_size=3, strides=2, padding=1,
                use_bias=self.use_bias, name=f"down_{i}", **kw,
            )(h)
            h = _norm(h, self.norm)
            h = act(h)
            tap(h)

        # Residual trunk (ref :129-138), with the opt-in variant blocks
        # (models/attention.py) applied after their host res block — the
        # tap then sees the attended feature, so PatchNCE contrasts what
        # the rest of the network actually consumes. Tap ids are unchanged
        # (one per res block) whether or not the variants are enabled.
        res_channels = self.ngf * 2 ** self.n_downsampling
        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        style_keys = (
            jax.random.split(style_key, self.n_blocks)
            if (self.use_style_dropout and style_key is not None)
            else None
        )
        for i in range(self.n_blocks):
            h = block_cls(
                res_channels,
                padding_type=self.padding_type,
                norm=self.norm,
                activation=self.activation,
                use_bias=self.use_bias,
                use_pallas=self.use_pallas,
                pad_free=self.pad_free,
                name=f"res_{i}",
                **kw,
            )(h)
            if self.use_attention and i in tuple(self.attn_layers):
                from gan_variant_research_tpu.models.attention import SelfAttention2d

                h = SelfAttention2d(res_channels, flash=self.attn_flash,
                                    mesh=self.attn_mesh,
                                    name=f"attn_{i}", **kw)(h)
            if self.use_channel_attn and i in tuple(self.channel_attn_layers):
                from gan_variant_research_tpu.models.attention import ChannelAttention

                h = ChannelAttention(res_channels, name=f"channel_attn_{i}", **kw)(h)
            if self.use_style_dropout:
                from gan_variant_research_tpu.models.attention import StyleGate

                h = StyleGate(
                    res_channels,
                    alpha_min=self.alpha_min,
                    alpha_max=self.alpha_max,
                    name=f"style_gate_{i}",
                    **kw,
                )(h, style_keys[i] if style_keys is not None else None)
            tap(h)

        # Upsampling ×n (ref :140-152)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose2d(
                self.ngf * mult // 2, kernel_size=3, strides=2, padding=1,
                output_padding=1, use_bias=self.use_bias, name=f"up_{i}", **kw,
            )(h)
            h = _norm(h, self.norm)
            h = act(h)
            tap(h)

        # Output head: ReflectionPad(3) + 7×7 conv + tanh (ref :154-162);
        # both reference lineages keep bias on the final conv
        out = pad_2d(h, 3, self.padding_type) if self.padding_type == "reflect" else h
        out = Conv2d(
            self.output_nc, kernel_size=7, padding=stem_pad, use_bias=True,
            s2d=self.use_s2d, name="output_conv", **kw,
        )(out)
        out = jnp.tanh(out)

        if extract is not None:
            return out, feats
        return out

"""Building-block linen modules with PyTorch-matching semantics (NHWC).

- ``Conv2d``: torch.nn.Conv2d equivalent (explicit padding, torch default
  init, optional spectral norm with explicit power-iteration state).
- ``ConvTranspose2d``: torch.nn.ConvTranspose2d(k, s, p, output_padding)
  equivalent, implemented as lhs-dilated conv_general_dilated with
  asymmetric padding (k−1−p, k−1−p+output_padding) — SURVEY.md §7 hard
  part #2 (output_padding=1 ⇒ exact 2× upsampling).

Params are stored in ``param_dtype`` (fp32) and cast to ``dtype`` (bf16 by
default) at use, the TPU-native replacement for CUDA AMP autocast.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.ops.nn_ops import (
    torch_conv_kernel_init,
    torch_conv_bias_init,
)
from gan_variant_research_tpu.ops.spectral_norm import spectral_normalize

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent. ``padding`` is the symmetric int padding
    (torch convention). Optional spectral normalization keeps its ``u``
    vector in the 'spectral' variable collection; pass ``update_sn=True``
    (with mutable=['spectral']) to run the per-step power iteration."""

    features: int
    kernel_size: Any = 3
    strides: Any = 1
    padding: int = 0
    use_bias: bool = True
    use_spectral_norm: bool = False
    # exact space-to-depth schedule for 7×7 stride-1 convs (MXU-hostile with
    # 3-channel tensors: profiled 4-12 TF/s vs ~180 TF/s trunk convs) — see
    # ops/s2d.py; parameters and math are unchanged
    s2d: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = False) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        in_c = x.shape[-1]
        kshape = (kh, kw, in_c, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kshape, self.param_dtype)

        if self.use_spectral_norm:
            u_var = self.variable(
                "spectral",
                "u",
                lambda: _init_u(self.make_rng("params"), self.features),
            )
            kernel, u_new = spectral_normalize(kernel, u_var.value, update=update_sn)
            if update_sn and not self.is_initializing():
                u_var.value = u_new

        pad = _pair(self.padding)
        from gan_variant_research_tpu.ops.s2d import (
            conv7x7_s2d,
            conv7x7_s2d_supported,
        )

        padded_shape = (x.shape[0], x.shape[1] + 2 * pad[0],
                        x.shape[2] + 2 * pad[1])
        if (self.s2d and (kh, kw) == (7, 7) and _pair(self.strides) == (1, 1)
                and conv7x7_s2d_supported(padded_shape)):
            xp = x
            if pad != (0, 0):
                xp = jnp.pad(x, ((0, 0), (pad[0],) * 2, (pad[1],) * 2, (0, 0)))
            y = conv7x7_s2d(xp, kernel, dtype=self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(self.dtype),
                window_strides=_pair(self.strides),
                padding=((pad[0], pad[0]), (pad[1], pad[1])),
                dimension_numbers=_DIMS,
            )
        if self.use_bias:
            fan_in = kh * kw * in_c
            bias = self.param(
                "bias", torch_conv_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


def _init_u(key, n):
    u = jax.random.normal(key, (n,), jnp.float32)
    return u / (jnp.linalg.norm(u) + 1e-12)


def _convtranspose_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d default init: U(±1/√fan_in) with
    fan_in = out_channels·kh·kw (weight layout (in, out, kh, kw), fan_in
    taken from dim 1). Our HWIO layout is (kh, kw, in, out) ⇒ fan from
    shape[3]."""
    kh, kw, _, out_c = shape
    bound = 1.0 / jnp.sqrt(kh * kw * out_c)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d(kernel, stride, padding, output_padding)
    equivalent: lhs-dilate by stride, pad (k−1−p, k−1−p+output_padding),
    correlate. The stored HWIO kernel is the correlation kernel (converters
    from torch weights must flip spatial dims and swap in/out)."""

    features: int
    kernel_size: Any = 3
    strides: Any = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel",
            _convtranspose_kernel_init,
            (kh, kw, in_c, self.features),
            self.param_dtype,
        )
        sh, sw = _pair(self.strides)
        p = self.padding
        op = self.output_padding
        pad_h = (kh - 1 - p, kh - 1 - p + op)
        pad_w = (kw - 1 - p, kw - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=(pad_h, pad_w),
            lhs_dilation=(sh, sw),
            dimension_numbers=_DIMS,
        )
        if self.use_bias:
            fan_in = kh * kw * self.features  # torch fan_in for ConvTranspose
            bias = self.param(
                "bias", torch_conv_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


def pad_2d(x: jnp.ndarray, pad: int, padding_type: str) -> jnp.ndarray:
    """reflect / replicate / zero spatial padding for NHWC."""
    if pad == 0:
        return x
    widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if padding_type == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if padding_type == "replicate":
        return jnp.pad(x, widths, mode="edge")
    if padding_type == "zero":
        return jnp.pad(x, widths, mode="constant")
    raise ValueError(f"Unknown padding_type: {padding_type!r}")


def activation_fn(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name in ("none", "identity"):
        return lambda x: x
    raise ValueError(f"Unknown activation: {name!r}")

"""Core NN primitives with PyTorch-matching semantics, NHWC layout.

Equivalents of the layers the reference exercises through torch.nn
(SURVEY.md §2.4): InstanceNorm2d (no affine, biased variance, eps 1e-5),
ReflectionPad2d, LeakyReLU(0.2), AvgPool2d(3, 2, padding=1,
count_include_pad=False) for the multiscale-D pyramid, plus PyTorch-default
conv initializers so training dynamics match the reference's
(kaiming_uniform(a=√5) ⇒ U(±1/√fan_in); torch.nn.Conv2d default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over spatial dims for NHWC input, no affine parameters.

    Matches torch.nn.InstanceNorm2d defaults (affine=False, biased var,
    eps=1e-5), used throughout the reference generator
    (GAN_Variant1/models/generator_resnet_attn.py:56,114) in NCHW.

    Statistics accumulate in fp32 (reduce-with-convert fuses on TPU — no
    fp32 copy of the activation is materialized); the normalization itself
    runs in the input dtype with broadcast fp32 stats. Profiling showed the
    earlier cast-everything-to-fp32 formulation materialized fp32 copies of
    the 256² stem activations and cost ~1/3 of the whole CUT train step.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jax.lax.square(x.astype(jnp.float32)),
        axis=(1, 2), keepdims=True, dtype=jnp.float32,
    )
    # E[x²]−E[x]² in fp64-free fp32: with O(1) activations over ≥4k spatial
    # positions the cancellation error is ~1e-6 relative — immaterial here,
    # and both reductions fuse over a single read of x
    var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale = inv.astype(x.dtype)
    offset = (mean * inv).astype(x.dtype)
    return x * scale - offset


def reflect_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """ReflectionPad2d for NHWC input (torch.nn.ReflectionPad2d)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv3x3_reflect_padfree(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ReflectionPad(1) + 3×3 valid conv with NO padded-buffer copy.

    XLA cannot absorb reflect padding into a convolution the way it folds
    zero padding, so the straightforward `conv(valid, reflect_pad(x))`
    materializes a (B, H+2, W+2, C) copy of every trunk activation, forward
    and backward — measured as the one sub-roofline slice of the CUT train
    step (docs/PERF.md "Step-time attribution r3": 36 such copies,
    ~6.3 GB/step at half HBM bandwidth).

    This computes the identical function as `conv_zero_SAME(x) + ring`,
    where `ring` — the pad border's contribution, linear in interior
    rows/cols 1 and H−2 / W−2 — is restored by four convs over 1-pixel
    strips that touch only the output border:

      out[0,  :] += K[0] ⊛w reflect_w(x[1]);   out[H−1, :] += K[2] ⊛w reflect_w(x[H−2])
      out[:,  0] += K[:,0] ⊛h_zero x[:, 1];    out[:, W−1] += K[:,2] ⊛h_zero x[:, W−2]

    (the top/bottom strips carry their own width reflection, so the four
    corner pad pixels — x[1,1] etc. — enter exactly once). Mathematically
    exact; float summation is reordered only on the 1-pixel output border.
    Requires H ≥ 2 and W ≥ 2 (same domain as reflect padding itself).
    """
    _, h, w, _ = x.shape
    dn = ("NHWC", "HWIO", "NHWC")
    conv = jax.lax.conv_general_dilated
    out = conv(x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    wpad = ((0, 0), (0, 0), (1, 1), (0, 0))
    top = conv(jnp.pad(x[:, 1:2], wpad, mode="reflect"), kernel[0:1],
               (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
    bot = conv(jnp.pad(x[:, h - 2:h - 1], wpad, mode="reflect"), kernel[2:3],
               (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
    left = conv(x[:, :, 1:2], kernel[:, 0:1],
                (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn)
    right = conv(x[:, :, w - 2:w - 1], kernel[:, 2:3],
                 (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn)

    zeros = ((0, 0),) * 2
    out = out + jnp.pad(top, ((0, 0), (0, h - 1), *zeros))
    out = out + jnp.pad(bot, ((0, 0), (h - 1, 0), *zeros))
    out = out + jnp.pad(left, ((0, 0), (0, 0), (0, w - 1), (0, 0)))
    out = out + jnp.pad(right, ((0, 0), (0, 0), (w - 1, 0), (0, 0)))
    return out


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=3, stride=2, padding=1, count_include_pad=False) on
    NHWC — the multiscale-discriminator downsampler
    (GAN_Variant1/models/discriminator_patchgan.py:106)."""
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, padding)
    return summed / counts


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default weight init for HWIO kernels:
    kaiming_uniform(a=√5) ⇒ U(−1/√fan_in, 1/√fan_in), fan_in = kh*kw*in_c."""
    kh, kw, in_c, _ = shape
    fan_in = kh * kw * in_c
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_bias_init(fan_in: int):
    """PyTorch Conv2d default bias init: U(−1/√fan_in, 1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_convtranspose_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch ConvTranspose2d default weight init for HWIO kernels.

    PyTorch computes fan_in on the (in_c, out_c, kh, kw) weight as
    out_c*kh*kw; with flax's HWIO layout and ``transpose_kernel=True`` the
    stored kernel is (kh, kw, out_c, in_c) so fan_in = kh*kw*shape[2]... but
    flax ConvTranspose with transpose_kernel=True stores (kh, kw, out, in);
    PyTorch's fan_in for ConvTranspose2d is in_channels-side:
    weight shape (in, out, kh, kw) ⇒ fan_in = out*kh*kw.
    """
    kh, kw, a, b = shape
    fan_in = kh * kw * a  # matches torch: out_c * kh * kw with transposed layout
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

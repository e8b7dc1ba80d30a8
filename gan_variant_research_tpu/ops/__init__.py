"""TPU-native compute primitives.

These replace what the reference delegates to PyTorch/cuDNN internals
(SURVEY.md §2.4): PyTorch-semantics convolutions in NHWC, instance
normalization, reflection padding, device-side image resizing and color
ops, DiffAugment as pure jitted functions, and spectral-norm power
iteration with explicit state. Pallas kernels for the hot paths live in
``ops.pallas``.
"""

from gan_variant_research_tpu.ops.nn_ops import (
    instance_norm,
    reflect_pad_2d,
    leaky_relu,
    avg_pool_3x3_s2,
    torch_conv_kernel_init,
    torch_conv_bias_init,
)
from gan_variant_research_tpu.ops.resize import resize_bicubic, resize_bilinear
from gan_variant_research_tpu.ops.color import (
    denormalize,
    normalize_to_unit,
    rgb_to_lab,
    get_low_freq_stats,
)

__all__ = [
    "instance_norm",
    "reflect_pad_2d",
    "leaky_relu",
    "avg_pool_3x3_s2",
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
    "resize_bicubic",
    "resize_bilinear",
    "denormalize",
    "normalize_to_unit",
    "rgb_to_lab",
    "get_low_freq_stats",
]

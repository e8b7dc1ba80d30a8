"""Color-space ops and normalization helpers (NHWC).

JAX equivalents of GAN_Variant1/dataio/transforms.py:89-119 (rgb_to_lab,
get_low_freq_stats — retained for the palette-prior capability surface) and
the [−1,1] normalization convention used across the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_to_unit(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] or float [0,1] → float in [−1, 1]."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) / 255.0
    return x * 2.0 - 1.0


def denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """[−1, 1] → [0, 1] (transforms.py:84-86)."""
    return x * 0.5 + 0.5


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """[−1, 1] → uint8 [0, 255] with the same round-trip as the reference
    inference path (generate_folder.py:243-246: clamp, *0.5+0.5, *255,
    round)."""
    x = jnp.clip(x, -1.0, 1.0)
    x = (x * 0.5 + 0.5) * 255.0
    return jnp.round(x).astype(jnp.uint8)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert NHWC RGB in [0,1] to Lab (D65), same simplified pipeline as
    the reference (transforms.py:89-119; sRGB linearize → XYZ → Lab)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    def linearize(c):
        return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)

    r, g, b = linearize(r), linearize(g), linearize(b)

    x = r * 0.4124 + g * 0.3576 + b * 0.1805
    y = r * 0.2126 + g * 0.7152 + b * 0.0722
    z = r * 0.0193 + g * 0.1192 + b * 0.9505

    x = x / 0.95047
    z = z / 1.08883

    epsilon = 0.008856
    kappa = 903.3

    def f(t):
        # clamp inside the cbrt so the untaken branch can't poison gradients
        # (d/dt cbrt(t) → ∞ at t=0; jnp.where evaluates both branches) —
        # values are unchanged since cbrt is only selected where t > epsilon
        return jnp.where(t > epsilon, jnp.cbrt(jnp.maximum(t, epsilon)),
                         (kappa * t + 16.0) / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b_lab = 200.0 * (fy - fz)
    return jnp.stack([L, a, b_lab], axis=-1)


def get_low_freq_stats(lab: jnp.ndarray, target_size: int = 32,
                       eps: float = 0.0):
    """Mean/std of the low-frequency component of an NHWC Lab image
    (transforms.py:122-141: adaptive-avg-pool to target_size then stats).
    Returns ((B,3) mean, (B,3) std with Bessel correction like torch.std).
    ``eps`` stabilizes the sqrt gradient for differentiable consumers
    (losses/palette_prior.py); the default keeps the reference value exact."""
    b, h, w, c = lab.shape
    # adaptive_avg_pool2d with integer ratio == mean over equal windows;
    # for non-divisible sizes fall back to resize-style pooling via reshape
    # of the largest divisible crop (sizes here are powers of two in practice)
    fh, fw = h // target_size, w // target_size
    pooled = lab[:, : fh * target_size, : fw * target_size, :]
    pooled = pooled.reshape(b, target_size, fh, target_size, fw, c).mean(axis=(2, 4))
    mean = pooled.mean(axis=(1, 2))
    n = target_size * target_size
    var = jnp.square(pooled - mean[:, None, None, :]).sum(axis=(1, 2)) / (n - 1)
    return mean, jnp.sqrt(var + eps)

"""Device-resident image resizing.

The reference resizes on host with PIL (bicubic for train transforms,
GAN_Variant1/dataio/transforms.py:30-47; bilinear to 299 for EVAL,
EVAL/eval/datasets.py). Here resizing runs on-device under jit as part of
the fused preprocessing stage. ``jax.image.resize`` with ``antialias=True``
matches PIL's scaled-filter behavior (PIL always antialiases on
downsampling — see "On Aliased Resizing and Surprising Subtleties in GAN
Evaluation", PAPERS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize(x: jnp.ndarray, size: tuple[int, int], method: str, antialias: bool):
    """Resize NHWC (or HWC) images to (H, W) = size."""
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"Expected HWC or NHWC, got shape {x.shape}")
    return jax.image.resize(x, shape, method=method, antialias=antialias)


def resize_bicubic(x: jnp.ndarray, size: tuple[int, int], antialias: bool = True):
    return _resize(x, size, "cubic", antialias)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], antialias: bool = True):
    return _resize(x, size, "linear", antialias)


def resize_bilinear_torch(x: jnp.ndarray, size: tuple[int, int]):
    """Bilinear resize with NO antialiasing — matches
    torch.nn.functional.interpolate(mode='bilinear', align_corners=False),
    which is what torch-fidelity's FID InceptionV3 applies internally. Used
    by the eval suite for strict FID parity."""
    return _resize(x, size, "linear", antialias=False)

"""DiffAugment as pure jitted functions (NHWC, explicit PRNG keys).

Behavioral match of GAN_Variant1/training/diffaugment.py:6-106 with the
torch stateful RNG replaced by explicit keys, and the gather/scatter
formulations replaced by vectorized index arithmetic XLA fuses cleanly:

- brightness: x + (U[0,1)−0.5) per sample                     (:6-9)
- saturation: (x−mean_c)·(2·U[0,1)) + mean_c                  (:12-16)
- contrast:   (x−mean_chw)·(U[0,1)+0.5) + mean_chw            (:19-23)
- translation(±12.5%): integer shift per sample, zero fill     (:26-43)
  (the reference pads by 1 and clamps indices into the zero border —
  net effect is translation with zero fill, reproduced here directly)
- cutout(50%) / cutout_light(20%): one square per sample zeroed, offset
  uniform over the image, box clamped to bounds                (:46-65)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) - 0.5
    return x + b


def rand_saturation(key, x):
    factor = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) * 2.0
    x_mean = jnp.mean(x, axis=3, keepdims=True)
    return (x - x_mean) * factor + x_mean


def rand_contrast(key, x):
    factor = jax.random.uniform(key, (x.shape[0], 1, 1, 1), dtype=x.dtype) + 0.5
    x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return (x - x_mean) * factor + x_mean


def rand_translation(key, x, ratio: float = 0.125):
    """Per-sample integer translation with zero fill.

    shift ∈ [−s, s] with s = int(H·ratio + 0.5), drawn independently for H
    and W per batch element (diffaugment.py:26-31).
    """
    b, h, w, c = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (b,), -sh, sh + 1)
    ty = jax.random.randint(ky, (b,), -sw, sw + 1)

    # reference semantics (pad-1 + clamped gather) == translation with zero
    # fill; implemented as zero-pad by the max shift + per-sample
    # dynamic_slice — a contiguous slice instead of a full gather (the
    # gather formulation cost ~40 ms/call at B=16, 256² on TPU)
    x_pad = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    def shift_one(img, dx, dy):
        return jax.lax.dynamic_slice(img, (sh + dx, sw + dy, 0), (h, w, c))

    return jax.vmap(shift_one)(x_pad, tx, ty)


def _cutout_mask(key, x, ratio: float):
    b, h, w, _ = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    # reference offsets: randint(0, size + (1 − cutout_size % 2)) (:49-50)
    ox = jax.random.randint(kx, (b, 1, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(ky, (b, 1, 1), 0, w + (1 - cw % 2))
    lo_x = ox - ch // 2
    lo_y = oy - cw // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    # clamped scatter region == closed interval [max(0,lo), min(size−1, lo+cs−1)]
    in_x = (rows >= jnp.maximum(lo_x, 0)) & (rows <= jnp.minimum(lo_x + ch - 1, h - 1))
    in_y = (cols >= jnp.maximum(lo_y, 0)) & (cols <= jnp.minimum(lo_y + cw - 1, w - 1))
    return jnp.logical_not(in_x & in_y)


def rand_cutout(key, x, ratio: float = 0.5):
    mask = _cutout_mask(key, x, ratio)
    return x * mask[..., None].astype(x.dtype)


def rand_cutout_light(key, x, ratio: float = 0.2):
    return rand_cutout(key, x, ratio=ratio)


AUGMENT_FNS = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
    "cutout_light": (rand_cutout_light,),
}


def build_policy(policy: list[str] | None):
    """Resolve a policy list to a flat tuple of augment fns (DiffAugment
    wrapper, diffaugment.py:79-106). Unknown names are skipped like the
    reference."""
    if policy is None:
        policy = ["color", "translation", "cutout_light"]
    fns = []
    for p in policy:
        fns.extend(AUGMENT_FNS.get(p, ()))
    return tuple(fns)


def diff_augment(key, x, policy: list[str] | tuple | None = ("color", "translation", "cutout")):
    """Apply the augmentation chain with independent keys per op."""
    fns = build_policy(list(policy) if policy is not None else None)
    if not fns:
        return x
    keys = jax.random.split(key, len(fns))
    for k, fn in zip(keys, fns):
        x = fn(k, x)
    return x

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
    b, h, w, _ = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (b, 1, 1), -sh, sh + 1)
    ty = jax.random.randint(ky, (b, 1, 1), -sw, sw + 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    # reference: clamp(grid + t + 1, 0, size+1) indexes a zero-padded image;
    # indices at the pad (0 or size+1) read zeros ⇒ zero fill
    src_r = rows + tx
    src_c = cols + ty
    valid = (src_r >= 0) & (src_r < h) & (src_c >= 0) & (src_c < w)
    src_r = jnp.clip(src_r, 0, h - 1)
    src_c = jnp.clip(src_c, 0, w - 1)

    gathered = jax.vmap(lambda img, r, c: img[r, c])(x, src_r, src_c)
    return jnp.where(valid[..., None], gathered, jnp.zeros((), dtype=x.dtype))


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

"""Device-resident training augmentation (fused into the jitted step).

Equivalent of the reference train transform chain
(GAN_Variant1/dataio/transforms.py:30-47):

  RandomCropResize(scale 0.85–1.0, bicubic) → HFlip(0.5) →
  ColorJitter(0.05, 0.05, 0.05, 0.02) → ToTensor → Normalize to [−1,1]

Differences from the host/PIL version, documented:
- crop offsets are continuous (uniform reals) rather than integer pixel
  offsets — a strict superset of the reference's randomness; the crop+resize
  composition is one `jax.image.scale_and_translate` (antialiased cubic),
  i.e. a single fused resampling matmul per image instead of PIL crop+resize;
- ColorJitter ops apply in the fixed order brightness→contrast→saturation→
  hue (torchvision randomizes the order per call);
- everything is a pure function of the PRNG key ⇒ bitwise reproducible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _luma(x01):
    """torchvision rgb_to_grayscale luma weights."""
    return (
        0.299 * x01[..., 0:1] + 0.587 * x01[..., 1:2] + 0.114 * x01[..., 2:3]
    )


def color_jitter(
    key,
    x01,
    brightness: float = 0.05,
    contrast: float = 0.05,
    saturation: float = 0.05,
    hue: float = 0.02,
):
    """torchvision ColorJitter semantics on [0,1] floats, per-sample factors."""
    b = x01.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    if brightness > 0:
        f = jax.random.uniform(
            kb, (b, 1, 1, 1), minval=1.0 - brightness, maxval=1.0 + brightness
        )
        x01 = jnp.clip(x01 * f, 0.0, 1.0)
    if contrast > 0:
        f = jax.random.uniform(
            kc, (b, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast
        )
        mean = jnp.mean(_luma(x01), axis=(1, 2, 3), keepdims=True)
        x01 = jnp.clip(f * x01 + (1.0 - f) * mean, 0.0, 1.0)
    if saturation > 0:
        f = jax.random.uniform(
            ks, (b, 1, 1, 1), minval=1.0 - saturation, maxval=1.0 + saturation
        )
        gray = _luma(x01)
        x01 = jnp.clip(f * x01 + (1.0 - f) * gray, 0.0, 1.0)
    if hue > 0:
        d = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)
        hsv = _rgb_to_hsv(x01)
        h = (hsv[..., 0] + d) % 1.0
        x01 = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return x01


def _crop_resize_one(img, scale, off_frac_i, off_frac_j, out_size: int):
    """One antialiased cubic crop+resize: crop side = scale·min(H,W) at a
    random offset, resampled to out_size² in a single pass."""
    h, w = img.shape[0], img.shape[1]
    crop = scale * jnp.minimum(h, w).astype(jnp.float32)
    off_i = off_frac_i * (h - crop)
    off_j = off_frac_j * (w - crop)
    zoom = out_size / crop
    scales = jnp.stack([zoom, zoom])
    translation = jnp.stack([-off_i * zoom, -off_j * zoom])
    return jax.image.scale_and_translate(
        img,
        (out_size, out_size, img.shape[2]),
        spatial_dims=(0, 1),
        scale=scales,
        translation=translation,
        method="cubic",
        antialias=True,
    )


def random_crop_resize(
    key, x01, out_size: int, scale_range: tuple[float, float] = (0.85, 1.0)
):
    b = x01.shape[0]
    ks, ki, kj = jax.random.split(key, 3)
    scales = jax.random.uniform(
        ks, (b,), minval=scale_range[0], maxval=scale_range[1]
    )
    off_i = jax.random.uniform(ki, (b,))
    off_j = jax.random.uniform(kj, (b,))
    return jax.vmap(partial(_crop_resize_one, out_size=out_size))(
        x01, scales, off_i, off_j
    )


def random_hflip(key, x):
    flip = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) < 0.5
    return jnp.where(flip, x[:, :, ::-1, :], x)


def train_augment(
    key,
    images_u8,
    image_size: int,
    scale_range: tuple[float, float] = (0.85, 1.0),
    jitter: tuple[float, float, float, float] = (0.05, 0.05, 0.05, 0.02),
):
    """uint8 NHWC batch → augmented float32 batch in [−1, 1]."""
    k_crop, k_flip, k_jit = jax.random.split(key, 3)
    x01 = images_u8.astype(jnp.float32) / 255.0
    x01 = random_crop_resize(k_crop, x01, image_size, scale_range)
    x01 = jnp.clip(x01, 0.0, 1.0)  # cubic resampling can overshoot
    x01 = random_hflip(k_flip, x01)
    x01 = color_jitter(k_jit, x01, *jitter)
    return x01 * 2.0 - 1.0


def cyclegan_augment(key, images_u8, crop_size: int, load_size: int = 286):
    """The Basic_GAN train transform (Basic_GAN/src/data.py:8-23):
    Resize(load_size, bicubic) → RandomCrop(crop_size) → HFlip → [−1,1].
    Host feeds load_size² uint8; the integer-offset random crop and flip run
    on device."""
    b, h, w, c = images_u8.shape
    k_i, k_j, k_flip = jax.random.split(key, 3)
    x01 = images_u8.astype(jnp.float32) / 255.0
    max_i, max_j = h - crop_size, w - crop_size
    off_i = jax.random.randint(k_i, (b,), 0, max_i + 1)
    off_j = jax.random.randint(k_j, (b,), 0, max_j + 1)

    def crop_one(img, i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (crop_size, crop_size, c))

    x01 = jax.vmap(crop_one)(x01, off_i, off_j)
    x01 = random_hflip(k_flip, x01)
    return x01 * 2.0 - 1.0


def eval_transform(images_u8, image_size: int):
    """Deterministic eval transform (transforms.py:58-66): bicubic resize to
    image_size² then normalize to [−1,1]."""
    from gan_variant_research_tpu.ops.resize import resize_bicubic

    x01 = images_u8.astype(jnp.float32) / 255.0
    x01 = jnp.clip(resize_bicubic(x01, (image_size, image_size)), 0.0, 1.0)
    return x01 * 2.0 - 1.0

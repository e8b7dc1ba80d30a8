"""DiffAugment invariants (reference semantics, diffaugment.py:6-106)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_variant_research_tpu.ops.diffaugment import (
    diff_augment,
    rand_brightness,
    rand_contrast,
    rand_cutout,
    rand_saturation,
    rand_translation,
)


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))


def test_brightness_is_bounded_shift(imgs):
    out = rand_brightness(jax.random.key(0), imgs)
    shift = np.asarray(out - imgs)
    per_sample = shift.reshape(4, -1)
    # constant shift per sample, within ±0.5
    assert np.allclose(per_sample, per_sample[:, :1], atol=1e-6)
    assert np.all(np.abs(per_sample) <= 0.5)


def test_saturation_preserves_channel_mean(imgs):
    out = rand_saturation(jax.random.key(1), imgs)
    np.testing.assert_allclose(
        np.asarray(out.mean(axis=3)), np.asarray(imgs.mean(axis=3)), atol=1e-5
    )


def test_contrast_preserves_global_mean(imgs):
    out = rand_contrast(jax.random.key(2), imgs)
    np.testing.assert_allclose(
        np.asarray(out.mean(axis=(1, 2, 3))),
        np.asarray(imgs.mean(axis=(1, 2, 3))),
        atol=1e-5,
    )


def test_translation_zero_fills_and_preserves_content(imgs):
    out = rand_translation(jax.random.key(3), imgs)
    a, b = np.asarray(imgs), np.asarray(out)
    for i in range(4):
        vals_in = set(np.round(a[i].ravel(), 5))
        vals_out = set(np.round(b[i].ravel(), 5)) - {0.0}
        assert vals_out.issubset(vals_in)  # only original pixels + zero fill


def test_translation_exact_shift():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # find a key draw and verify via numpy replication of the index math
    key = jax.random.key(5)
    out = rand_translation(key, x, ratio=0.25)
    kx, ky = jax.random.split(key)
    tx = int(jax.random.randint(kx, (1, 1, 1), -1, 2)[0, 0, 0])
    ty = int(jax.random.randint(ky, (1, 1, 1), -1, 2)[0, 0, 0])
    a = np.asarray(x)[0, :, :, 0]
    want = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            si, sj = i + tx, j + ty
            if 0 <= si < 4 and 0 <= sj < 4:
                want[i, j] = a[si, sj]
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], want)


def test_cutout_zeroes_a_box(imgs):
    out = rand_cutout(jax.random.key(4), jnp.abs(imgs) + 0.1)  # strictly positive
    b = np.asarray(out)
    for i in range(4):
        zero_frac = np.mean(b[i] == 0.0)
        # 16×16 box clamped into 32×32 → between 64 (quarter-visible) and 256 px
        assert 0.0 < zero_frac <= (16 * 16) / (32 * 32) + 1e-6


def test_policy_chain_runs_and_is_deterministic(imgs):
    out1 = diff_augment(jax.random.key(9), imgs, ("color", "translation", "cutout"))
    out2 = diff_augment(jax.random.key(9), imgs, ("color", "translation", "cutout"))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = diff_augment(jax.random.key(10), imgs, ("color", "translation", "cutout"))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_diffaugment_is_differentiable(imgs):
    def f(x):
        return jnp.sum(diff_augment(jax.random.key(0), x, ("color", "translation", "cutout")))

    g = jax.grad(f)(imgs)
    assert np.all(np.isfinite(np.asarray(g)))


def test_empty_policy_is_identity(imgs):
    out = diff_augment(jax.random.key(0), imgs, ())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))

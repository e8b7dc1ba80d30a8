"""Unit tests for ops — including numerical parity against PyTorch (CPU)
for the layer semantics the reference delegates to torch.nn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gan_variant_research_tpu.ops.nn_ops import (
    avg_pool_3x3_s2,
    instance_norm,
    reflect_pad_2d,
)
from gan_variant_research_tpu.ops.color import (
    denormalize,
    get_low_freq_stats,
    normalize_to_unit,
    rgb_to_lab,
    to_uint8,
)
from gan_variant_research_tpu.ops.resize import resize_bicubic, resize_bilinear


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = torch.nn.InstanceNorm2d(5)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(got, _nhwc(want.numpy()), atol=1e-5)


def test_reflect_pad_matches_torch(rng):
    x = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    got = np.asarray(reflect_pad_2d(jnp.asarray(x), 3))
    want = torch.nn.ReflectionPad2d(3)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(got, _nhwc(want.numpy()), atol=0)


def test_avg_pool_matches_torch_count_exclude_pad(rng):
    x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
    got = np.asarray(avg_pool_3x3_s2(jnp.asarray(x)))
    pool = torch.nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)
    want = pool(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(got, _nhwc(want.numpy()), atol=1e-5)


def test_normalize_roundtrip(rng):
    img = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    x = normalize_to_unit(jnp.asarray(img))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    back = to_uint8(x)
    np.testing.assert_array_equal(np.asarray(back), img)
    np.testing.assert_allclose(
        np.asarray(denormalize(x)), img.astype(np.float32) / 255.0, atol=1e-6
    )


def test_rgb_to_lab_known_values():
    # white → L=100, a≈0, b≈0; black → 0,0,0
    img = jnp.asarray(
        np.array([[[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]], dtype=np.float32)
    )
    lab = np.asarray(rgb_to_lab(img))
    np.testing.assert_allclose(lab[0, 0, 0], [100.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lab[0, 0, 1], [0.0, 0.0, 0.0], atol=0.05)


def test_get_low_freq_stats_shapes(rng):
    lab = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    mean, std = get_low_freq_stats(lab, target_size=32)
    assert mean.shape == (2, 3) and std.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(std)))


def test_resize_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 48, 3)).astype(np.float32))
    assert resize_bicubic(x, (32, 32)).shape == (2, 32, 32, 3)
    assert resize_bilinear(x, (299, 299)).shape == (2, 299, 299, 3)


def test_resize_bilinear_upsample_matches_torch(rng):
    # antialias is a no-op on upsampling, so both should agree there
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (16, 16)))
    want = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        size=(16, 16),
        mode="bilinear",
        align_corners=False,
    )
    np.testing.assert_allclose(got, _nhwc(want.numpy()), atol=1e-4)

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


# --------------------------------------------------------------------------- #
# Space-to-depth 7×7 conv (ops/s2d.py): exact reparametrization of the
# generator stem/head convs (GAN_Variant1/models/generator_resnet_attn.py:111,158)

def _conv7x7_direct(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("c,o,hw", [(3, 8, 16), (8, 3, 12), (5, 7, 10)])
def test_conv7x7_s2d_matches_direct(rng, c, o, hw):
    from gan_variant_research_tpu.ops.s2d import conv7x7_s2d

    xp = jnp.asarray(rng.standard_normal((2, hw + 6, hw + 6, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, c, o)).astype(np.float32) * 0.1)
    got = np.asarray(conv7x7_s2d(xp, k))
    want = np.asarray(_conv7x7_direct(xp, k))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv7x7_s2d_gradients_match(rng):
    from gan_variant_research_tpu.ops.s2d import conv7x7_s2d

    xp = jnp.asarray(rng.standard_normal((1, 14, 14, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 4)).astype(np.float32) * 0.1)
    g_s2d = jax.grad(lambda kk: conv7x7_s2d(xp, kk).sum())(k)
    g_dir = jax.grad(lambda kk: _conv7x7_direct(xp, kk).sum())(k)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_dir),
                               atol=1e-4, rtol=1e-4)
    gx_s2d = jax.grad(lambda xx: (conv7x7_s2d(xx, k) ** 2).sum())(xp)
    gx_dir = jax.grad(lambda xx: (_conv7x7_direct(xx, k) ** 2).sum())(xp)
    np.testing.assert_allclose(np.asarray(gx_s2d), np.asarray(gx_dir),
                               atol=1e-3, rtol=1e-3)


def test_conv2d_s2d_flag_parity(rng):
    """Conv2d(s2d=True) == Conv2d(s2d=False): same params, same output; odd
    spatial sizes fall back to the direct path silently."""
    from gan_variant_research_tpu.models.layers import Conv2d

    for hw in (16, 15):  # even → s2d path, odd → fallback
        x = jnp.asarray(rng.standard_normal((2, hw, hw, 3)).astype(np.float32))
        m_ref = Conv2d(8, kernel_size=7, padding=3, s2d=False)
        m_s2d = Conv2d(8, kernel_size=7, padding=3, s2d=True)
        params = m_ref.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(m_s2d.apply(params, x)),
            np.asarray(m_ref.apply(params, x)),
            atol=1e-4, rtol=1e-4)

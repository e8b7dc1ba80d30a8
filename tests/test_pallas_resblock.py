"""Fused pad+conv kernels: forward vs the XLA oracle, gradients vs XLA
autodiff (Pallas interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_variant_research_tpu.ops.pallas.resblock import (
    fused_resblock,
    reflect_conv3x3,
    resblock_reference,
    resblock_supported,
)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 8, 8, 128
    x = rng.standard_normal((n, h, w, c)).astype(np.float32) * 0.5
    w1 = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
    b1 = (rng.standard_normal(c) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(c) * 0.1).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, w1, b1, w2, b2))


def _oracle_conv(x, w, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


def test_supported_predicate():
    assert resblock_supported((16, 64, 64, 256), 256)      # the 256² trunk
    assert not resblock_supported((16, 64, 64, 260), 260)  # lane-misaligned
    assert resblock_supported((16, 32, 32, 256), 256)      # the 128² trunk
    assert not resblock_supported((16, 128, 128, 128), 128)  # VMEM blowout


def test_conv_forward_matches_oracle(inputs):
    x, w1, b1, _, _ = inputs
    got = reflect_conv3x3(x, w1, b1)
    want = _oracle_conv(x, w1, b1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv_gradients_match_oracle(inputs):
    x, w1, b1, _, _ = inputs
    probe = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 8, 128)).astype(np.float32)
    )

    def loss_fused(x, w, b):
        return jnp.sum(reflect_conv3x3(x, w, b) * probe)

    def loss_ref(x, w, b):
        return jnp.sum(_oracle_conv(x, w, b) * probe)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, b1)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, b1)
    for name, a, b in zip(["dx", "dw", "db"], g_fused, g_ref):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=1e-4, err_msg=name)


def test_resblock_forward_matches_reference(inputs):
    x, w1, b1, w2, b2 = inputs
    got = fused_resblock(x, w1, b1, w2, b2)
    want = resblock_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_resblock_gradients_match_reference(inputs):
    x, w1, b1, w2, b2 = inputs
    probe = jnp.asarray(
        np.random.default_rng(5).standard_normal(x.shape).astype(np.float32)
    )

    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_resblock(*a) * probe), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    g_ref = jax.grad(
        lambda *a: jnp.sum(resblock_reference(*a) * probe), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for name, a, b in zip(["dx", "dw1", "db1", "dw2", "db2"], g_fused, g_ref):
        bmax = float(jnp.abs(b).max())
        if bmax < 2e-2:
            # analytically-zero grads (a conv bias is cancelled by the
            # following instance norm) — both sides are float noise
            assert float(jnp.abs(a).max()) < 2e-2, name
            continue
        np.testing.assert_allclose(np.asarray(a) / bmax,
                                   np.asarray(b) / bmax,
                                   atol=5e-4, err_msg=name)


def test_bf16_path(inputs):
    x, w1, b1, w2, b2 = inputs
    got = fused_resblock(x.astype(jnp.bfloat16), w1, b1, w2, b2)
    want = resblock_reference(x, w1, b1, w2, b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.1)

"""Loss unit tests vs analytic values and an independent numpy NCE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_variant_research_tpu.losses import (
    cycle_loss,
    discriminator_hinge_loss,
    gan_loss,
    generator_hinge_loss,
    identity_loss,
    patch_nce_loss,
)
from gan_variant_research_tpu.losses.patchnce import _layer_nce


def test_hinge_d_analytic():
    real = jnp.full((2, 3, 3, 1), 2.0)   # relu(1-2)=0
    fake = jnp.full((2, 3, 3, 1), -2.0)  # relu(1-2)=0
    assert float(discriminator_hinge_loss(real, fake)) == 0.0
    real = jnp.zeros((1, 2, 2, 1))
    fake = jnp.zeros((1, 2, 2, 1))
    # 0.5*(relu(1)+relu(1)) = 1.0
    assert float(discriminator_hinge_loss(real, fake)) == pytest.approx(1.0)


def test_hinge_multiscale_averages():
    preds_r = [jnp.zeros((1, 4, 4, 1)), jnp.full((1, 2, 2, 1), 1.0)]
    preds_f = [jnp.zeros((1, 4, 4, 1)), jnp.full((1, 2, 2, 1), -1.0)]
    # scale0: 1.0; scale1: 0.0 → mean 0.5
    assert float(discriminator_hinge_loss(preds_r, preds_f)) == pytest.approx(0.5)
    assert float(generator_hinge_loss(preds_f)) == pytest.approx((0.0 + 1.0) / 2)


def test_gan_loss_lsgan_bce():
    pred = jnp.zeros((2, 3, 3, 1))
    assert float(gan_loss(pred, True, "lsgan")) == pytest.approx(1.0)
    assert float(gan_loss(pred, False, "lsgan")) == pytest.approx(0.0)
    assert float(gan_loss(pred, True, "bce")) == pytest.approx(np.log(2), rel=1e-5)


def test_l1_losses():
    a = jnp.ones((1, 2, 2, 3))
    b = jnp.zeros((1, 2, 2, 3))
    assert float(identity_loss(a, b)) == pytest.approx(1.0)
    assert float(cycle_loss(a, b, 10.0)) == pytest.approx(10.0)


def test_nce_perfect_alignment_is_low(rng):
    f = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    key = jax.random.key(1)
    aligned = float(patch_nce_loss(key, [f], [f], num_patches=32))
    shuffled = float(
        patch_nce_loss(key, [f], [jnp.roll(f, 3, axis=1)], num_patches=32)
    )
    assert aligned < shuffled
    assert aligned < np.log(32)  # better than uniform over negatives


def test_nce_matches_numpy_reference(rng):
    """Cross-check _layer_nce against an independent numpy implementation
    using the same shared patch ids (reference semantics: one id set across
    batch and src/tgt, patchnce_cut.py:63)."""
    key = jax.random.key(7)
    src = rng.standard_normal((3, 4, 5, 6)).astype(np.float32)
    tgt = rng.standard_normal((3, 4, 5, 6)).astype(np.float32)
    n, tau = 8, 0.07
    got = float(_layer_nce(key, jnp.asarray(src), jnp.asarray(tgt), tau, n))

    ids = np.asarray(jax.random.randint(key, (n,), 0, 20))
    s = src.reshape(3, 20, 6)[:, ids, :]
    t = tgt.reshape(3, 20, 6)[:, ids, :]
    s = s / np.maximum(np.linalg.norm(s, axis=-1, keepdims=True), 1e-6)
    t = t / np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
    total = 0.0
    for b in range(3):
        logits = np.clip(t[b] @ s[b].T / tau, -50, 50)
        logz = np.log(np.exp(logits).sum(axis=1))
        total += np.mean(logz - np.diag(logits))
    want = total / 3
    assert got == pytest.approx(want, rel=1e-5)


def test_nce_multi_layer_average(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 2, 2, 16)).astype(np.float32))
    key = jax.random.key(0)
    loss = patch_nce_loss(key, [f1, f2], [f1, f2], num_patches=4)
    assert np.isfinite(float(loss))


def test_nce_gradient_does_not_flow_to_src(rng):
    f = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    key = jax.random.key(0)

    def loss_wrt_src(src):
        return patch_nce_loss(key, [src], [f * 2.0], num_patches=4)

    g = jax.grad(loss_wrt_src)(f)
    assert float(jnp.abs(g).max()) == 0.0

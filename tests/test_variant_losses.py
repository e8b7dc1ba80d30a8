"""Tests for the re-designed variant losses the reference deleted in its
baseline reversion (Documentation/BASELINE_REVERSION.md §1): feature
matching (losses/feat_matching.py) and the Lab palette prior
(losses/palette_prior.py), plus their wiring into the CUT train step
behind loss_weights.featmatch / loss_weights.palette (default 0 = the
reference baseline, compiled out)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.losses import (
    feature_matching_loss,
    palette_prior_loss,
)
from gan_variant_research_tpu.losses.palette_prior import lab_stats
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

from tests.test_cut_trainer import batches, tiny_config


# --------------------------- feature matching --------------------------- #


def test_feature_matching_manual_value(rng):
    r = [jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32),
         jnp.asarray(rng.normal(size=(2, 2, 2, 8)), jnp.float32)]
    f = [jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32),
         jnp.asarray(rng.normal(size=(2, 2, 2, 8)), jnp.float32)]
    got = float(feature_matching_loss(r, f))
    want = float(np.mean([np.mean(np.abs(np.asarray(a) - np.asarray(b)))
                          for a, b in zip(f, r)]))
    assert got == pytest.approx(want, rel=1e-6)


def test_feature_matching_nested_multiscale_and_zero(rng):
    a = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    nested = [[a, b], [a]]
    assert float(feature_matching_loss(nested, nested)) == 0.0
    with pytest.raises(ValueError):
        feature_matching_loss([[a, b]], [[a]])


def test_feature_matching_gradient_only_through_fake(rng):
    r = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    gr, gf = jax.grad(lambda rr, ff: feature_matching_loss([rr], [ff]),
                      argnums=(0, 1))(r, f)
    assert float(jnp.max(jnp.abs(gr))) == 0.0          # real side stop-grad
    assert float(jnp.max(jnp.abs(gf))) > 0.0
    assert bool(jnp.all(jnp.isfinite(gf)))


# ----------------------------- palette prior ---------------------------- #


def test_palette_prior_zero_on_identical_batches(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)), jnp.float32)
    assert float(palette_prior_loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_palette_prior_detects_palette_shift(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)), jnp.float32)
    # shift toward the red channel: a pure palette change
    shifted = jnp.clip(x + jnp.asarray([0.5, -0.2, -0.2]), -1, 1)
    assert float(palette_prior_loss(shifted, x)) > 1.0


def test_palette_prior_gradient_finite_including_black(rng):
    # black ([-1,-1,-1] → XYZ 0) exercises the cbrt-at-zero gradient guard
    # in ops/color.py::rgb_to_lab
    fake = jnp.full((2, 32, 32, 3), -1.0, jnp.float32)
    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    g_fake, g_tgt = jax.grad(
        lambda f, t: palette_prior_loss(f, t), argnums=(0, 1)
    )(fake, tgt)
    assert bool(jnp.all(jnp.isfinite(g_fake)))
    assert float(jnp.max(jnp.abs(g_tgt))) == 0.0       # target stop-grad


def test_lab_stats_shapes(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (3, 64, 64, 3)), jnp.float32)
    mean, std = lab_stats(x)
    assert mean.shape == (3,) and std.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(mean))) and bool(jnp.all(std >= 0))


# ------------------------- train-step integration ----------------------- #


def test_cut_step_with_variant_losses(rng):
    t = CUTTrainer(tiny_config(loss_weights={
        "adv": 1.0, "patchnce": 1.0,
        "identity_warm": 0.1, "identity_final": 0.0,
        "featmatch": 1.0, "palette": 1.0,
    }))
    state = t.init_state()
    p, m = batches(rng)
    state, losses = t.train_step(state, p, m)
    vals = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["featmatch"] > 0
    assert vals["palette"] > 0
    # the weighted terms are inside g_loss
    assert vals["g_loss"] >= vals["g_adv"] * 0  # finite composition sanity


def test_cut_step_baseline_reports_zero_variant_losses(rng):
    # default weights (featmatch/palette absent → 0) keep the baseline step:
    # the loss keys exist but are compiled-out zeros
    trainer = CUTTrainer(tiny_config())
    state = trainer.init_state()
    p, m = batches(rng)
    _, losses = trainer.train_step(state, p, m)
    assert float(losses["featmatch"]) == 0.0
    assert float(losses["palette"]) == 0.0

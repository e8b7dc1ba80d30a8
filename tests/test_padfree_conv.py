"""Exactness of the pad-free reflect conv (ops/nn_ops.py
::conv3x3_reflect_padfree) against the materialized reflect-pad path.

The rewrite is mathematically identical — the pad ring is linear in
interior rows/cols 1 and H−2/W−2, restored by four border-strip convs —
so forward values AND gradients must agree to float-reordering tolerance
on every pixel (only the 1-px output border even changes summation
order). These tests pin it at the function, res-block, and generator
level (reference semantics: GAN_Variant1/models/generator_resnet_attn.py
:7-71 reflect-padded trunk convs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_variant_research_tpu.models.generator_resnet import (
    ResidualBlock,
    ResNetGenerator,
)
from gan_variant_research_tpu.ops.nn_ops import conv3x3_reflect_padfree


def _ref_conv(x, kernel):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [(2, 8, 8, 5), (1, 6, 10, 3),
                                   (3, 2, 2, 4), (1, 2, 9, 2)])
def test_forward_matches_reflect_pad(shape):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, shape, jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, shape[-1], 7), jnp.float32)
    got = jax.jit(conv3x3_reflect_padfree)(x, kernel)
    want = jax.jit(_ref_conv)(x, kernel)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_match_reflect_pad():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (2, 8, 8, 4), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, 4, 6), jnp.float32)
    ct = jax.random.normal(k3, (2, 8, 8, 6), jnp.float32)

    def loss(fn):
        return lambda x_, k_: jnp.sum(fn(x_, k_) * ct)

    gx, gk = jax.jit(jax.grad(loss(conv3x3_reflect_padfree), (0, 1)))(x, kernel)
    gx_ref, gk_ref = jax.jit(jax.grad(loss(_ref_conv), (0, 1)))(x, kernel)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gk, gk_ref, rtol=1e-4, atol=1e-5)


def test_resblock_pad_free_same_params_same_output():
    """pad_free must not change the param tree or (to reordering
    tolerance) the block output."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16), jnp.float32)
    base = ResidualBlock(16)
    free = ResidualBlock(16, pad_free=True)
    params = jax.jit(base.init)(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(jax.jit(free.init)(
                jax.random.PRNGKey(3), x)))
    out_base = jax.jit(base.apply)(params, x)
    out_free = jax.jit(free.apply)(params, x)
    np.testing.assert_allclose(out_free, out_base, rtol=1e-5, atol=1e-5)


def test_cut_trainer_step_with_pad_free():
    """model.generator.pad_free composes with the full jitted CUT step
    (config plumbing, vjp-shared forward, EMA): finite losses, step
    advances."""
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    from tests.test_cut_trainer import batches, tiny_config

    cfg = tiny_config(model={
        "generator": {"ngf": 4, "n_blocks": 2, "pad_free": True},
        "discriminator": {"ndf": 4, "n_layers": 2, "num_scales": 1},
    })
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()
    p, m = batches(np.random.default_rng(0))
    state, losses = trainer.train_step(state, p, m)
    vals = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert int(state.step) == 1


def test_generator_pad_free_same_output_and_taps():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3), jnp.float32)
    kw = dict(ngf=8, n_blocks=2)
    base = ResNetGenerator(**kw)
    free = ResNetGenerator(pad_free=True, **kw)
    params = jax.jit(base.init)(jax.random.PRNGKey(5), x)
    out_base, taps_base = jax.jit(
        lambda p, x_: base.apply(p, x_, extract=(0, 4)))(params, x)
    out_free, taps_free = jax.jit(
        lambda p, x_: free.apply(p, x_, extract=(0, 4)))(params, x)
    np.testing.assert_allclose(out_free, out_base, rtol=1e-4, atol=1e-4)
    for tb, tf in zip(taps_base, taps_free):
        np.testing.assert_allclose(tf, tb, rtol=1e-4, atol=1e-4)

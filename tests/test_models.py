"""Model tests: shape/dtype at multiple resolutions, torch parity for the
conv primitives, feature-tap semantics, spectral-norm state."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gan_variant_research_tpu.models import (
    MultiscaleDiscriminator,
    PatchGANDiscriminator,
    ResNetGenerator,
    UNetGenerator,
)
from gan_variant_research_tpu.models.layers import Conv2d, ConvTranspose2d


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestConvParity:
    def test_conv2d_matches_torch(self, rng):
        x = rng.standard_normal((2, 10, 10, 3)).astype(np.float32)
        tconv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=2, padding=1)
        mod = Conv2d(features=8, kernel_size=4, strides=2, padding=1)
        params = mod.init(jax.random.key(0), jnp.asarray(x))
        # load torch weights: OIHW → HWIO
        w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
        params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        want = _nhwc(tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_convtranspose2d_matches_torch(self, rng):
        """k=3, s=2, p=1, output_padding=1 — the generator upsampler
        (generator_resnet_attn.py:146)."""
        x = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=1, output_padding=1)
        mod = ConvTranspose2d(features=6, kernel_size=3, strides=2, padding=1, output_padding=1)
        # torch weight (in, out, kh, kw) → our correlation kernel HWIO flipped
        w = tconv.weight.detach().numpy()  # (4, 6, 3, 3)
        k = np.flip(w.transpose(2, 3, 0, 1), axis=(0, 1)).copy()  # (3,3,4,6)
        params = {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        want = _nhwc(tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
        assert got.shape == want.shape == (2, 14, 18, 6)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestResNetGenerator:
    @pytest.mark.parametrize("size", [64, 128])
    def test_output_shape_and_range(self, size, rng):
        g = ResNetGenerator(ngf=8, n_blocks=2)
        x = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
        params = g.init(jax.random.key(0), x)
        y = g.apply(params, x)
        assert y.shape == (1, size, size, 3)
        assert float(jnp.abs(y).max()) <= 1.0

    def test_feature_taps_match_reference_indexing(self, rng):
        """nce_layers [0,4,8,12,16] on a 9-block/2-down generator must yield
        exactly 4 taps (ids 0..13 exist; 16 silently skipped — reference
        get_feature_layers semantics, generator_resnet_attn.py:190-235)."""
        g = ResNetGenerator(ngf=4, n_blocks=9)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = g.init(jax.random.key(0), x)
        y, feats = g.apply(params, x, extract=(0, 4, 8, 12, 16))
        assert y.shape == (1, 32, 32, 3)
        assert len(feats) == 4
        # id 0 = stem (H, ngf); id 4 = res block #1 (H/4, 4ngf);
        # id 8 = res block #5; id 12 = first upsample ReLU (H/2, 2ngf)
        assert feats[0].shape == (1, 32, 32, 4)
        assert feats[1].shape == (1, 8, 8, 16)
        assert feats[2].shape == (1, 8, 8, 16)
        assert feats[3].shape == (1, 16, 16, 8)

    def test_taps_consistent_with_plain_forward(self, rng):
        g = ResNetGenerator(ngf=4, n_blocks=2)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
        params = g.init(jax.random.key(0), x)
        y_plain = g.apply(params, x)
        y_tap, feats = g.apply(params, x, extract=(0,))
        np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_tap), atol=1e-6)

    def test_variant_flags_build_working_modules(self):
        """The reference's deleted experimental flags are working opt-in
        variants here (models/attention.py); deep coverage lives in
        tests/test_attention_variants.py."""
        g = ResNetGenerator(ngf=4, n_blocks=2, use_attention=True,
                            attn_layers=(0,))
        params = g.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        assert "attn_0" in params["params"]


class TestDiscriminator:
    def test_patchgan_logit_map_size(self, rng):
        """70×70 PatchGAN: 256² input → 30×30 logit map (4 convs: s2,s2,s2,s1
        with k4 p1, then 1-channel head)."""
        d = PatchGANDiscriminator(ndf=8)
        x = jnp.zeros((2, 256, 256, 3), jnp.float32)
        params = d.init(jax.random.key(0), x)
        y = d.apply(params, x)
        assert y.shape == (2, 30, 30, 1)

    def test_matches_torch_layer_stack_shapes(self):
        # cross-check against a torch mirror of the same topology
        tlayers = torch.nn.Sequential(
            torch.nn.Conv2d(3, 8, 4, 2, 1), torch.nn.LeakyReLU(0.2),
            torch.nn.Conv2d(8, 16, 4, 2, 1), torch.nn.LeakyReLU(0.2),
            torch.nn.Conv2d(16, 32, 4, 2, 1), torch.nn.LeakyReLU(0.2),
            torch.nn.Conv2d(32, 64, 4, 1, 1), torch.nn.LeakyReLU(0.2),
            torch.nn.Conv2d(64, 1, 4, 1, 1),
        )
        want = tlayers(torch.zeros(1, 3, 128, 128)).shape
        d = PatchGANDiscriminator(ndf=8)
        params = d.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
        got = d.apply(params, jnp.zeros((1, 128, 128, 3))).shape
        assert (got[0], got[3], got[1], got[2]) == tuple(want)

    def test_multiscale_returns_pyramid(self):
        d = MultiscaleDiscriminator(ndf=8, num_scales=3)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        params = d.init(jax.random.key(0), x)
        outs = d.apply(params, x)
        assert len(outs) == 3
        assert outs[0].shape[1] > outs[1].shape[1] > outs[2].shape[1]

    def test_spectral_norm_state_updates(self):
        d = PatchGANDiscriminator(ndf=8, use_spectral_norm=True)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        variables = d.init(jax.random.key(0), x)
        assert "spectral" in variables
        y1, mutated = d.apply(variables, x, update_sn=True, mutable=["spectral"])
        u_before = jax.tree_util.tree_leaves(variables["spectral"])[0]
        u_after = jax.tree_util.tree_leaves(mutated["spectral"])[0]
        assert not np.allclose(np.asarray(u_before), np.asarray(u_after))
        # without update_sn the state must be preserved
        y2 = d.apply(variables, x, update_sn=False)
        assert np.all(np.isfinite(np.asarray(y2)))

    def test_spectral_norm_bounds_singular_value(self, rng):
        """After normalization the weight's top singular value ≈ 1."""
        from gan_variant_research_tpu.ops.spectral_norm import spectral_normalize

        k = jnp.asarray(rng.standard_normal((4, 4, 8, 16)).astype(np.float32)) * 3.0
        u = jnp.asarray(rng.standard_normal(16).astype(np.float32))
        u = u / jnp.linalg.norm(u)
        for _ in range(50):  # power-iterate to convergence
            k_sn, u = spectral_normalize(k, u, update=True)
        w = np.asarray(k_sn).reshape(-1, 16)
        sigma = np.linalg.svd(w, compute_uv=False)[0]
        assert abs(sigma - 1.0) < 1e-2


class TestUNet:
    def test_unet_shape_and_range(self, rng):
        g = UNetGenerator(ngf=8)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        params = g.init(jax.random.key(0), x)
        y = g.apply(params, x)
        assert y.shape == (1, 64, 64, 3)
        assert float(jnp.abs(y).max()) <= 1.0

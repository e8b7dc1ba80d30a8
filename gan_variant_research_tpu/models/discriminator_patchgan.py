"""70×70 PatchGAN discriminator and multiscale wrapper (NHWC).

Capability match of both reference discriminators:

- GAN_Variant1/models/discriminator_patchgan.py:7-128 — norm-free PatchGAN
  (4×4 stride-2 convs, LeakyReLU 0.2, 1-channel logit map), optional
  per-layer spectral norm, ``MultiscaleDiscriminator`` with an
  AvgPool2d(3,2,1) pyramid returning a list of logit maps, and
  ``get_intermediate_features`` taps for (unused) feature matching.
- Basic_GAN/src/models.py:68-107 — same topology with InstanceNorm after
  the middle convs (bias-free there, like torch norm-preceded convs).

Select with ``norm='none'`` (Variant1) or ``norm='instance'`` (Basic_GAN).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.models.layers import Conv2d
from gan_variant_research_tpu.ops.nn_ops import instance_norm, avg_pool_3x3_s2


class PatchGANDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "none"            # 'none' (Variant1) | 'instance' (Basic_GAN)
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        update_sn: bool = False,
        extract_features: bool = False,
    ):
        """Returns the (B, H', W', 1) logit map; with
        ``extract_features=True`` returns (logits, [post-LeakyReLU feats])
        (reference get_intermediate_features, discriminator_patchgan.py:60-71).
        """
        lrelu = lambda h: jax.nn.leaky_relu(h, 0.2)
        use_in = self.norm == "instance"
        kw = dict(
            kernel_size=4,
            padding=1,
            use_spectral_norm=self.use_spectral_norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        feats = []
        x = x.astype(self.dtype)

        # Stem: conv s2 + LeakyReLU, never normed, bias always on
        h = Conv2d(self.ndf, strides=2, use_bias=True, name="conv_0", **kw)(
            x, update_sn=update_sn
        )
        h = lrelu(h)
        feats.append(h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = Conv2d(
                self.ndf * nf_mult, strides=2, use_bias=not use_in,
                name=f"conv_{n}", **kw,
            )(h, update_sn=update_sn)
            if use_in:
                h = instance_norm(h)
            h = lrelu(h)
            feats.append(h)

        nf_mult = min(2 ** self.n_layers, 8)
        h = Conv2d(
            self.ndf * nf_mult, strides=1, use_bias=not use_in,
            name=f"conv_{self.n_layers}", **kw,
        )(h, update_sn=update_sn)
        if use_in:
            h = instance_norm(h)
        h = lrelu(h)
        feats.append(h)

        # Output: 1-channel logits, no activation (hinge/lsgan take raw logits)
        logits = Conv2d(1, strides=1, use_bias=True, name="conv_out", **kw)(
            h, update_sn=update_sn
        )
        if logits.shape[1] == 0 or logits.shape[2] == 0:
            raise ValueError(
                f"PatchGAN logit map is empty ({logits.shape}) — input "
                f"{x.shape[1]}×{x.shape[2]} is too small for n_layers="
                f"{self.n_layers}; reduce n_layers or increase image size."
            )
        if extract_features:
            return logits, feats
        return logits


class MultiscaleDiscriminator(nn.Module):
    """N PatchGANs on an AvgPool(3,2,1) pyramid; returns a list of logit
    maps (discriminator_patchgan.py:75-128). The baseline config uses
    num_scales=1 (configs/train_gan_cutpp.yaml:68-72)."""

    ndf: int = 64
    n_layers: int = 3
    num_scales: int = 1
    norm: str = "none"
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        update_sn: bool = False,
        extract_features: bool = False,
    ):
        """With ``extract_features=True`` returns (logit maps, per-scale
        lists of intermediate features) — the multiscale analog of the
        reference's ``get_intermediate_features``
        (discriminator_patchgan.py:60-71,120-128), consumed by the
        feature-matching loss (losses/feat_matching.py)."""
        outputs = []
        feats = []
        h = x
        for i in range(self.num_scales):
            if i > 0:
                h = avg_pool_3x3_s2(h)
            d = PatchGANDiscriminator(
                ndf=self.ndf,
                n_layers=self.n_layers,
                norm=self.norm,
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"scale_{i}",
            )
            if extract_features:
                logits, f = d(h, update_sn=update_sn, extract_features=True)
                outputs.append(logits)
                feats.append(f)
            else:
                outputs.append(d(h, update_sn=update_sn))
        if extract_features:
            return outputs, feats
        return outputs

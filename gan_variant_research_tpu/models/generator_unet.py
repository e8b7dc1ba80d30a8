"""U-Net generator — the TF/Keras notebook lineage (NHWC).

Capability match of ``build_generator`` in GAN_baseline_Sujit.ipynb cell 4:
7×7 stem (64) → 4× stride-2 downsample (128, 256, 512, 512; 256→16 spatial)
→ two 3×3 conv bottleneck (512) → 4× stride-2 transposed-conv upsample with
skip concatenations and 3×3 reduce convs (512, 256, 128, 64) → 7×7 conv to
3 channels + tanh. Instance normalization here is the notebook's *affine*
variant (learnable gamma/beta, cell 2), unlike the ResNet lineage's
affine-free one. 'same' padding semantics follow Keras (asymmetric low/high
padding for stride-2)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_DIMS = ("NHWC", "HWIO", "NHWC")


class AffineInstanceNorm(nn.Module):
    """Per-instance spatial normalization with learnable scale/shift
    (notebook InstanceNormalization layer, eps 1e-5)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = gamma.astype(jnp.float32) * out + beta.astype(jnp.float32)
        return out.astype(x.dtype)


class _SameConv(nn.Module):
    """Keras Conv2D(padding='same') with glorot-uniform init."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class UNetGenerator(nn.Module):
    ngf: int = 64
    output_nc: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        norm = lambda h: AffineInstanceNorm(**kw)(h)
        relu = jax.nn.relu
        x = x.astype(self.dtype)

        def down(h, filters):
            h = _SameConv(filters, 3, strides=2, **kw)(h)
            return relu(norm(h))

        def up(h, filters):
            h = nn.ConvTranspose(
                filters,
                (3, 3),
                strides=(2, 2),
                padding="SAME",
                kernel_init=nn.initializers.glorot_uniform(),
                **kw,
            )(h)
            return relu(norm(h))

        def reduce(h, filters):
            h = _SameConv(filters, 3, strides=1, **kw)(h)
            return relu(norm(h))

        # Encoder
        e1 = relu(norm(_SameConv(self.ngf, 7, **kw)(x)))            # H,   64
        e2 = down(e1, self.ngf * 2)                                  # H/2, 128
        e3 = down(e2, self.ngf * 4)                                  # H/4, 256
        e4 = down(e3, self.ngf * 8)                                  # H/8, 512
        e5 = down(e4, self.ngf * 8)                                  # H/16,512

        # Bottleneck: two 3×3 convs at 512
        b = relu(norm(_SameConv(self.ngf * 8, 3, **kw)(e5)))
        b = relu(norm(_SameConv(self.ngf * 8, 3, **kw)(b)))

        # Decoder with skip concats + reduce convs
        d1 = up(b, self.ngf * 8)
        d1 = reduce(jnp.concatenate([d1, e4], axis=-1), self.ngf * 8)
        d2 = up(d1, self.ngf * 4)
        d2 = reduce(jnp.concatenate([d2, e3], axis=-1), self.ngf * 4)
        d3 = up(d2, self.ngf * 2)
        d3 = reduce(jnp.concatenate([d3, e2], axis=-1), self.ngf * 2)
        d4 = up(d3, self.ngf)
        d4 = reduce(jnp.concatenate([d4, e1], axis=-1), self.ngf)

        out = _SameConv(self.output_nc, 7, **kw)(d4)
        return jnp.tanh(out)

"""Space-to-depth reformulation of the 7×7 stride-1 stem/head convolutions.

The generator's 7×7 convs touch 3-channel tensors (stem: 3→ngf, head:
ngf→3; GAN_Variant1/models/generator_resnet_attn.py:111,158). On the MXU a
3-deep (or 3-wide) contraction wastes >95% of the systolic array — profiled
at 4-12 TF/s vs 175-183 TF/s for the res-trunk convs on a v5e, ~39 ms of a
238 ms train step.

This module rewrites the op exactly (same parameters, same math, different
schedule): a factor-2 space-to-depth turns the 7×7 conv over C channels
into a single 4×4 conv over 4C channels producing 4·O channels, followed by
a free depth-to-space (reshape/transpose). Contraction depth grows 147→192
(stem) and output width 3→12 (head), both much closer to MXU-native tiling.
The kernel transform is a gather over the original (7,7,C,O) weight — the
parameter layout (and thus checkpoints, EMA, the torch importer) is
unchanged, and gradients flow through the linear transform exactly.

Derivation: output pixel (2p+oi, 2q+oj) = Σ_{di,dj,c} x[2p+oi+di, 2q+oj+dj, c]
· w[di,dj,c,·] with di,dj ∈ [0,6] on the padded input. Writing the padded
input in s2d coordinates x'[p, q, (t,tj,c)] = x[2p+t, 2q+tj, c], each
(oi,oj) output parity is a 4×4 conv with kernel entries w[2s+t−oi, 2sj+tj−oj]
(zero where the index leaves [0,6]) — so one conv computes all four parities
as 4·O output channels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# gather indices: ih[s, t, oi] = 2s + t − oi + 1 into the (1,2)-zero-padded
# kernel (index 0 and 8..9 are the zero taps)
_IH = (2 * np.arange(4)[:, None, None]
       + np.arange(2)[None, :, None]
       - np.arange(2)[None, None, :] + 1)  # (4, 2, 2), values in [0, 8]


def _kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, O) → (4, 4, 4C, 4O) s2d kernel (exact reparametrization)."""
    c, o = w.shape[2], w.shape[3]
    w10 = jnp.pad(w, ((1, 2), (1, 2), (0, 0), (0, 0)))
    # (s,t,oi) × (sj,tj,oj) gather → (4,2,2, 4,2,2, C, O)
    g = w10[_IH[:, :, :, None, None, None], _IH[None, None, None, :, :, :]]
    # → (s, sj, t, tj, C, oi, oj, O) → (4, 4, (t,tj,C), (oi,oj,O))
    g = g.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return g.reshape(4, 4, 4 * c, 4 * o)


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/2, W/2, 4C), channel order (t, tj, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(y: jnp.ndarray, o: int) -> jnp.ndarray:
    """(N, H/2, W/2, 4O) with channel order (oi, oj, o) → (N, H, W, O)."""
    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, o)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, o)


def conv7x7_s2d_supported(padded_shape) -> bool:
    """True iff a VALID 7×7 conv over an input of this (already padded)
    (N, H+6, W+6, …) shape has an even output — the s2d schedule's only
    requirement. Even Hp ⇔ even Hp−6 = H."""
    return padded_shape[1] % 2 == 0 and padded_shape[2] % 2 == 0


def conv7x7_s2d(x_padded: jnp.ndarray, kernel: jnp.ndarray,
                dtype=None) -> jnp.ndarray:
    """7×7 stride-1 VALID conv of an already (+3,+3)-padded input, computed
    via space-to-depth. ``x_padded``: (N, H+6, W+6, C) with H, W even;
    ``kernel``: (7, 7, C, O). Returns (N, H, W, O). Bias is NOT added."""
    n, hp, wp, c = x_padded.shape
    h, w = hp - 6, wp - 6
    o = kernel.shape[3]
    dtype = dtype or x_padded.dtype
    # zero-pad to even (the padded taps multiply the kernel's zero row/col)
    x_pad = jnp.pad(x_padded, ((0, 0), (0, 2), (0, 2), (0, 0)))
    xs = _space_to_depth(x_pad)                      # (N, H/2+4, W/2+4, 4C)
    ks = _kernel_s2d(kernel).astype(dtype)           # (4, 4, 4C, 4O)
    y = jax.lax.conv_general_dilated(
        xs.astype(dtype), ks, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )                                                # (N, H/2+1, W/2+1, 4O)
    y = y[:, : h // 2, : w // 2, :]
    return _depth_to_space(y, o)

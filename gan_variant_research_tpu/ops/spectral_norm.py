"""Spectral normalization with explicit power-iteration state.

torch.nn.utils.spectral_norm keeps a persistent ``u`` buffer and does one
power iteration per forward (used by the reference discriminators,
GAN_Variant1/models/discriminator_patchgan.py:23, Basic_GAN/src/models.py:71).
Inside jit there is no hidden state, so ``u`` lives in a flax variable
collection ('spectral') threaded through the train state and updated with
``mutable=['spectral']`` during training steps — SURVEY.md §7 hard part #2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(kernel: jnp.ndarray, u: jnp.ndarray, update: bool):
    """One power iteration on an HWIO conv kernel.

    The kernel is viewed as a (out, in*kh*kw) matrix like torch (which
    reshapes its OIHW weight to (O, −1)). Returns (normalized kernel, new u).
    Computation in fp32; gradients do not flow through u/σ's power vectors
    (torch detaches u and v).
    """
    k32 = kernel.astype(jnp.float32)
    out_c = k32.shape[-1]
    w_mat = k32.reshape(-1, out_c).T  # (O, HWI)

    u0 = jax.lax.stop_gradient(u)
    v = _l2_normalize(jax.lax.stop_gradient(w_mat).T @ u0)
    u_new = _l2_normalize(jax.lax.stop_gradient(w_mat) @ v)
    if not update:
        u_new = u0
    sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u_new), w_mat, jax.lax.stop_gradient(v))
    w_sn = k32 / sigma
    return w_sn.astype(kernel.dtype), u_new

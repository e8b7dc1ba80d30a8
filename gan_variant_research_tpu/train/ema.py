"""Exponential moving average over a parameter pytree.

Same recursion as the reference EMA (GAN_Variant1/utils/io_ckpt.py:23-29):
shadow ← (1−decay)·param + decay·shadow, applied every step inside the
donated jitted train step via a tree_map (SURVEY.md §2.4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Shadow starts as a copy of the params (io_ckpt.py:18-21)."""
    return jax.tree_util.tree_map(lambda p: p, params)


def ema_update(shadow, params, decay: float):
    return jax.tree_util.tree_map(
        lambda s, p: (1.0 - decay) * p + decay * s, shadow, params
    )

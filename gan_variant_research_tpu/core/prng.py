"""PRNG key discipline.

The reference seeds four independent stateful RNGs (python/numpy/torch
CPU/CUDA, GAN_Variant1/utils/seed_dist.py:7-16). Here a single root
``jax.random`` key is folded with the step index and split into named
streams, so every stochastic choice in a step (patch sampling, DiffAugment,
crops/flips/jitter, unpaired sampling) is a pure function of
``(seed, step)`` — reproducible by construction and safe under jit/shard_map.
"""

from __future__ import annotations

import jax


def key_for_step(base_key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the per-step key: fold the step counter into the run key."""
    return jax.random.fold_in(base_key, step)


def step_keys(base_key: jax.Array, step: jax.Array | int, names: tuple[str, ...]) -> dict:
    """Split the per-step key into a dict of named independent streams.

    Stream identity depends only on position in ``names``; keep call sites
    using a stable tuple so checkpoint-resume reproduces the same streams.
    """
    k = key_for_step(base_key, step)
    keys = jax.random.split(k, len(names))
    return {name: keys[i] for i, name in enumerate(names)}


def device_fold(key: jax.Array, axis_name: str) -> jax.Array:
    """Fold the mesh position into a key (inside shard_map/pmap), giving each
    device an independent stream for per-shard randomness (e.g. DiffAugment
    on its local batch shard)."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))

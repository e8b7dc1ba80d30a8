"""Persistent XLA compilation cache.

A cold compile of the full CUT train step takes ~3 min on the axon-tunneled
TPU host (and ~1 min on the CI CPU); the persistent cache turns every
subsequent process's compile into a ~1 s disk read. Enabled by all entry
points (bench, CLIs, driver hooks, tests). The cache key is the HLO
fingerprint, so identical programs from different trainer instances hit too.

The reference has no analog (PyTorch eager + cuDNN autotune persist nothing);
this is the XLA-native replacement for ``cudnn.benchmark``
(Basic_GAN/src/utils.py:11 — SURVEY.md §2.4 "cuDNN benchmark autotune").
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_active_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX's compilation cache at ``cache_dir``
    (default: ``<repo>/.jax_cache``). Safe to call before or after the first
    jax import, but must run before the first compilation to be effective.
    Returns the directory that is ACTUALLY active: the first call wins, and a
    later call with a different dir reconfigures JAX to it (programs compiled
    before that point stay in the old dir)."""
    global _active_dir
    import jax

    cache_dir = cache_dir or os.environ.get("GVR_JAX_CACHE_DIR", _DEFAULT_DIR)
    if _active_dir == cache_dir:
        return _active_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _active_dir = cache_dir
    return _active_dir

"""Deterministic weight/input generation for the golden pool3 tripwire.

Weights are filled from numpy PCG64 streams keyed by each leaf's tree path —
stable across numpy versions by NEP 19's stream-compatibility policy and
completely torch-free, so the committed golden features pin the JAX
InceptionV3 graph numerics even if the torch dep disappears (VERDICT r2
next #3; golden-artifact philosophy per EVAL/IMPLEMENTATION_NOTES.md:185-188).
The fill distributions mirror tests/torch_inception_ref.randomize_ (He conv
kernels, well-conditioned BN stats) so activations stay O(1) through the
~90-conv stack.
"""

from __future__ import annotations

import zlib

import numpy as np


def _leaf_rng(path: str, seed: int) -> np.random.Generator:
    return np.random.default_rng((zlib.crc32(path.encode()) << 8) ^ seed)


def _fill(path: str, leaf, seed: int) -> np.ndarray:
    rng = _leaf_rng(path, seed)
    shape = leaf.shape
    name = path.rsplit("/", 1)[-1]
    if name == "conv_kernel":
        kh, kw, in_c, _ = shape
        std = (2.0 / (kh * kw * in_c)) ** 0.5
        return rng.normal(0.0, std, shape).astype(np.float32)
    if name == "bn_scale":
        return rng.uniform(0.9, 1.1, shape).astype(np.float32)
    if name == "bn_bias":
        return rng.normal(0.0, 0.05, shape).astype(np.float32)
    if name == "bn_mean":
        return rng.normal(0.0, 0.1, shape).astype(np.float32)
    if name == "bn_var":
        return rng.uniform(0.9, 1.1, shape).astype(np.float32)
    raise ValueError(f"Unexpected Inception param leaf: {path}")


def deterministic_params(seed: int = 0) -> dict:
    """A full InceptionV3FID param tree from version-stable numpy streams."""
    import jax
    import jax.numpy as jnp

    from gan_variant_research_tpu.evalsuite.inception import InceptionV3FID

    template = jax.eval_shape(
        lambda: InceptionV3FID().init(
            jax.random.key(0), jnp.zeros((1, 96, 96, 3), jnp.float32)
        )
    )["params"]

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        return _fill(path, node, seed)

    return walk(template, "")


def golden_inputs(seed: int = 0, n: int = 2, size: int = 96) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (n, size, size, 3), dtype=np.uint8
    )

"""Mixed-precision policy for TPU.

The reference uses CUDA AMP: fp16 autocast + GradScaler + unscale-clip
(GAN_Variant1/utils/amp_utils.py:5-41). On TPU the idiomatic equivalent is
bfloat16 compute with fp32 parameters and **no loss scaling** (bf16 has the
fp32 exponent range). The reference's fp32 islands are preserved at call
sites: the identity loss (losses/identity_l1.py:18) and the R1 penalty
(training/train_cutpp.py:179) run in fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _cast_floating(tree, dtype):
    def cast(x):
        # by dtype, not isinstance: host-side trees (e.g. checkpoint
        # restores) carry np.ndarray leaves, which are not jax Arrays —
        # an isinstance(jnp.ndarray) check would silently skip them
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


@dataclasses.dataclass(frozen=True)
class Policy:
    """Precision policy: params stored in ``param_dtype``, forward/backward
    run in ``compute_dtype``; losses are reduced in fp32."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @property
    def enabled(self) -> bool:
        return self.compute_dtype != self.param_dtype

    def cast_to_compute(self, tree):
        return _cast_floating(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return _cast_floating(tree, self.param_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_from_config(config: dict) -> Policy:
    """Resolve the policy from ``runtime.precision`` (default bf16, matching
    the reference's amp: true default, configs/train_gan_cutpp.yaml:131)."""
    runtime = config.get("runtime") or {}
    name = runtime.get("precision")
    if name is None:
        if "amp" in config:
            amp = config["amp"]
        elif "training" in config and "amp" in config["training"]:  # CycleGAN shape
            amp = config["training"]["amp"]
        else:
            amp = (config.get("io") or {}).get("amp", True)
        name = "bf16" if amp else "fp32"
    name = str(name).lower()
    if name in ("bf16", "bfloat16", "amp", "mixed"):
        return DEFAULT_POLICY
    if name in ("fp32", "float32", "full"):
        return FP32_POLICY
    raise ValueError(f"Unknown precision policy: {name!r}")

"""Core runtime: config loading/overrides/validation, PRNG streams,
precision policy."""

from gan_variant_research_tpu.core.config import (
    load_config,
    override_config,
    validate_config,
    ConfigError,
)
from gan_variant_research_tpu.core.prng import step_keys, key_for_step
from gan_variant_research_tpu.core.precision import Policy, DEFAULT_POLICY

__all__ = [
    "load_config",
    "override_config",
    "validate_config",
    "ConfigError",
    "step_keys",
    "key_for_step",
    "Policy",
    "DEFAULT_POLICY",
]

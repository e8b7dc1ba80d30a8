"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set the environment before the first jax import anywhere in the test
session (SURVEY.md §4: the TPU-world analog of a fake multi-node backend).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone does not override an externally-selected platform plugin
# (e.g. the axon TPU tunnel), so force it through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: identical programs built by different trainer
# instances (and by successive test runs) hit the on-disk cache instead of
# recompiling — the dominant cost of this suite on a 1-core host.
from gan_variant_research_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

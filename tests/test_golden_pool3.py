"""Golden pool3 drift tripwire (VERDICT r2 next #3).

The committed ``tests/golden/pool3_features.npz`` pins the numeric behavior
of the JAX InceptionV3 FID graph: deterministic (numpy-stream) weights +
fixed uint8 inputs → fixed 2048-d features. Unlike test_inception_parity
this needs NO torch — any future refactor of evalsuite/inception.py that
drifts the math fails here loudly even if the torch mirror is unavailable.
Regenerate deliberately with scripts/make_golden_pool3.py.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from gan_variant_research_tpu.evalsuite.inception import (
    InceptionV3FID,
    preprocess_uint8,
)
from tests.golden_pool3 import deterministic_params, golden_inputs

GOLDEN = Path(__file__).parent / "golden" / "pool3_features.npz"


def test_pool3_features_match_golden():
    assert GOLDEN.exists(), (
        "Golden artifact missing — run scripts/make_golden_pool3.py and "
        "commit tests/golden/pool3_features.npz"
    )
    want = np.load(GOLDEN)["features"]

    params = deterministic_params(seed=0)
    got = np.asarray(
        InceptionV3FID().apply(
            {"params": params}, preprocess_uint8(jnp.asarray(golden_inputs(seed=0)))
        )
    )
    assert got.shape == want.shape == (2, 2048)
    scale = float(np.abs(want).max())
    # tolerance covers backend/fusion reassociation, not semantic drift
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0), rtol=2e-4)


def test_deterministic_params_are_reproducible():
    """The weight streams themselves must be stable call-to-call (they feed
    both this tripwire and any future cross-version comparison)."""
    a = deterministic_params(seed=0)
    b = deterministic_params(seed=0)
    leaves_a = [x for x in _leaves(a)]
    leaves_b = [x for x in _leaves(b)]
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(x, y)


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v

"""Regenerate the golden pool3 feature artifact (tests/golden/pool3_features.npz).

Run ONLY when an intentional numeric change to evalsuite/inception.py is
being made; the committed npz is a drift tripwire (see
tests/test_golden_pool3.py). Usage: python scripts/make_golden_pool3.py
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from gan_variant_research_tpu.evalsuite.inception import (
        InceptionV3FID,
        preprocess_uint8,
    )
    from golden_pool3 import deterministic_params, golden_inputs

    params = deterministic_params(seed=0)
    u8 = golden_inputs(seed=0)
    feats = np.asarray(
        InceptionV3FID().apply({"params": params}, preprocess_uint8(jnp.asarray(u8)))
    )
    out = REPO / "tests" / "golden" / "pool3_features.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, features=feats.astype(np.float32))
    print(f"Wrote {out}: shape {feats.shape}, "
          f"mean {feats.mean():.6f}, std {feats.std():.6f}")


if __name__ == "__main__":
    main()

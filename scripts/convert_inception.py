#!/usr/bin/env python
"""Convert the canonical FID InceptionV3 torch checkpoint
(pt_inception-2015-12-05-6726825d.pth, as used by pytorch-fid /
torch-fidelity / torchmetrics) to a flat .npz the eval suite loads fast.

Usage:
    python scripts/convert_inception.py input.pth output.npz
"""

import sys
from pathlib import Path

# invocable as `python scripts/convert_inception.py` from anywhere
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(1)
    src, dst = sys.argv[1], sys.argv[2]

    from gan_variant_research_tpu.evalsuite.inception import (
        InceptionFID,
        load_torch_inception_weights,
        save_converted_weights,
    )

    import numpy as np

    params = load_torch_inception_weights(src)
    # validate the tree (paths AND leaf shapes) against the architecture,
    # then smoke-run a deterministic batch before blessing the .npz — a
    # tampered/truncated .pth must fail HERE, not silently mis-anchor every
    # FID/MiFID score downstream (deploy_day.sh pins the download's SHA256
    # prefix; this is the semantic half of that check)
    net = InceptionFID(None, allow_random=True)
    net.params = params
    net._validate_params()
    rng = np.random.default_rng(0)
    feats = net.features_u8(
        rng.integers(0, 256, (4, 299, 299, 3), dtype=np.uint8))
    if feats.shape != (4, 2048) or not np.all(np.isfinite(feats)):
        raise SystemExit(
            f"smoke batch failed: shape={feats.shape}, "
            f"finite={bool(np.all(np.isfinite(feats)))}")
    if float(np.abs(feats).max()) == 0.0:
        raise SystemExit("smoke batch produced all-zero features")
    save_converted_weights(params, dst)
    print(f"Converted {src} -> {dst} "
          f"(smoke batch OK: pool3 mean {float(feats.mean()):.4f})")


if __name__ == "__main__":
    main()

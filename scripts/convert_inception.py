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

    params = load_torch_inception_weights(src)
    # validates the tree against the architecture and smoke-runs a batch
    net = InceptionFID(None, allow_random=True)
    net.params = params
    net._validate_params()
    save_converted_weights(params, dst)
    print(f"Converted {src} -> {dst}")


if __name__ == "__main__":
    main()

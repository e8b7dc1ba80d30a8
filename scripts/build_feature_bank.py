#!/usr/bin/env python
"""Build the target-domain feature bank for the repulsion loss / inline
metrics (the deleted ``build_clip_features_if_needed()`` as a turn-key CLI
— see train/feature_bank.py).

Embeds every image in a folder with the in-tree InceptionV3 pool3 net and
writes the npz bank that ``clip_features.monet_feats_path`` points at,
optionally also a ``distance_margin.json``: the margin defaults to the
p5 quantile of the bank's own leave-one-out nearest-neighbor distances —
fakes closer to a training image than 95% of training images are to each
other are flagged as memorized.

Usage:
    python scripts/build_feature_bank.py --images data/monet_jpg \
        --out artifacts/monet_bank.npz \
        --inception-weights pt_inception.npz \
        [--margin-out artifacts/distance_margin.json] [--batch-size 64]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# invocable as `python scripts/build_feature_bank.py` from anywhere
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True,
                    help="target-domain folder or TFRecord shards")
    ap.add_argument("--out", required=True, help="output bank .npz")
    ap.add_argument("--inception-weights", default=None,
                    help="converted FID weights (.npz) or torch .pth")
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="random inception init — pipeline tests ONLY")
    ap.add_argument("--margin-out", default=None,
                    help="also write a distance_margin.json here")
    ap.add_argument("--margin-quantile", type=float, default=0.05,
                    help="bank NN-distance quantile for the margin")
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    from gan_variant_research_tpu.train.feature_bank import build_feature_bank

    feats = build_feature_bank(
        args.images, args.out,
        weights_path=args.inception_weights,
        allow_random=args.allow_random_weights,
        batch_size=args.batch_size,
    )
    print(f"Wrote bank: {args.out} ({feats.shape[0]} x {feats.shape[1]})")

    if args.margin_out:
        f = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8)
        sims = f @ f.T
        np.fill_diagonal(sims, -np.inf)           # leave-one-out
        nn_dist = 1.0 - sims.max(axis=1)
        margin = float(np.quantile(nn_dist, args.margin_quantile))
        Path(args.margin_out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.margin_out, "w") as fp:
            json.dump({"margin": margin,
                       "quantile": args.margin_quantile,
                       "n_images": int(feats.shape[0])}, fp, indent=2)
        print(f"Wrote margin: {args.margin_out} (margin={margin:.4f})")


if __name__ == "__main__":
    main()

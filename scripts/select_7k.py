#!/usr/bin/env python
"""Select the best ``target`` images from candidate output folders for a
Kaggle submission.

Working version of the reference's EVAL/scripts/select_7k.py, which is
broken as committed (it imports ``eval.features.load_folder_pool3`` and
``eval.utils.list_images`` that don't exist — SURVEY.md §2.6 item 6). The
intent is preserved: drop candidates too close to a real image (min cosine
distance < tau, memorization floor), KMeans the real features, score each
candidate by distance to its nearest real-cluster center minus a small
min-cos bonus, and copy the best ``target`` into the output folder.

Usage:
    python scripts/select_7k.py --real data/monet_jpg \
        --cand_roots out_a out_b --outdir submission \
        --inception-weights pt_inception.npz [--tau 0.22] [--k 128]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

# invocable as `python scripts/select_7k.py` from anywhere: python puts the
# script's dir on sys.path, not the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def min_cos_dists(f_fake: np.ndarray, f_real: np.ndarray) -> np.ndarray:
    ff = f_fake / (np.linalg.norm(f_fake, axis=1, keepdims=True) + 1e-8)
    fr = f_real / (np.linalg.norm(f_real, axis=1, keepdims=True) + 1e-8)
    return 1.0 - (ff @ fr.T).max(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", required=True)
    ap.add_argument("--cand_roots", nargs="+", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--tau", type=float, default=0.22, help="min-cos floor")
    ap.add_argument("--k", type=int, default=128, help="KMeans buckets")
    ap.add_argument("--target", type=int, default=7000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--allow-random-weights", action="store_true")
    args = ap.parse_args()

    from sklearn.cluster import KMeans

    from gan_variant_research_tpu.evalsuite.features import InceptionFeatureExtractor
    from gan_variant_research_tpu.evalsuite.utils import enumerate_images

    extractor = InceptionFeatureExtractor(
        weights_path=args.inception_weights,
        allow_random=args.allow_random_weights,
        batch_size=args.batch,
    )

    real_paths = enumerate_images(args.real)
    r_feats = extractor.extract(real_paths, "Real images")

    all_feats, all_paths = [], []
    for root in args.cand_roots:
        paths = enumerate_images(root)
        all_feats.append(extractor.extract(paths, f"Candidates {root}"))
        all_paths += paths
    feats = np.vstack(all_feats)
    mins = min_cos_dists(feats, r_feats)
    feats = (feats - feats.mean(0, keepdims=True)) / (feats.std(0, keepdims=True) + 1e-8)

    keep = mins >= args.tau
    feats, mins = feats[keep], mins[keep]
    kept_paths = [p for p, m in zip(all_paths, keep) if m]
    if len(kept_paths) < args.target:
        print(f"⚠ only {len(kept_paths)} candidates clear the tau={args.tau} "
              f"memorization floor (target {args.target}) — taking all")

    km = KMeans(n_clusters=min(args.k, len(real_paths)), n_init=10,
                random_state=0).fit(
        (r_feats - r_feats.mean(0)) / (r_feats.std(0) + 1e-8)
    )
    centers = km.cluster_centers_
    dists = ((feats[None, :, :] - centers[:, None, :]) ** 2).sum(-1).min(0)
    score = dists - 0.05 * mins
    chosen = np.argsort(score)[: args.target]
    sel_paths = [kept_paths[i] for i in chosen]

    outimgs = Path(args.outdir) / "images"
    outimgs.mkdir(parents=True, exist_ok=True)
    for p in sel_paths:
        shutil.copy2(p, outimgs / Path(p).name)

    with open(Path(args.outdir) / "selection_meta.json", "w") as f:
        json.dump({
            "real": args.real,
            "cand_roots": args.cand_roots,
            "tau": args.tau,
            "k": args.k,
            "selected": len(sel_paths),
        }, f, indent=2)
    print(f"Selected {len(sel_paths)} images into {outimgs}")


if __name__ == "__main__":
    main()

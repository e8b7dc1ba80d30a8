#!/usr/bin/env bash
# Example MiFID evaluation invocations (the reference's EVAL/scripts/
# run_eval.sh:13-95 doubles as the integration smoke script — same here).
set -euo pipefail

EVAL="python -m gan_variant_research_tpu.evalsuite.cli"
WEIGHTS="${INCEPTION_WEIGHTS:-pt_inception-2015-12-05.npz}"

# 1. Basic evaluation
$EVAL --fake generated_images --real data/monet_jpg \
      --inception-weights "$WEIGHTS"

# 2. CPU-only evaluation
JAX_PLATFORMS=cpu $EVAL --fake generated_images --real data/monet_jpg \
      --inception-weights "$WEIGHTS" --batch 16

# 3. Checkpoint loop: evaluate every generated folder under runs/
for d in runs/step_*; do
  $EVAL --fake "$d" --real data/monet_jpg --inception-weights "$WEIGHTS" \
        --out "cache/reports/$(basename "$d")"
done

# 4. Score comparison across runs
grep -h '"mifid"' cache/reports/*/*_report.json | sort

# 5. High-performance run (bigger batch, more decode workers)
$EVAL --fake generated_images --real data/monet_jpg \
      --inception-weights "$WEIGHTS" --batch 256 --workers 16

# 6. Debug/minimal run (small batch, no cache)
$EVAL --fake generated_images --real data/monet_jpg \
      --inception-weights "$WEIGHTS" --batch 8 --no-cache

# 7. Straight off the Kaggle TFRecord shards (no unpack step; scores are
#    identical to the unpacked folder — the embedded bytes are the JPEGs)
$EVAL --fake generated_images --real data/monet_tfrec \
      --inception-weights "$WEIGHTS"

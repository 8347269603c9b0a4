#!/usr/bin/env bash
# One-command reproduction of the mid-scale TPU training demo (PERF.md):
# generate a 1000-image signal-bearing synthetic dataset, train the
# flagship region transformer at reference scale through the production
# CLI with the TPU-tuned config (configs/tpu/ — rbg RNG, bf16, fused
# dispatch, feature cache), and report held-out test scores.
#
# Usage: scripts/run_demo.sh [workdir]   (default /tmp/openviic_demo)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/openviic_demo}"

if [ ! -f "$WORK/dataset/train.json" ]; then
  python scripts/make_tiny_dataset.py "$WORK/dataset" \
    --n-images 1000 --signal --no-grids
fi

python train.py \
  --config-file configs/tpu/standard_transformer_using_region.yaml \
  --max-epochs 20 \
  DATASET.JSON_PATH.TRAIN "$WORK/dataset/train.json" \
  DATASET.JSON_PATH.DEV "$WORK/dataset/dev.json" \
  DATASET.JSON_PATH.TEST "$WORK/dataset/test.json" \
  DATASET.FEATURE_PATH.FEATURES "$WORK/dataset/features" \
  TRAINING.CHECKPOINT_PATH "$WORK/runs" \
  TRAINING.WARMUP 1000 \
  TRAINING.PATIENCE 3 \
  MODEL.NAME demo_synthetic

echo
echo "Artifacts: $WORK/runs/demo_synthetic/ (checkpoints, metrics.jsonl, test_results.json)"

#!/bin/bash
# Batch-benchmark multiple checkpoints on the same test dir, appending to one
# results CSV (parity: scripts/test_models.sh). Edit MODELS to taste.
set -u
ROOT=$(git rev-parse --show-toplevel)
RESULTS_PATH="./results.csv"
TEST_DIR="${1:-/data/mvs-test-sessions}"

cd "$ROOT"

# "model_dir:ckpt_step" entries
MODELS=(
  "/models/baseline:100000"
  "/models/grad_loss:140000"
)

for entry in "${MODELS[@]}"; do
  model_dir="${entry%%:*}"
  step="${entry##*:}"
  python -m mvsnet_tpu.test --input_dir="$TEST_DIR" --results_path="$RESULTS_PATH" \
    --model_dir "$model_dir" --ckpt_step "$step"
done

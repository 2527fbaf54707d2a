#!/bin/bash
# Qualitative benchmark: fuse point clouds for visual inspection
# (parity: scripts/qual_test_models.sh; upload requires SKETCHFAB_API_TOKEN
# and --sketchfab).
set -u
ROOT=$(git rev-parse --show-toplevel)
TEST_DIR="${1:-/data/mvs-test-sessions}"
MODEL_DIR="${2:-/models/baseline}"
CKPT_STEP="${3:-100000}"

cd "$ROOT"
python -m scripts.test_and_fuse --test_folder_root "$TEST_DIR" \
  --model_dir "$MODEL_DIR" --ckpt_step "$CKPT_STEP" \
  --prob_threshold 0.8 --disp_threshold 0.25 --num_consistent 3

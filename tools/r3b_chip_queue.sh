#!/usr/bin/env bash
# Round-3b chip experiment queue — run SERIALLY (never two benches at
# once; axon serializes unpredictably). Assumes the working tree is
# frozen for the duration (bench subprocesses import it live).
#
#   bash tools/r3b_chip_queue.sh 2>&1 | tee -a bench_logs/r3b_queue.log
#
# Sequence:
#   1. GROUP=2 vs GROUP=4 cost-stage A/B at the 3DCNN point (same window)
#   2. regnetsum per-layer table (locates the 51.1 ms RegNet spend)
#   3. conv 32->8 pack sweep (unpacked/2/4) via the bisect single stage
#   4. if quad won step 1: full default e2e bench with GROUP=4
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
L=bench_logs/r3b_queue.log

run() {  # run <tag> <timeout_s> <cmd...>
  echo "=== $1 $(date +%H:%M:%S)" | tee -a "$L"
  shift
  local t=$1; shift
  timeout "$t" "$@" >> "$L" 2>&1
  local rc=$?
  echo "--- rc=$rc" | tee -a "$L"
  return $rc
}

# 1. quad A/B (same window, back-to-back)
run ab_group2 1800 env MVSNET_TPU_SWEEP_GROUP=2 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp
run ab_group4 1800 env MVSNET_TPU_SWEEP_GROUP=4 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp
# re-baseline to bracket window drift
run ab_group2_rerun 900 env MVSNET_TPU_SWEEP_GROUP=2 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# 2. RegNet per-layer spend
run regnetsum 2400 python tools/bench_conv.py --case regnetsum

# 3. conv 32->8 pack sweep (stage timings live in pallas3d case)
run conv_pack1 1200 env MVSNET_TPU_CONV_PACK=1 \
    python tools/bench_conv.py --case pallas3d
run conv_pack2 1200 env MVSNET_TPU_CONV_PACK=2 \
    python tools/bench_conv.py --case pallas3d
run conv_pack4 1200 env MVSNET_TPU_CONV_PACK=4 \
    python tools/bench_conv.py --case pallas3d

echo "=== queue done $(date +%H:%M:%S)" | tee -a "$L"

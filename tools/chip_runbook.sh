#!/bin/bash
# Chip measurement runbook: run the round-2 A/B queue sequentially the
# moment the tunnel is up. ONE bench at a time (axon serializes
# unpredictably if two run concurrently); every step under timeout; all
# output appended to the log with timestamps so same-window A/Bs are
# identifiable afterwards.
#
# Usage: bash tools/chip_runbook.sh [logfile]
set -u
LOG="${1:-/tmp/chip_runbook.log}"
cd "$(dirname "$0")/.."

say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { # run <timeout_s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  say "START $label"
  timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  say "END $label rc=$rc"
  return $rc
}

say "runbook begin"
run 180 probe python tools/tunnel_probe.py || { say "tunnel down, aborting"; exit 1; }

# 0. Cost kernel: straight-line-block + hoisted-tent change, numerics
#    checked on chip + timed at the 3DCNN point (realistic rig)
run 2400 sweep_3dcnn python tools/bench_sweep.py --skip-warp
run 2400 sweep_gru python tools/bench_sweep.py --point gru --skip-warp --skip-check
# knob A/Bs (same window as the baseline above): with two straight-line
# blocks, smaller BAND = 25% less MXU work if spans fit 2*BAND-1
run 2400 sweep_band6 env MVSNET_TPU_SWEEP_BAND=6 python tools/bench_sweep.py --skip-warp --skip-check
run 2400 sweep_parsem env MVSNET_TPU_SWEEP_PARSEM=1 python tools/bench_sweep.py --skip-warp --skip-check

# 1. RegNet layer-sum vs full module: does BN-fold close the in-graph glue?
run 2400 regnetsum python tools/bench_conv.py --case regnetsum

# 2. RegNet truncation bisect (only if regnetsum still shows >15ms glue —
#    run it anyway; sequential stages, each its own jit)
run 3600 bisect python tools/bench_conv.py --case bisect

# 3. Feature-net breakdown + full tower (carry conv2d + s2/5x5 kernels +
#    Pallas deconv2d now), then the same-window XLA contrast
run 3000 featnet python tools/bench_featnet.py --full
run 2400 featnet_xla env MVSNET_TPU_NO_PALLAS_CONV=1 python tools/bench_featnet.py --only-full

# 4. Headline benches, back-to-back in one window
run 2400 bench_3dcnn python bench.py --metric 3dcnn
run 2400 bench_gru python bench.py --metric gru
run 3600 bench_train python bench.py --metric train

say "runbook done"

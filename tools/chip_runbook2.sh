#!/bin/bash
# Round-3 follow-up chip queue: pair-row cost kernel A/B (built after the
# main runbook launched). Reuses the main runbook's run/bench_active
# machinery by sourcing nothing — minimal local copy (one bench at a
# time, exact-PID kills only).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
LOG="${1:-bench_logs/chip_runbook2.log}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export MVSNET_BENCH_NO_SENTINEL=1
export BENCH_EXTRAS=0

say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
run() {
  local t="$1" label="$2"; shift 2
  while true; do
    say "START $label"
    timeout "$t" "$@" >> "$LOG" 2>&1
    local rc=$?
    say "END $label rc=$rc"
    if [ "$rc" = 124 ] || [ "$rc" = 2 ]; then
      say "tunnel suspect after $label (rc=$rc) — waiting to rerun"
      while ! timeout 90 python tools/tunnel_probe.py >> "$LOG" 2>&1; do
        say "tunnel down — waiting"; sleep 240
      done
      continue
    fi
    return $rc
  done
}

say "runbook2 begin"
# pair-row cost kernel: numerics + cost-stage timing, then headline e2e,
# then the GRU point (different W=400 tiling)
run 2400 sweep_pair env MVSNET_TPU_SWEEP_PAIR=1 python tools/bench_sweep.py --skip-warp
run 3600 bench_pair env MVSNET_TPU_SWEEP_PAIR=1 python bench.py --metric 3dcnn
run 2400 sweep_pair_gru env MVSNET_TPU_SWEEP_PAIR=1 python tools/bench_sweep.py --point gru --skip-warp --skip-check
run 3600 bench_pair_gru env MVSNET_TPU_SWEEP_PAIR=1 python bench.py --metric gru
say "runbook2 done"

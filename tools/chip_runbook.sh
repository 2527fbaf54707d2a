#!/bin/bash
# Chip measurement runbook: run the round-2 A/B queue sequentially the
# moment the tunnel is up. ONE bench at a time (axon serializes
# unpredictably if two run concurrently); every step under timeout; all
# output appended to the log with timestamps so same-window A/Bs are
# identifiable afterwards.
#
# Order: quick on-chip validation of the NEW kernels first (a Mosaic
# lowering failure must surface before the headline runs), then the
# headline benches (the round's deliverable), then diagnostics (the
# bisect alone is ~11 remote compiles).
#
# Usage: bash tools/chip_runbook.sh [logfile]
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
LOG="${1:-bench_logs/chip_runbook.log}"
# The package is not pip-installed in this container; tools/*.py run with
# tools/ (not the repo root) on sys.path.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# Our own bench.py steps must NOT write the driver-bench sentinel — the
# queue would preempt itself forever. The real driver bench still writes
# it (env unset there) and still preempts us.
export MVSNET_BENCH_NO_SENTINEL=1
# Each runbook step is atomic: the gru/train operating points are their
# own steps below, so bench.py must not also run them as extras.
export BENCH_EXTRAS=0

say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }
bench_active() { # driver bench.py running? (PID sentinel; stale = dead PID)
  [ -e /tmp/mvsnet_bench_active ] || return 1
  local bpid
  bpid=$(cat /tmp/mvsnet_bench_active 2>/dev/null)
  if [ -n "$bpid" ] && kill -0 "$bpid" 2>/dev/null; then
    return 0
  fi
  rm -f /tmp/mvsnet_bench_active
  return 1
}
run() { # run <timeout_s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  # Two concurrent chip benches corrupt both: yield to the round-end
  # driver bench (bench.py writes a PID sentinel). If it appears while a
  # step is mid-flight, kill THAT step's exact PID, wait, and rerun it.
  while true; do
    while bench_active; do
      say "WAIT $label (driver bench active)"; sleep 30
    done
    say "START $label"
    timeout "$t" "$@" >> "$LOG" 2>&1 &
    local pid=$! rc=0 preempted=0
    while kill -0 "$pid" 2>/dev/null; do
      if bench_active; then
        say "PREEMPT $label (driver bench arrived) — will rerun"
        kill "$pid" 2>/dev/null
        preempted=1
      fi
      sleep 15
    done
    wait "$pid"; rc=$?
    if [ "$preempted" = 1 ]; then
      continue
    fi
    say "END $label rc=$rc"
    if [ "$rc" = 124 ] || [ "$rc" = 2 ]; then
      # rc=124: step timed out; rc=2: bench.py's own chip probe failed.
      # Either way the tunnel is likely dead — wait for it to answer,
      # then RERUN the step (the measurement was lost, not completed).
      say "tunnel suspect after $label (rc=$rc) — waiting to rerun"
      while ! timeout 90 python tools/tunnel_probe.py >> "$LOG" 2>&1; do
        say "tunnel down mid-runbook — waiting"; sleep 240
      done
      say "tunnel back — rerunning $label"
      continue
    fi
    return $rc
  done
}

say "runbook begin"
# Wait (indefinitely) for the tunnel rather than aborting: the runbook is
# routinely launched during an outage so the queue fires the moment the
# chip answers (replaces the old /tmp watcher).
until timeout 180 python tools/tunnel_probe.py >> "$LOG" 2>&1; do
  say "tunnel down — waiting"; sleep 240
done
say "tunnel up"

# 0. Kernel smoke: compile-probe EVERY Pallas conv/deconv family at one
#    real shape (catches Mosaic lowering crashes per-kernel, before any
#    headline run can die to one), then sweep numerics on chip. A
#    non-zero rc here means a kernel family is broken on chip — the
#    headline benches will fall back, and the smoke log names the
#    culprit.
run 3600 kernel_smoke python tools/bisect_mosaic.py
run 2400 sweep_3dcnn python tools/bench_sweep.py --skip-warp

# 1. Headline benches, back-to-back in one window
run 3600 bench_3dcnn python bench.py --metric 3dcnn
# Same window: CW-layout pipeline A/B (channel-second-minor chaining of
# the cost kernel + RegNet eval convs; CW=0 restores per-layer NDHWC)
run 2400 bench_3dcnn_nocw env MVSNET_TPU_CW=0 python bench.py --metric 3dcnn
# Same window: per-stage decomposition to explain the in-graph
# 4.57->4.02 maps/s drift (stage sum vs e2e shows where the glue went)
run 3600 stages python tools/bench_stages.py
run 3600 bench_gru python bench.py --metric gru
# Same window: GRU CW A/B (CW scan states + cost handoff vs NDHWC)
run 2400 bench_gru_nocw env MVSNET_TPU_CW=0 python bench.py --metric gru
run 3600 bench_train python bench.py --metric train
# Same window: training CW A/B (CW custom-VJP regnet chain vs NDHWC)
run 2400 bench_train_nocw env MVSNET_TPU_CW_TRAIN=0 python bench.py --metric train
run 3600 featnet python tools/bench_featnet.py --full

# 2. Same-window knob A/Bs: with two straight-line blocks, smaller BAND
#    = 25% less MXU work if spans fit 2*BAND-1
run 2400 sweep_band6 env MVSNET_TPU_SWEEP_BAND=6 python tools/bench_sweep.py --skip-warp --skip-check
# BAND=16: ONE static block covers realistic spans (same MXU taps as
# BAND=8 x 2 blocks, half the per-block overhead; C auto-chunks to 16)
run 2400 sweep_band16 env MVSNET_TPU_SWEEP_BAND=16 python tools/bench_sweep.py --skip-warp --skip-check
run 2400 sweep_band16_gru env MVSNET_TPU_SWEEP_BAND=16 python tools/bench_sweep.py --point gru --skip-warp --skip-check
run 2400 sweep_parsem env MVSNET_TPU_SWEEP_PARSEM=1 python tools/bench_sweep.py --skip-warp --skip-check
run 2400 sweep_dynband env MVSNET_TPU_SWEEP_DYNBAND=1 python tools/bench_sweep.py --skip-warp --skip-check
run 2400 sweep_gru python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 3. RegNet layer-sum vs full module: does BN-fold close the in-graph glue?
run 2400 regnetsum python tools/bench_conv.py --case regnetsum

# 4. Feature-net XLA contrast (same window as the featnet run above-ish)
run 2400 featnet_xla env MVSNET_TPU_NO_PALLAS_CONV=1 python tools/bench_featnet.py --only-full

# 5. RegNet truncation bisect (expensive: one jit per stage)
run 3600 bisect python tools/bench_conv.py --case bisect

say "runbook done"

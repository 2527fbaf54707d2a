#!/usr/bin/env bash
# Round-4b chip queue — runs AFTER r4_chip_queue.sh finishes (waits for
# its done-marker in the log): the fixed COMB16 A/Bs (the r4 queue's
# COMB16 runs crashed on the bf16-matmul-acc Mosaic rule), the
# train-step stage breakdown, and the feature-net attack measurements.
#   nohup bash tools/r4b_chip_queue.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r4b_queue.log
PREV=$REPO/bench_logs/r4_queue.log
SNAP=/tmp/mvsnet_r4b_snap
export PYTHONPATH="$SNAP${PYTHONPATH:+:$PYTHONPATH}"
export MVSNET_BENCH_NO_SENTINEL=1
export BENCH_EXTRAS=0

say() { echo "=== $(date -u +%H:%M:%S) $*" >> "$L"; }

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

bench_active() {
  [ -e /tmp/mvsnet_bench_active ] || return 1
  local bpid
  bpid=$(cat /tmp/mvsnet_bench_active 2>/dev/null)
  if [ -n "$bpid" ] && kill -0 "$bpid" 2>/dev/null; then return 0; fi
  rm -f /tmp/mvsnet_bench_active
  return 1
}

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 t=$2; shift 2
  while true; do
    while bench_active; do say "WAIT $tag (driver bench active)"; sleep 30; done
    say "START $tag"
    timeout "$t" "$@" >> "$L" 2>&1 &
    local pid=$! rc=0 preempted=0
    while kill -0 "$pid" 2>/dev/null; do
      if bench_active; then
        say "PREEMPT $tag — will rerun"
        kill "$pid" 2>/dev/null
        preempted=1
      fi
      sleep 15
    done
    wait "$pid"; rc=$?
    if [ "$preempted" = 1 ]; then continue; fi
    say "END $tag rc=$rc"
    if [ "$rc" = 124 ] || [ "$rc" = 2 ]; then
      say "tunnel suspect after $tag (rc=$rc) — waiting to rerun (NEW WINDOW)"
      until probe; do say "tunnel down — waiting"; sleep 240; done
      say "tunnel back — rerunning $tag"
      continue
    fi
    return $rc
  done
}

say "r4b waiting for the r4 queue to finish"
while ! grep -q "r4 queue done" "$PREV" 2>/dev/null; do sleep 120; done
say "r4 queue done — waiting for tunnel"
until probe; do sleep 120; done
say "tunnel up"

git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { say "FATAL: snapshot worktree failed"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
say "snapshot at $(git rev-parse --short HEAD)"

# 0. COMB16 smoke (post-fix)
run smoke_c16 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --small

# 1. fixed COMB16 A/Bs at the 3DCNN cost point (def bracket)
run ab2_def_a 2400 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab2_c16 2400 env MVSNET_TPU_SWEEP_COMB16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab2_c16mm2 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab2_c16t16mm2 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_TENT16=1 \
    MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab2_def_b 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# 2. GRU-point COMB16
run ab2_gcost_c16 2400 env MVSNET_TPU_SWEEP_COMB16=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 3. train-step stage breakdown (VERDICT r3 #5)
run train_stages 4800 python tools/bench_train_stages.py

# 4. feature-net attack measurements (VERDICT r3 #8): default vs the
#    batch-lane-pack conv (one call serves all 3 views, roll-free)
run featnet 3600 python tools/bench_featnet.py --full
run featnet_bpack 3600 env MVSNET_TPU_CONV_BPACK=1 python tools/bench_featnet.py --full
run featnet_xla 2400 env MVSNET_TPU_NO_PALLAS_CONV=1 python tools/bench_featnet.py --only-full

# 5. BAND=12 GRU point retest: the r3 crash root-caused as the unpadded
#    VMEM model (lane padding fixed in cb14cbf; now auto-chunks to C=8)
run band12_gru 2400 env MVSNET_TPU_SWEEP_BAND=12 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 6. D-pack + quad-group e2e: full bench under the winning knobs is run
#    MANUALLY after reading the A/B results (knob flips after numbers)

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r4b queue done"

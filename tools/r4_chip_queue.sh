#!/usr/bin/env bash
# Round-4 chip experiment queue — waits for the tunnel, then runs
# SERIALLY from a git-worktree SNAPSHOT (working-tree edits must not race
# subprocess imports; CLAUDE.md round-3 rule).
#
#   nohup bash tools/r4_chip_queue.sh > /dev/null 2>&1 &
#
# Sequence (same-window, default-config runs bracket the A/Bs):
#   0. smoke: conv-kernel family compile probe, small sweep (validates the
#      r3 bf16-where default + the new COMB16/MM2/DPACK kernels on chip)
#   1. cost-stage A/B at the 3DCNN point (8 runs):
#      def / TENT16 / COMB16 / MM2 / COMB16+MM2 / COMB16+TENT16+MM2 / G8 / def
#   2. conv A/B: pallas3d layers, default vs DPACK
#   3. GRU-point cost A/B: def / COMB16+MM2
#   4. full default bench with extras (the round artifact + the
#      never-captured e2e GRU at the W%16 quad default)
# Results: bench_logs/r4_queue.log. Knob flips happen AFTER reading the
# numbers, never on expectation.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r4_queue.log
SNAP=/tmp/mvsnet_r4_snap
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
  if [ -n "$bpid" ] && kill -0 "$bpid" 2>/dev/null; then
    return 0
  fi
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
        say "PREEMPT $tag (driver bench arrived) — will rerun"
        kill "$pid" 2>/dev/null
        preempted=1
      fi
      sleep 15
    done
    wait "$pid"; rc=$?
    if [ "$preempted" = 1 ]; then continue; fi
    say "END $tag rc=$rc"
    if [ "$rc" = 124 ] || [ "$rc" = 2 ]; then
      say "tunnel suspect after $tag (rc=$rc) — waiting to rerun (NEW WINDOW: bracket broken)"
      until probe; do say "tunnel down — waiting"; sleep 240; done
      say "tunnel back — rerunning $tag"
      continue
    fi
    return $rc
  done
}

say "r4 queue waiting for tunnel"
until probe; do sleep 120; done
say "tunnel up"

# A killed previous run can leave $SNAP registered-but-deleted; prune
# first and hard-stop if the snapshot can't be entered (never bench the
# live tree).
git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { say "FATAL: snapshot worktree failed"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
say "snapshot at $(git rev-parse --short HEAD)"

# 0. smoke
run smoke_conv 3600 python tools/bisect_mosaic.py
run smoke_dpack 1800 env MVSNET_TPU_CONV3D_DPACK=1 python tools/probe_dpack.py
run smoke_sweep 2400 python tools/bench_sweep.py --small
run smoke_sweep_knobs 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --small

# 1. cost-stage A/B at the 3DCNN point (bracketed)
run ab_cost_def_a 2400 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_tent16 2400 env MVSNET_TPU_SWEEP_TENT16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_comb16 2400 env MVSNET_TPU_SWEEP_COMB16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_mm2 2400 env MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_c16mm2 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_c16t16mm2 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_TENT16=1 \
    MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_g8 2400 env MVSNET_TPU_SWEEP_GROUP=8 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab_cost_def_b 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# 2. conv layers A/B: default vs D-pack
run ab_conv_def 3600 python tools/bench_conv.py --case pallas3d
run ab_conv_dpack 3600 env MVSNET_TPU_CONV3D_DPACK=1 python tools/bench_conv.py --case pallas3d

# 3. GRU-point cost A/B
run ab_gcost_def 2400 python tools/bench_sweep.py --point gru --skip-warp --skip-check
run ab_gcost_c16mm2 2400 env MVSNET_TPU_SWEEP_COMB16=1 MVSNET_TPU_SWEEP_MM2=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 4. full default bench (headline JSON + gru/train extras)
run bench_full 4800 env BENCH_EXTRAS=1 python bench.py

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r4 queue done"

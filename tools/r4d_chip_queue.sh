#!/usr/bin/env bash
# Round-4d chip queue — runs AFTER r4c (waits for its done marker), then
# waits up to 45 min for bench_logs/r4d_go so knob flips motivated by the
# r4b/r4c numbers can be committed first (the snapshot is taken at start).
#
# Contents:
#   1. train-step A/Bs for the fused-cost custom VJP (MVSNET_TPU_COST_AD):
#      cost stage + full step, def bracket (VERDICT r3 #5 / weak #6)
#   2. end-of-round full bench at final defaults (the round artifact:
#      D-pack auto + whatever r4b/r4c flips landed)
#   nohup bash tools/r4d_chip_queue.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r4d_queue.log
PREV=$REPO/bench_logs/r4c_queue.log
SNAP=/tmp/mvsnet_r4d_snap
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
run() {
  local tag=$1 t=$2; shift 2
  while true; do
    while bench_active; do say "WAIT $tag"; sleep 30; done
    say "START $tag"
    timeout "$t" "$@" >> "$L" 2>&1 &
    local pid=$! rc=0 preempted=0
    while kill -0 "$pid" 2>/dev/null; do
      if bench_active; then
        say "PREEMPT $tag"; kill "$pid" 2>/dev/null; preempted=1
      fi
      sleep 15
    done
    wait "$pid"; rc=$?
    if [ "$preempted" = 1 ]; then continue; fi
    say "END $tag rc=$rc"
    if [ "$rc" = 124 ] || [ "$rc" = 2 ]; then
      say "tunnel suspect after $tag (rc=$rc) — waiting (NEW WINDOW)"
      until probe; do sleep 240; done
      say "retrying $tag"
      continue
    fi
    return $rc
  done
}

say "r4d waiting for the r4c queue"
while ! grep -q "r4c queue done" "$PREV" 2>/dev/null; do sleep 120; done
say "r4c done — waiting for r4d_go (45 min grace for knob-flip commits)"
for _ in $(seq 90); do
  [ -e "$REPO/bench_logs/r4d_go" ] && break
  sleep 30
done
until probe; do sleep 120; done
say "tunnel up"

git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { say "FATAL: snapshot worktree failed"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
say "snapshot at $(git rev-parse --short HEAD)"

# 0. XPIPE smoke + cost A/Bs at the new TSLAB+WIDE defaults
run xp_smoke 2400 env MVSNET_TPU_SWEEP_XPIPE=1 python tools/bench_sweep.py --small
run xp_def_a 2400 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run xp_on 2400 env MVSNET_TPU_SWEEP_XPIPE=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run xp_def_b 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run xp_gcost_def 2400 python tools/bench_sweep.py --point gru --skip-warp --skip-check
run xp_gcost_on 2400 env MVSNET_TPU_SWEEP_XPIPE=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 1. fused-cost VJP train A/Bs (cost stage, then the full step)
run tr_cost_def 3600 python tools/bench_train_stages.py --stage cost
run tr_cost_ad 3600 env MVSNET_TPU_COST_AD=1 \
    python tools/bench_train_stages.py --stage cost
run tr_step_def 4800 python tools/bench_train_stages.py --stage step
run tr_step_ad 4800 env MVSNET_TPU_COST_AD=1 \
    python tools/bench_train_stages.py --stage step
run tr_cost_def_b 1800 python tools/bench_train_stages.py --stage cost

# 2. s2 tap-split conv A/B (other three layers are the same-window control)
run ab4_conv_def 3600 python tools/bench_conv.py --case pallas3d
run ab4_conv_s2split 3600 env MVSNET_TPU_CONV3D_S2SPLIT=1 \
    python tools/bench_conv.py --case pallas3d

# 3. end-of-round full bench at final defaults
run bench_final 4800 env BENCH_EXTRAS=1 python bench.py

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r4d queue done"

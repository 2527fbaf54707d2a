#!/usr/bin/env bash
# Round-4c chip queue — runs AFTER r4b (waits for its done marker):
# WIDE-combine A/Bs (motivated by the r4 TENT16 null result: the cost
# kernel is vector-op-ISSUE bound, so WIDE cuts op count ~G-fold), and
# the full bench under the best knob set found in r4/r4b (filled in
# manually before launch if defaults changed).
#   nohup bash tools/r4c_chip_queue.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r4c_queue.log
PREV=$REPO/bench_logs/r4b_queue.log
SNAP=/tmp/mvsnet_r4c_snap
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

say "r4c waiting for the r4b queue"
while ! grep -q "r4b queue done" "$PREV" 2>/dev/null; do sleep 120; done
until probe; do sleep 120; done
say "tunnel up"

git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { say "FATAL: snapshot worktree failed"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
say "snapshot at $(git rev-parse --short HEAD)"

# WIDE A/Bs at the 3DCNN cost point (def bracket)
run ab3_def_a 2400 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_wide 2400 env MVSNET_TPU_SWEEP_WIDE=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_wide_c16 2400 env MVSNET_TPU_SWEEP_WIDE=1 MVSNET_TPU_SWEEP_COMB16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_def_b 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# TSLAB (MXU-native matmul orientation) A/Bs
run ab3_tslab 2400 env MVSNET_TPU_SWEEP_TSLAB=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_tslab_wide 2400 env MVSNET_TPU_SWEEP_TSLAB=1 MVSNET_TPU_SWEEP_WIDE=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_def_c 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# Ablation decomposition (WRONG NUMERICS, timing only): full - ablated
# = that stage's true cost. Run inside the same window as ab3_def_c.
run abl_tent 2400 env MVSNET_TPU_SWEEP_ABLATE=tent \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run abl_mm 2400 env MVSNET_TPU_SWEEP_ABLATE=mm \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run abl_comb 2400 env MVSNET_TPU_SWEEP_ABLATE=comb \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_def_d 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# GRU point WIDE / TSLAB
run ab3_gcost_wide 2400 env MVSNET_TPU_SWEEP_WIDE=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check
run ab3_gcost_tslab 2400 env MVSNET_TPU_SWEEP_TSLAB=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r4c queue done"

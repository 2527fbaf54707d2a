#!/usr/bin/env bash
# Round-3c chip experiment queue — waits for the tunnel, then runs
# SERIALLY from a git-worktree SNAPSHOT (working-tree edits must not
# race subprocess imports; see CLAUDE.md round-3 rule).
#
#   nohup bash tools/r3c_chip_queue.sh > /dev/null 2>&1 &
#
# Sequence (all same-window, bracketed; 5 cost-stage runs):
#   1. cost-stage A/B at the 3DCNN point: G4 / G8 / G4+TENT16 / G8+TENT16
#      / G4 again (the TENT16 runs use the default G=4 unless paired)
#   2. GRU point: G4 / G8 / G4+TENT16 (W=400, RP=1)
#   3. full default e2e snapshot bench (bench.py median-of-3 + extras)
# Results: bench_logs/r3c_queue.log. Knob flips happen AFTER reading
# the numbers, never on expectation (VERDICT r2 item 2).
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r3c_queue.log
SNAP=/tmp/mvsnet_r3c_snap

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

echo "=== r3c queue waiting for tunnel $(date +%H:%M:%S)" >> "$L"
until probe; do sleep 120; done
echo "=== tunnel up $(date +%H:%M:%S)" >> "$L"

# A previously-killed run can leave $SNAP registered-but-deleted: plain
# rm -rf then `worktree add` fails and everything would silently run from
# the LIVE tree (invalid A/Bs). Remove+prune first, and hard-stop if the
# snapshot can't be entered.
git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { echo "FATAL: snapshot worktree failed" >> "$L"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"

run() {  # run <tag> <timeout_s> <cmd...>
  echo "=== $1 $(date +%H:%M:%S)" >> "$L"
  local tag=$1; shift
  local t=$1; shift
  timeout "$t" "$@" >> "$L" 2>&1
  local rc=$?
  echo "--- rc=$rc" >> "$L"
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 2 ]; then
    # tunnel outage mid-queue: re-probe (a dropped step breaks the
    # same-window bracket — tag the log so validity can be judged)
    echo "=== $tag lost to tunnel outage; waiting to retry $(date +%H:%M:%S)" >> "$L"
    until probe; do sleep 120; done
    echo "=== tunnel back, retrying $tag (NEW WINDOW — bracket broken)" >> "$L"
    timeout "$t" "$@" >> "$L" 2>&1
    echo "--- retry rc=$?" >> "$L"
  fi
}

# 1. 3DCNN cost point (bracketed: G4 first AND last to expose drift)
run ab3_g4_a    1800 env MVSNET_TPU_SWEEP_GROUP=4 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_g8      1800 env MVSNET_TPU_SWEEP_GROUP=8 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_tent16  1800 env MVSNET_TPU_SWEEP_TENT16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_g8t16   1800 env MVSNET_TPU_SWEEP_GROUP=8 MVSNET_TPU_SWEEP_TENT16=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run ab3_g4_b    900  env MVSNET_TPU_SWEEP_GROUP=4 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check

# 2. GRU point (quad took it at W=400 after the W%16 relaxation)
run abg_g4      1800 env MVSNET_TPU_SWEEP_GROUP=4 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check
run abg_g8      1800 env MVSNET_TPU_SWEEP_GROUP=8 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check
run abg_t16     1800 env MVSNET_TPU_SWEEP_TENT16=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 3. full default bench (headline JSON + gru/train extras)
run bench_full  3000 python bench.py

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
echo "=== r3c queue done $(date +%H:%M:%S)" >> "$L"

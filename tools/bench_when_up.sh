#!/usr/bin/env bash
# Wait for the TPU tunnel, then run the full bench FROM A GIT SNAPSHOT
# (worktree at HEAD) so working-tree edits can't race the bench's
# subprocess imports. Results land in the REPO's bench_logs/.
#   bash tools/bench_when_up.sh [logname]
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
LOG=$REPO/bench_logs/${1:-bench_when_up}.log
SNAP=/tmp/mvsnet_bench_snap

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
}

echo "=== waiting for tunnel $(date +%H:%M:%S)" >> "$LOG"
until probe; do sleep 120; done
echo "=== tunnel up $(date +%H:%M:%S)" >> "$LOG"

git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$LOG" 2>&1
cd "$SNAP" || { echo "FATAL: snapshot worktree failed" >> "$LOG"; exit 1; }
# bench_extras.jsonl is written relative to the bench script's repo;
# symlink the snapshot's bench_logs to the real one so extras persist
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
timeout 3000 python bench.py >> "$LOG" 2>&1
echo "bench rc=$? $(date +%H:%M:%S)" >> "$LOG"
cd "$REPO"
git worktree remove --force "$SNAP" >> "$LOG" 2>&1
echo "=== done $(date +%H:%M:%S)" >> "$LOG"

#!/usr/bin/env bash
# Round-5c: leftover GRU experiments cut from r5 for time — CW-vs-noCW
# GRU e2e (queued since r2), PACK2D=2 GRU e2e, GRU scan/WTA stages.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r5c_queue.log
SNAP=/tmp/mvsnet_r5c_snap
export PYTHONPATH="$SNAP${PYTHONPATH:+:$PYTHONPATH}"
export MVSNET_BENCH_NO_SENTINEL=1
export BENCH_EXTRAS=0

say() { echo "=== $(date -u +%H:%M:%S) $*" >> "$L"; }
probe() {
  timeout 120 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
PYEOF
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

until probe; do sleep 120; done
say "tunnel up"

git worktree remove --force "$SNAP" >/dev/null 2>&1
git worktree prune >/dev/null 2>&1
rm -rf "$SNAP"
git worktree add --detach "$SNAP" HEAD >> "$L" 2>&1
cd "$SNAP" || { say "FATAL: snapshot worktree failed"; exit 1; }
rm -rf "$SNAP/bench_logs" && ln -s "$REPO/bench_logs" "$SNAP/bench_logs"
say "snapshot at $(git rev-parse --short HEAD)"

# PACK2D=2 GRU e2e (pad-neutral 2-row lane packing at W=400)
run gru_pack2 7200 env BENCH_METRIC=gru BENCH_EXTRAS=0 \
    MVSNET_TPU_CONV_PACK2D=2 python bench.py

# CW-vs-noCW GRU e2e (queued since r2; current default = CW on, 2.3015)
run gru_cw_off 7200 env BENCH_METRIC=gru BENCH_EXTRAS=0 MVSNET_TPU_CW=0 \
    python bench.py

# GRU scan + WTA stages (slow 256-step scan compile — last)
run gru_stage_scan 7200 python tools/bench_gru.py --part gru
run gru_stage_wta 3600 python tools/bench_gru.py --part wta

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r5c queue done"

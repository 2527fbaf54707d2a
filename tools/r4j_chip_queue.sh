#!/usr/bin/env bash
# Round-4j chip queue — lean replacement for r4i: drops the XWGRAD arms
# (chip-refuted in a prior session, recorded at ops/pallas/conv3d.py:97)
# and runs only what's still undecided:
#   1. RegNet train-stage A/B: def(a) / PWGRAD / def(b) — the Pallas
#      in-VMEM s1 weight-grad kernel vs XLA's lane-starved wgrad convs
#      (dk ~137 ms of the 616 ms step per r4f).
#   2. Full-step PWGRAD vs def.
#   3. Definitive BENCH_EXTRAS=1 bench.py at snapshot defaults.
# Knob flips happen in the LIVE tree after reading numbers.
#   nohup bash tools/r4j_chip_queue.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r4j_queue.log
SNAP=/tmp/mvsnet_r4j_snap
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

# 1. RegNet-stage PWGRAD A/B (bracketed)
run tr6_regnet_def 4800 python tools/bench_train_stages.py --stage regnet
run tr6_regnet_pw 4800 env MVSNET_TPU_CONV3D_PWGRAD=1 \
    python tools/bench_train_stages.py --stage regnet
run tr6_regnet_def_b 3600 python tools/bench_train_stages.py --stage regnet

# 2. full-step A/B
run tr6_step_pw 6000 env MVSNET_TPU_CONV3D_PWGRAD=1 \
    python tools/bench_train_stages.py --stage step
run tr6_step_def 6000 python tools/bench_train_stages.py --stage step

# 3. definitive bench at snapshot defaults
run bench_final6 6000 env BENCH_EXTRAS=1 python bench.py

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r4j queue done"

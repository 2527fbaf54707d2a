#!/usr/bin/env bash
# Round-5 chip queue (VERDICT r4 next-round items):
#   0. dks2 smoke: Pallas s2/deconv weight-grad kernel numerics+timing on
#      chip (new _PWGRAD_S2); COND2 cost smoke.
#   1. NEW train-stage probes at defaults: loss / opt / transfer / modelfb
#      (VERDICT #3 — the ~80 ms "loss/opt/glue" residual).
#   2. PWGRAD_S2 A/B (VERDICT #1): RegNet stage def/on/def bracket + step.
#   3. Cost-VJP ablations (VERDICT #2): cost stage def_a / warp / elem /
#      tpose / def_b (MVSNET_TPU_COSTAD_ABLATE marginals).
#   4. COND2 A/B (VERDICT #4): cost fwd kernel 3dcnn + gru points.
#   5. GRU train step chip number (VERDICT #6): BENCH_METRIC=train_gru.
# Knob flips happen in the LIVE tree after reading numbers.
#   nohup bash tools/r5_chip_queue.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
mkdir -p bench_logs
L=$REPO/bench_logs/r5_queue.log
SNAP=/tmp/mvsnet_r5_snap
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

# 0. dks2 smoke (gates the PWGRAD_S2 flip decision)
run smoke_dks2 3600 python tools/probe_dks2.py

# 1. new train-stage probes at defaults (the 80 ms residual)
run tr_loss 2400 python tools/bench_train_stages.py --stage loss
run tr_opt 2400 python tools/bench_train_stages.py --stage opt
run tr_transfer 2400 python tools/bench_train_stages.py --stage transfer
run tr_modelfb 6000 python tools/bench_train_stages.py --stage modelfb
run tr_step_def 6000 python tools/bench_train_stages.py --stage step

# 2. PWGRAD_S2 A/B (bracketed)
run s2_regnet_def_a 4800 python tools/bench_train_stages.py --stage regnet
run s2_regnet_on 4800 env MVSNET_TPU_CONV3D_PWGRAD_S2=1 \
    python tools/bench_train_stages.py --stage regnet
run s2_regnet_def_b 3600 python tools/bench_train_stages.py --stage regnet
run s2_step_on 6000 env MVSNET_TPU_CONV3D_PWGRAD_S2=1 \
    python tools/bench_train_stages.py --stage step

# 3. cost-VJP ablation marginals (bracketed)
run cad_def_a 4800 python tools/bench_train_stages.py --stage cost
run cad_warp 4800 env MVSNET_TPU_COSTAD_ABLATE=warp \
    python tools/bench_train_stages.py --stage cost
run cad_elem 4800 env MVSNET_TPU_COSTAD_ABLATE=elem \
    python tools/bench_train_stages.py --stage cost
run cad_tpose 4800 env MVSNET_TPU_COSTAD_ABLATE=tpose \
    python tools/bench_train_stages.py --stage cost
run cad_def_b 3600 python tools/bench_train_stages.py --stage cost

# 4. COND2 cost-forward A/B (bracketed at the 3dcnn point, single at gru)
run c2_3d_def_a 2400 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run c2_3d_on 2400 env MVSNET_TPU_SWEEP_COND2=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run c2_3d_def_b 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run c2_gru_on 2400 env MVSNET_TPU_SWEEP_COND2=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check
run c2_gru_def 2400 python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 4a2. HSPLIT within-instance tent/matmul pipeline at both points
run hs_3d_on 2400 env MVSNET_TPU_SWEEP_HSPLIT=1 \
    python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run hs_3d_def 1200 python tools/bench_sweep.py --point 3dcnn --skip-warp --skip-check
run hs_gru_on 2400 env MVSNET_TPU_SWEEP_HSPLIT=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 4b. CFULL at the GRU point (full-C untransposed tables @126MiB vs the
#     C-chunked default that rebuilds every tent)
run cfull_gru_on 2400 env MVSNET_TPU_SWEEP_CFULL=1 \
    python tools/bench_sweep.py --point gru --skip-warp --skip-check
run cfull_gru_def 1200 python tools/bench_sweep.py --point gru --skip-warp --skip-check

# 5. GRU classification train step (first-ever chip number)
run train_gru 7200 env BENCH_METRIC=train_gru BENCH_EXTRAS=0 python bench.py

# 5b. GRU scan/wta stages (lost to the first bench_gru timeout; the
#     256-step scan compile alone exceeded 40 min via the tunnel)
run gru_stage_scan 7200 python tools/bench_gru.py --part gru
run gru_stage_wta 3600 python tools/bench_gru.py --part wta

# 6. CW-vs-noCW GRU e2e (queued since r2, BENCHMARKS.md:154)
run gru_cw_def 7200 env BENCH_METRIC=gru BENCH_EXTRAS=0 python bench.py
run gru_cw_off 7200 env BENCH_METRIC=gru BENCH_EXTRAS=0 MVSNET_TPU_CW=0 \
    python bench.py

# 7. PACK2D=2 at the GRU e2e point: W=400 makes 2-row lane packing
#    pad-neutral (800->1024 vs 400->512) while halving the per-row
#    fixed cost that dominates the 256-step scan's small-C convs
run gru_pack2 7200 env BENCH_METRIC=gru BENCH_EXTRAS=0 \
    MVSNET_TPU_CONV_PACK2D=2 python bench.py

cd "$REPO"
git worktree remove --force "$SNAP" >> "$L" 2>&1
say "r5 queue done"

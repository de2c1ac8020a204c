#!/bin/bash
# Round-5 follow-on #2: the phases appended to r5_followon.sh AFTER its
# running instance had already buffered the old script body (bash reads
# scripts lazily — the in-flight run executed only the original probe
# phases 1/2 and exited).  This runner executes the never-run phases:
#   25  tpu_bench_r5 p3s4 step cell (merges into the A/B table)
#   26  best_config update incl. the p3s4 cell
#   3   tpu_smoke kernel-gate re-run -> KERNELS_r05.json (first run
#       rc=1 on two since-fixed oracle bugs)
#   4   bench.py preview refresh + README table re-render
#   5   canonical quality gate re-run with lp-fit relight (first run's
#       relight columns were vacuous: black renders)
#   6   8k-iteration lp-fit trajectory (10k run died on a transient
#       tunnel error at its first validation)
#
#   nohup tools/r5_followon2.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f2.log   Done flag: /tmp/r5f2_done.flag

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5f2.log
echo "=== r5 followon2 start $(date) ===" >> "$LOG"

probe() {
  timeout 2100 python -c "
import jax, jax.numpy as jnp
print('probe ok:', float(jnp.sum(jnp.ones((8,8)))))
" >> "$LOG" 2>&1
}
until probe; do
  echo "tunnel down $(date); sleep 600" >> "$LOG"
  sleep 600
done

phase() {  # phase <n> <desc> <timeout_s> <cmd...>
  local n="$1"; shift
  local desc="$1"; shift
  local to="$1"; shift
  if [ -f "/tmp/r5f2_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f2_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon2: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

R5_BATCH=0 R5_INFER=0 R5_1024=0 R5_STEP_CELLS="p3s4:fan" \
phase 25 "tpu_bench_r5 p3s4 step cell" 3000 \
  python tools/tpu_bench_r5.py

phase 26 "best_config update incl. p3s4 cell" 120 \
  python tools/r5_pick_best.py

KERNELS_JSON=KERNELS_r05.json \
phase 3 "tpu_smoke kernel gates re-run -> KERNELS_r05.json" 4200 \
  python tools/tpu_smoke.py

phase 4 "bench.py preview refresh + README re-render" 2400 bash -c \
  "python bench.py | tail -1 > tools/out/bench_preview_r5.json && \
   python tools/render_perf_tables.py"

phase 5 "canonical quality gate re-run (lp-fit relight)" 32000 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 \
    --ablations r5_fast,exact,sh_fan_off,conv_slab3 \
    --out tools/out/quality_gate_canonical_r5.json

phase 6 "8k-iteration lp-fit trajectory" 18000 \
  python tools/r5_trajectory.py --iters 8000 --img 512 \
    --root /tmp/rnr_r5_traj_lp --out tools/out/trajectory_r5_lp.json

echo "=== r5 followon2 done $(date) ===" >> "$LOG"
date > /tmp/r5f2_done.flag

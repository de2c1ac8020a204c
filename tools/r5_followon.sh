#!/bin/bash
# Round-5 follow-on: re-run the probe sections that crashed in phase 1
# (D fwd+bwd chains + E down/transpose cells; the XLA control's VJP
# dtype bug is fixed in tpu_probe_r5.py).  Waits for the main queue to
# finish so there is never more than one TPU client.
#
#   nohup tools/r5_followon.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f.log   Done flag: /tmp/r5f_done.flag

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5f.log
echo "=== r5 followon start $(date) ===" >> "$LOG"

until [ -f /tmp/r5q_done.flag ]; do sleep 120; done
echo "queue done, starting $(date)" >> "$LOG"

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
  if [ -f "/tmp/r5f_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

# the p3s4 combo (tap Pallas 3x3 + slab 4x4 pair) as a step_b1 cell —
# merges into the existing A/B table (tpu_bench_r5 cell-level merge)
R5_BATCH=0 R5_INFER=0 R5_1024=0 R5_STEP_CELLS="p3s4:fan" \
phase 25 "tpu_bench_r5 p3s4 step cell" 3000 \
  python tools/tpu_bench_r5.py

phase 26 "best_config update incl. p3s4 cell" 120 \
  python tools/r5_pick_best.py

# kernel gates re-run: the r5q phase-5 run failed on (a) the slab gate's
# XLA wgrad-oracle dtype bug and (b) the fan gate scoring against the
# bf16-ray-corrupted base; both fixed in tpu_smoke.py
KERNELS_JSON=KERNELS_r05.json \
phase 3 "tpu_smoke kernel gates re-run -> KERNELS_r05.json" 4200 \
  python tools/tpu_smoke.py

# refresh the canonical bench preview at the final best config, then
# re-render the README table from the refreshed artifacts
phase 4 "bench.py preview refresh + README re-render" 2400 bash -c \
  "python bench.py | tail -1 > tools/out/bench_preview_r5.json && \
   python tools/render_perf_tables.py"

# canonical quality gate RE-RUN with probe-file lighting init
# (--lp_dir): the first run's relight renders were black (the relight
# index kept the near-zero stitched init), making the relight columns
# vacuous — identical across arms.  The config-hash bump in
# quality_gate.py forces fresh training; arms merge into the same
# artifact.  All four arms, most decision-critical first, so a timeout
# still lands the shipped-defaults and reference-exact columns.
phase 5 "canonical quality gate re-run (lp-fit relight)" 32000 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 \
    --ablations r5_fast,exact,sh_fan_off,conv_slab3 \
    --out tools/out/quality_gate_canonical_r5.json

R5_SECTIONS=D,E \
phase 1 "probe_r5 D,E (conv chains fwd+bwd, down4/convt4 cells)" 5400 \
  python tools/tpu_probe_r5.py --out tools/out/probe_r5_de.json

R5_SECTIONS=D RNR_SLAB_LANE_PAD=0 \
phase 2 "probe_r5 D with RNR_SLAB_LANE_PAD=0" 4800 \
  python tools/tpu_probe_r5.py --out tools/out/probe_r5_nolanepad.json

# relight-meaningful trajectory (the r5q phase-8 run predates the
# --lp_dir fix AND died on a transient tunnel error at its first
# validation; this one replaces it)
phase 6 "8k-iteration lp-fit trajectory" 18000 \
  python tools/r5_trajectory.py --iters 8000 --img 512 \
    --root /tmp/rnr_r5_traj_lp --out tools/out/trajectory_r5_lp.json

echo "=== r5 followon done $(date) ===" >> "$LOG"
date > /tmp/r5f_done.flag

#!/bin/bash
# Round-5 on-device queue: waits for the TPU tunnel, then runs the
# round's measurement phases SEQUENTIALLY (one TPU client at a time,
# every phase under timeout), committing artifacts after each phase.
#
#   nohup tools/r5_queue.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5q.log   Done flag: /tmp/r5q_done.flag
# Phase flags: /tmp/r5q_phase_<n>.done (skip already-done phases on
# restart).

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5q.log
echo "=== r5 queue start $(date) ===" >> "$LOG"

probe() {
  timeout 2100 python -c "
import jax, jax.numpy as jnp
print('probe ok:', float(jnp.sum(jnp.ones((8,8)))))
" >> "$LOG" 2>&1
}

# ---- wait for the tunnel ---------------------------------------------
until probe; do
  echo "tunnel down $(date); sleep 600" >> "$LOG"
  sleep 600
done
echo "tunnel up $(date)" >> "$LOG"

phase() {  # phase <n> <desc> <timeout_s> <cmd...>
  local n="$1"; shift
  local desc="$1"; shift
  local to="$1"; shift
  if [ -f "/tmp/r5q_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    touch "/tmp/r5q_phase_${n}.done"
  fi
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 queue: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  # a wedged tunnel poisons every later phase; re-probe before going on
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

# 1. probes: conv-wall GEMM control, fan formulations, sh_shade_fan,
#    tap-vs-slab conv chains
phase 1 "probe_r5 A-D (conv-wall control + fan/SH/slab cells)" 5400 \
  python tools/tpu_probe_r5.py --out tools/out/probe_r5.json

# 1b. slab conv without the 128-lane K padding (fresh process so the
#     jit cache can't reuse the padded trace)
R5_SECTIONS=D RNR_SLAB_LANE_PAD=0 \
phase 11 "probe_r5 D with RNR_SLAB_LANE_PAD=0" 3600 \
  python tools/tpu_probe_r5.py --out tools/out/probe_r5_nolanepad.json

# 2. full-step A/B over the round-5 levers
R5_BATCH=0 R5_INFER=0 R5_1024=0 \
phase 2 "tpu_bench_r5 step_b1 cells" 7200 \
  python tools/tpu_bench_r5.py

# 3. pick the best (conv, fan) from step_b1 and record it
phase 3 "best_config update from step_b1" 120 \
  python tools/r5_pick_best.py

# 4. batch/infer/1024 cells at the winner
BEST_CONV=$(python -c "
import json
d = json.load(open('tools/out/best_config.json'))
print(d.get('conv_backend', 'auto'))" 2>/dev/null || echo auto)
BEST_FAN=$(python -c "
import json
d = json.load(open('tools/out/best_config.json'))
print('fan' if d.get('sh_fan_fuse', True) else 'nofan')" 2>/dev/null || echo fan)
R5_STEP=0 R5_1024=1 R5_BEST_CONV="$BEST_CONV" R5_BEST_FAN="$BEST_FAN" \
phase 4 "tpu_bench_r5 batch/infer/1024 at best config" 7200 \
  python tools/tpu_bench_r5.py

# 4b. per-stage breakdown for the PERFORMANCE.md table refresh
phase 45 "profile_components stage breakdown" 3600 bash -c \
  "python tools/profile_components.py --img 512 | tee tools/out/profile_components_r5.log"

# 5. kernel gates (incl. the new sh_shade_fan / conv3x3_slab gates)
KERNELS_JSON=KERNELS_r05.json \
phase 5 "tpu_smoke kernel gates -> KERNELS_r05.json" 3600 \
  python tools/tpu_smoke.py

# 6. bench.py preview (the driver runs the canonical one at round end)
phase 6 "bench.py preview" 2400 bash -c \
  "python bench.py | tail -1 > tools/out/bench_preview_r5.json"

# 7. canonical quality gate WITH relighting columns (VERDICT r4 item 2)
phase 7 "canonical quality gate (relight columns, r5 arms)" 43200 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 \
    --ablations r5_fast,conv_slab3,sh_fan_off,exact \
    --out tools/out/quality_gate_canonical_r5.json

# 8. long trajectory: 10k iterations at shipped defaults (VERDICT item 7)
phase 8 "10k-iteration canonical trajectory" 43200 \
  python tools/r5_trajectory.py --iters 10000 --img 512

echo "=== r5 queue done $(date) ===" >> "$LOG"
date > /tmp/r5q_done.flag

#!/bin/bash
# Round-5 follow-on #3: the graph_refresh_every lever (GCN block-graph
# reuse, r2-validated equal quality at small scale) measured at
# canonical scale, quality-gated via the dynamic "ship" gate arm, and
# folded into the final bench artifacts.
#
#   phase 1  step_b1 cells pallas3:fan:r4 / pallas3:fan:r2
#   phase 2  best_config re-pick over the merged cell table
#   phase 3  canonical gate "ship" arm (ONLY if best_config left the
#            r5_fast fallback) — trains exactly the tuned bench config
#   phase 4  r5_gate_check.py: revert best_config unless the ship arm
#            holds >=0.95x exact on view AND relight PSNR
#   phase 5  batch/infer/1024 re-measure at the final config (only if
#            it changed from the fallback)
#   phase 6  bench.py preview refresh + README table re-render
#
# NOTE (hard-won): never edit a runner script while an instance is
# executing — bash buffers by byte offset and skips/garbles phases.
# New work goes in a NEW file (this one).
#
#   nohup tools/r5_followon3.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f3.log   Done flag: /tmp/r5f3_done.flag

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5f3.log
echo "=== r5 followon3 start $(date) ===" >> "$LOG"

until [ -f /tmp/r5f2_done.flag ]; do sleep 120; done
echo "followon2 done, starting $(date)" >> "$LOG"

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
  if [ -f "/tmp/r5f3_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f3_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon3: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

# is the current best_config the already-gated r5_fast fallback?
is_fallback() {
  python - <<'EOF'
import json, sys
b = json.load(open("tools/out/best_config.json"))
fb = {"conv_backend": "pallas3", "rays_dtype": "bfloat16",
      "gcn_dtype": "float32", "sh_fan_fuse": True,
      "graph_refresh_every": 1}
sys.exit(0 if all(b.get(k) == v for k, v in fb.items()) else 1)
EOF
}

R5_BATCH=0 R5_INFER=0 R5_1024=0 \
R5_STEP_CELLS="pallas3:fan:r4,pallas3:fan:r2" \
phase 1 "tpu_bench_r5 graph-refresh step cells" 3600 \
  python tools/tpu_bench_r5.py

phase 2 "best_config re-pick over merged cells" 120 \
  python tools/r5_pick_best.py

if is_fallback; then
  echo "best_config is the gated fallback; skipping ship arm $(date)" >> "$LOG"
  touch /tmp/r5f3_phase_3.done
fi

phase 3 "canonical gate ship arm (tuned bench config)" 9000 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 --ablations ship \
    --out tools/out/quality_gate_canonical_r5.json

phase 4 "ship gate check (revert tuned config on regression)" 120 \
  python tools/r5_gate_check.py

if is_fallback; then
  echo "final config is the fallback; batch/infer table already current $(date)" >> "$LOG"
  touch /tmp/r5f3_phase_5.done
fi

BESTR=$(python -c "import json; print(json.load(open('tools/out/best_config.json')).get('graph_refresh_every', 1))")
R5_STEP=0 R5_1024=1 R5_BEST_REFRESH="$BESTR" \
phase 5 "batch/infer/1024 re-measure at final config" 4800 \
  python tools/tpu_bench_r5.py

phase 6 "final bench preview + README re-render" 2400 bash -c \
  "python bench.py | tail -1 > tools/out/bench_preview_r5.json && \
   python tools/render_perf_tables.py"

echo "=== r5 followon3 done $(date) ===" >> "$LOG"
date > /tmp/r5f3_done.flag

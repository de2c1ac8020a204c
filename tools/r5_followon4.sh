#!/bin/bash
# Round-5 follow-on #4: refresh the step-breakdown profile with the new
# loss/opt isolation cells (loss_and_grads / loss_forward), then
# re-render the machine-generated tables so the "Losses + Adam" row is
# measured rather than estimated.
#
#   nohup tools/r5_followon4.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f4.log   Done flag: /tmp/r5f4_done.flag

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5f4.log
echo "=== r5 followon4 start $(date) ===" >> "$LOG"

until [ -f /tmp/r5f3_done.flag ]; do sleep 120; done
echo "followon3 done, starting $(date)" >> "$LOG"

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
  if [ -f "/tmp/r5f4_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f4_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon4: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

phase 1 "profile_components with loss/opt isolation cells" 3600 bash -c \
  "python tools/profile_components.py --img 512 \
     > tools/out/profile_components_r5b.log 2>&1; \
   tail -20 tools/out/profile_components_r5b.log"

phase 2 "re-render perf/quality tables from refreshed profile" 600 \
  python tools/render_perf_tables.py

echo "=== r5 followon4 done $(date) ===" >> "$LOG"
date > /tmp/r5f4_done.flag

#!/bin/bash
# Round-5 follow-on #5: relight-gap isolation.  The re-run canonical
# gate showed exact relight PSNR +0.37 vs r5_fast -0.61 (view PSNR the
# other way: 9.15 vs 9.02).  Two more arms tell us whether that ~1 dB
# relight delta is (a) seed noise on the synthetic scene's
# physically-inconsistent relight GT, or (b) the bf16 ray channels.
#
#   phase 1  gate arm r5_fast_seed1  (noise floor)
#   phase 2  gate arm rays_f32       (bf16-ray isolation)
#   phase 3  re-render tables
#
#   nohup tools/r5_followon5.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f5.log   Done flag: /tmp/r5f5_done.flag

set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r5f5.log
echo "=== r5 followon5 start $(date) ===" >> "$LOG"

until [ -f /tmp/r5f4_done.flag ]; do sleep 120; done
echo "followon4 done, starting $(date)" >> "$LOG"

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
  if [ -f "/tmp/r5f5_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f5_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon5: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  until probe; do
    echo "tunnel down after phase $n $(date); sleep 600" >> "$LOG"
    sleep 600
  done
  return $rc
}

phase 1 "gate arm r5_fast_seed1 (relight noise floor)" 9000 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 --ablations r5_fast_seed1 \
    --out tools/out/quality_gate_canonical_r5.json

phase 2 "gate arm rays_f32 (bf16-ray relight isolation)" 9000 \
  python tools/quality_gate.py --iters 2000 --img 512 --canonical \
    --root /tmp/rnr_qgate_r5 --ablations rays_f32 \
    --out tools/out/quality_gate_canonical_r5.json

phase 3 "re-render tables after isolation arms" 600 \
  python tools/render_perf_tables.py

echo "=== r5 followon5 done $(date) ===" >> "$LOG"
date > /tmp/r5f5_done.flag

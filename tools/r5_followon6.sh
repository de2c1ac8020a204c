#!/bin/bash
# Round-5 follow-on #6: after the followon5 isolation arms land,
# recompute the display-referred (clipped8) relight columns for EVERY
# arm present in the gate root — including the f3 "ship" arm and the
# f5 seed1/rays_f32 isolation arms — and re-render the quality tables.
# Host-only work (reval_ssim forces CPU), so no tunnel coordination
# beyond waiting for the flag.
#
#   nohup tools/r5_followon6.sh > /dev/null 2>&1 &
#
# Log: /tmp/r5f6.log   Done flag: /tmp/r5f6_done.flag

set -u
cd /root/repo
LOG=/tmp/r5f6.log
echo "=== r5 followon6 start $(date) ===" >> "$LOG"

until [ -f /tmp/r5f5_done.flag ]; do sleep 120; done
echo "followon5 done, starting $(date)" >> "$LOG"

phase() {  # phase <n> <desc> <timeout_s> <cmd...>
  local n="$1"; shift
  local desc="$1"; shift
  local to="$1"; shift
  if [ -f "/tmp/r5f6_phase_${n}.done" ]; then
    echo "phase $n ($desc) already done, skip" >> "$LOG"
    return 0
  fi
  echo "--- phase $n: $desc $(date) ---" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "phase $n rc=$rc $(date)" >> "$LOG"
  [ $rc -eq 0 ] && touch "/tmp/r5f6_phase_${n}.done"
  git add -A >> "$LOG" 2>&1
  git commit -q -m "r5 followon6: $desc (rc=$rc)" >> "$LOG" 2>&1 || true
  return $rc
}

phase 1 "display-referred reval over all gate arms" 1200 \
  python tools/reval_ssim.py --root /tmp/rnr_qgate_r5 \
    --out tools/out/reval_ssim_r5.json

phase 2 "re-render quality tables with reval columns" 600 \
  python tools/render_perf_tables.py

echo "=== r5 followon6 done $(date) ===" >> "$LOG"
date > /tmp/r5f6_done.flag

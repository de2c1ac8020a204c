#!/bin/bash
# Phase 6 of the round-3 on-device chain: canonical-scale quality gate
# (VERDICT r2 item 4).  Waits for the measurement queue
# (tools/r3_ondevice_queue.sh) to release the single-client TPU tunnel,
# then runs the REAL driver pipeline at the shipped 512^2 canonical
# config for the three decisive ablation cells:
#   default_strat  shipped TPU-first graph defaults
#   exact          reference-exact kNN semantics
#   r3_fast        round-3 perf defaults (bf16 rays + Pallas convs)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
exec >> /tmp/r3_gate.log 2>&1

QUEUE_PID="${1:-}"
while [ ! -f /tmp/r3b_done.flag ]; do
    if [ -n "$QUEUE_PID" ] && ! kill -0 "$QUEUE_PID" 2>/dev/null; then
        echo "queue pid $QUEUE_PID gone without done-flag; proceeding"
        break
    fi
    sleep 120
done

echo "=== [$(date +%H:%M:%S)] canonical quality gate starting"
timeout 10800 python tools/quality_gate.py --canonical --img 512 \
    --iters 2000 --ablations default_strat,exact,r3_fast \
    | tee /tmp/r3_gate_stdout.log
grep -o 'QUALITY_GATE .*' /tmp/r3_gate_stdout.log | tail -1 \
    | sed 's/^QUALITY_GATE //' > tools/out/quality_gate_canonical_r3.json
if [ -s tools/out/quality_gate_canonical_r3.json ]; then
    git add -f tools/out/quality_gate_canonical_r3.json
    git diff --cached --quiet || git commit -q -m \
"Canonical-scale on-device quality gate: stratified vs exact kNN vs round-3 fast defaults (512^2, 2k iters)"
fi
echo "=== [$(date +%H:%M:%S)] gate done"
touch /tmp/r3_gate_done.flag

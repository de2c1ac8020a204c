#!/bin/bash
# Round-3 follow-on chain: re-measure the two cells that failed their
# Mosaic/VMEM compiles before the kernel fixes (sh_pallas scoped-VMEM
# budget; conv_pallas lane-offset concatenate removal), refresh the
# kernel-gate artifact with the fixed kernels, then run the canonical
# 512^2 quality gate.  Single sequential TPU client chain; waits for
# tools/r3_ondevice_queue.sh to finish first.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
QUEUE_PID="${1:-}"
exec >> /tmp/r3_followon.log 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_artifacts() {
    git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json \
        tools/out/kernels_gates.json KERNELS_r03.json \
        tools/out/bench_preview_r3.json \
        tools/out/quality_gate_canonical_r3.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

stamp "waiting for main queue"
while [ ! -f /tmp/r3b_done.flag ]; do
    if [ -n "$QUEUE_PID" ] && ! kill -0 "$QUEUE_PID" 2>/dev/null; then
        stamp "queue pid $QUEUE_PID gone without done-flag; proceeding"
        break
    fi
    sleep 120
done

# ---- re-run the previously-failing step cells with fixed kernels ------
stamp "step cells: xla/f32 (fixed SH bwd budget), pallas/bf16 (fixed convs)"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="xla:float32,pallas:bfloat16" \
    timeout 3600 python tools/tpu_bench_r3.py
commit_artifacts "On-device re-run of the fixed-kernel step cells (f32 SH bwd, tap-wise Pallas convs)"

# ---- re-pick best config ----------------------------------------------
stamp "re-pick best config"
python - <<'EOF'
import json, os
path = "tools/out/tpu_bench_r3.json"
best = {"conv_backend": "xla", "rays_dtype": "bfloat16",
        "gcn_dtype": "float32"}
try:
    rows = json.load(open(path)).get("step_b1", {})
    ok = {t: r for t, r in rows.items()
          if r.get("loss_finite") and "ms" in r}
    if ok:
        tag = min(ok, key=lambda t: ok[t]["ms"])
        conv, rays = tag.rsplit("_", 1)
        best = {"conv_backend": conv, "rays_dtype": rays,
                "gcn_dtype": "float32",
                "source": f"tpu_bench_r3 step_b1 {tag} "
                          f"{ok[tag]['ms']} ms"}
except Exception as e:
    best["picker_error"] = repr(e)
json.dump(best, open("tools/out/best_config.json", "w"), indent=1)
print("best_config:", best, flush=True)
EOF
commit_artifacts "best_config.json refresh after fixed-kernel cells"
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "best: conv=$BEST_CONV rays=$BEST_RAYS"

# ---- refresh kernel gates with the fixed kernels ----------------------
stamp "tpu_smoke with fixed kernels"
KERNELS_JSON=KERNELS_r03.json timeout 2400 python tools/tpu_smoke.py
commit_artifacts "KERNELS_r03.json: kernel gates re-run with the fixed Pallas kernels"

# ---- if the winner changed to pallas, refresh batch/infer + preview ---
if [ "$BEST_CONV" = "pallas" ]; then
    stamp "pallas won: refresh batch/infer cells + bench preview"
    R3_UNET=0 R3_STEP=0 R3_BATCH=1 R3_INFER=1 R3_STEPS=4 \
    R3_BATCH_CELLS="2:none,4:wide" \
    R3_BEST_CONV="$BEST_CONV" R3_BEST_RAYS="$BEST_RAYS" \
        timeout 3000 python tools/tpu_bench_r3.py
    commit_artifacts "Batch/inference cells refreshed for the pallas conv winner"
    BENCH_1024=1 timeout 4200 python bench.py > tools/out/bench_preview_r3.json
    cat tools/out/bench_preview_r3.json
    commit_artifacts "Bench preview refreshed for the pallas conv winner"
fi

# ---- canonical-scale quality gate (VERDICT r2 item 4) -----------------
stamp "canonical 512^2 quality gate"
timeout 10800 python tools/quality_gate.py --canonical --img 512 \
    --iters 2000 --ablations default_strat,exact,r3_fast \
    | tee /tmp/r3_gate_stdout.log
grep -o 'QUALITY_GATE .*' /tmp/r3_gate_stdout.log | tail -1 \
    | sed 's/^QUALITY_GATE //' > tools/out/quality_gate_canonical_r3.json
commit_artifacts "Canonical-scale on-device quality gate: stratified vs exact kNN vs round-3 fast defaults (512^2, 2k iters)"

stamp "follow-on complete"
touch /tmp/r3_followon_done.flag

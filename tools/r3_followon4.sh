#!/bin/bash
# Round-3 chain, part 4: measure the Pallas conv path after the second
# Mosaic rework (row-parity planes in down4 — no 16-bit strided loads —
# and per-parity outputs in convt4 — no in-kernel interleave reshape).
# Waits for the part-3 chain (canonical gate) to release the tunnel.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PREV_PID="${1:-}"
exec >> /tmp/r3e.log 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_artifacts() {
    git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json \
        tools/out/kernels_gates.json KERNELS_r03.json \
        tools/out/bench_preview_r3.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

stamp "waiting for part-3 (pid ${PREV_PID:-none})"
while [ ! -f /tmp/r3d_done.flag ]; do
    if [ -n "$PREV_PID" ] && ! kill -0 "$PREV_PID" 2>/dev/null; then
        stamp "part-3 pid gone without done-flag; proceeding"
        break
    fi
    sleep 60
done

stamp "phase F: pallas/bf16 step cell (row-parity down4, split-output convt4)"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="pallas:bfloat16" \
    timeout 2400 python tools/tpu_bench_r3.py
commit_artifacts "On-device pallas conv step cell after the strided-load/interleave rework"

stamp "phase G: re-pick best config"
python - <<'EOF'
import json
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
commit_artifacts "best_config.json refresh after the reworked pallas cell"
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "best: conv=$BEST_CONV rays=$BEST_RAYS"

stamp "phase H: unet conv kernel gates refresh"
KERNELS_JSON=KERNELS_r03.json timeout 2400 python tools/tpu_smoke.py
commit_artifacts "KERNELS_r03.json refresh after the strided-load/interleave rework"

if [ "$BEST_CONV" = "pallas" ]; then
    stamp "phase I: pallas won — refresh batch/infer + bench preview"
    R3_UNET=0 R3_STEP=0 R3_BATCH=1 R3_INFER=1 R3_STEPS=4 \
    R3_BATCH_CELLS="2:none,4:wide" \
    R3_BEST_CONV="$BEST_CONV" R3_BEST_RAYS="$BEST_RAYS" \
        timeout 2400 python tools/tpu_bench_r3.py
    commit_artifacts "Batch/inference cells refreshed for the pallas conv winner"
    BENCH_1024=0 timeout 3000 python bench.py > tools/out/bench_preview_r3.json
    cat tools/out/bench_preview_r3.json
    commit_artifacts "Bench preview refreshed for the pallas conv winner"
fi

stamp "part-4 chain complete"
touch /tmp/r3e_done.flag

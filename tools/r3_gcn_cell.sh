#!/bin/bash
# Final link of the round-3 on-device chain: measure the bf16 GCN
# compute option (quality-neutral per the recorded precision ablation)
# on top of the winning conv/rays config, and promote it into
# tools/out/best_config.json if it is faster with a finite loss.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
PREV_PID="${1:-}"
exec >> /tmp/r3_gcn.log 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

stamp "waiting for follow-on chain"
while [ ! -f /tmp/r3_followon_done.flag ]; do
    if [ -n "$PREV_PID" ] && ! kill -0 "$PREV_PID" 2>/dev/null; then
        stamp "follow-on pid $PREV_PID gone without done-flag; proceeding"
        break
    fi
    sleep 180
done

BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "gcn-bf16 cell on $BEST_CONV/$BEST_RAYS"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="$BEST_CONV:$BEST_RAYS" R3_GCN_DTYPE=bfloat16 \
    timeout 3000 python tools/tpu_bench_r3.py

python - <<'EOF'
import json
res = json.load(open("tools/out/tpu_bench_r3.json"))["step_b1"]
best = json.load(open("tools/out/best_config.json"))
base_tag = f"{best['conv_backend']}_{best['rays_dtype']}"
base = res.get(base_tag, {})
cell = res.get(base_tag + "+gcnbf16", {})
if (cell.get("loss_finite") and "ms" in cell and "ms" in base
        and cell["ms"] < base["ms"]):
    best["gcn_dtype"] = "bfloat16"
    best["source"] += (f"; gcn bf16 {cell['ms']} ms < {base['ms']} ms "
                       "(promoted)")
    json.dump(best, open("tools/out/best_config.json", "w"), indent=1)
    print("promoted gcn bf16:", cell, flush=True)
else:
    print("gcn bf16 not promoted:", cell, "vs", base, flush=True)
EOF

git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json
git diff --cached --quiet || git commit -q -m \
"On-device GCN bf16 compute cell; promote into tuned defaults if faster"

# refresh the bench preview only if the tuned default changed
if python -c "import json,sys; sys.exit(0 if json.load(open('tools/out/best_config.json'))['gcn_dtype']=='bfloat16' else 1)"; then
    stamp "gcn bf16 promoted: refresh bench preview"
    BENCH_1024=0 timeout 3000 python bench.py > tools/out/bench_preview_r3.json
    cat tools/out/bench_preview_r3.json
    git add -f tools/out/bench_preview_r3.json
    git diff --cached --quiet || git commit -q -m \
"Bench preview refreshed with bf16 GCN tuned default"
fi

stamp "gcn cell done"
touch /tmp/r3_gcn_done.flag

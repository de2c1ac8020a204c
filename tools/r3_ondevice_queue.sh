#!/bin/bash
# Round-3 on-device measurement queue (post-outage continuation).
#
# ONE sequential TPU client chain — the tunnel serves a single process
# and a killed client wedges the grant for ~20 min, so every phase runs
# under `timeout`, phases never overlap, and nothing is killed by
# pattern.  Artifacts are committed after each phase so a mid-queue
# tunnel death still leaves recorded evidence.
#
# Phases:
#   0  wait for a successful TPU probe (reuses /tmp/tpu_probe.log)
#   1  full-step A/B: conv backend x rays dtype (3 cells)
#   2  pick winner -> tools/out/best_config.json (bench.py tuned default)
#   3  tools/tpu_smoke.py -> KERNELS_r03.json kernel gates + timings
#   4  batch/infer cells with the winning config (b2/none, b4/wide)
#   5  full bench.py preview incl. 1024^2 (also warms the driver's
#      compile cache for the round-end BENCH capture)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
LOG=/tmp/r3b.log
exec >> "$LOG" 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_artifacts() {
    git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json \
        tools/out/kernels_gates.json KERNELS_r03.json \
        tools/out/bench_preview_r3.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

# ---- phase 0: probe ---------------------------------------------------
stamp "phase 0: waiting for TPU probe"
PROBE_PID="${1:-}"
while ! grep -q TPU_OK /tmp/tpu_probe.log 2>/dev/null; do
    if [ -n "$PROBE_PID" ] && kill -0 "$PROBE_PID" 2>/dev/null; then
        sleep 60
        continue
    fi
    stamp "running own probe (30 min timeout)"
    timeout 1800 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones((256,256)))), flush=True)
" >> /tmp/tpu_probe.log 2>&1 || { stamp "probe failed; sleep 10 min"; sleep 600; }
    PROBE_PID=""
done
stamp "TPU is up"

# ---- phase 1: step A/B ------------------------------------------------
stamp "phase 1: step A/B (xla/f32 anchor, xla/bf16, pallas/bf16)"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="xla:float32,xla:bfloat16,pallas:bfloat16" \
    timeout 3000 python tools/tpu_bench_r3.py
commit_artifacts "On-device round-3 step A/B: conv backend x rays dtype"

# ---- phase 2: picker --------------------------------------------------
stamp "phase 2: pick best config"
python - <<'EOF'
import json, os
path = "tools/out/tpu_bench_r3.json"
best = {"conv_backend": "xla", "rays_dtype": "float32",
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
os.makedirs("tools/out", exist_ok=True)
json.dump(best, open("tools/out/best_config.json", "w"), indent=1)
print("best_config:", best, flush=True)
EOF
commit_artifacts "tools/out/best_config.json: tuned defaults from on-device A/B"
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "best: conv=$BEST_CONV rays=$BEST_RAYS"

# ---- phase 3: kernel gates --------------------------------------------
stamp "phase 3: tpu_smoke kernel gates"
KERNELS_JSON=KERNELS_r03.json timeout 2400 python tools/tpu_smoke.py
commit_artifacts "KERNELS_r03.json: on-device kernel oracle gates + timings"

# ---- phase 4: batch/infer with best config ----------------------------
stamp "phase 4: batch (b2/none, b4/wide) + inference"
R3_UNET=0 R3_STEP=0 R3_BATCH=1 R3_INFER=1 R3_STEPS=4 \
R3_BATCH_CELLS="2:none,4:wide" \
R3_BEST_CONV="$BEST_CONV" R3_BEST_RAYS="$BEST_RAYS" \
    timeout 3000 python tools/tpu_bench_r3.py
commit_artifacts "On-device round-3 batch/inference cells (best config)"

# ---- phase 5: bench preview (warms driver cache) ----------------------
stamp "phase 5: full bench.py preview"
BENCH_1024=1 timeout 4200 python bench.py > tools/out/bench_preview_r3.json
cat tools/out/bench_preview_r3.json
commit_artifacts "Round-3 bench preview (tuned config, incl. 1024^2)"

stamp "queue complete"
touch /tmp/r3b_done.flag

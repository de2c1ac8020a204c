#!/bin/bash
# Round-3 continuation chain (post-container-restart: /tmp state and the
# JAX compile cache were wiped, so the original r3_ondevice_queue /
# r3_followon flags are gone and every compile is cold again).
#
# ONE sequential TPU client chain — the tunnel serves a single process
# and a killed client wedges the grant ~20 min, so every phase runs
# under `timeout`, phases never overlap, nothing is killed by pattern.
# Artifacts are committed after each phase.
#
# Phases (value-ordered for a hard wall-clock cutoff):
#   0  TPU probe
#   1  step cells that failed their pre-fix compiles: xla/f32 (SH bwd
#      VMEM budget fix), pallas/bf16 (tap-wise conv kernels) — these are
#      the ONLY round-3 kernels never measured on-device
#   2  re-pick best config (deep-merged rows keep the xla/bf16 157.9 ms
#      record) -> tools/out/best_config.json consumed by bench.py
#   3  tpu_smoke -> KERNELS_r03.json (round-over-round kernel gates)
#   4  if pallas won: batch/infer cells with the new winner
#   5  bench.py preview — numbers + warms the compile cache the driver's
#      round-end BENCH capture will hit
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
exec >> /tmp/r3c.log 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_artifacts() {
    git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json \
        tools/out/kernels_gates.json KERNELS_r03.json \
        tools/out/bench_preview_r3.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

# ---- phase 0: probe ---------------------------------------------------
stamp "phase 0: TPU probe (25 min timeout)"
if ! timeout 1800 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones((256,256)))), flush=True)
"; then
    stamp "probe failed — tunnel down; aborting chain"
    touch /tmp/r3c_done.flag
    exit 1
fi
stamp "TPU is up"

# ---- phase 1: fixed-kernel step cells ----------------------------------
stamp "phase 1: step cells pallas/bf16 + xla/f32 (post-fix, cold cache)"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="pallas:bfloat16,xla:float32" \
    timeout 2700 python tools/tpu_bench_r3.py
commit_artifacts "On-device step cells for the fixed round-3 kernels (tap-wise Pallas convs, SH bwd VMEM budget)"

# ---- phase 2: re-pick best config --------------------------------------
stamp "phase 2: re-pick best config"
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
commit_artifacts "best_config.json refresh after the fixed-kernel cells"
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "best: conv=$BEST_CONV rays=$BEST_RAYS"

# ---- phase 3: kernel gates ---------------------------------------------
stamp "phase 3: tpu_smoke kernel gates -> KERNELS_r03.json"
KERNELS_JSON=KERNELS_r03.json timeout 2400 python tools/tpu_smoke.py
commit_artifacts "KERNELS_r03.json: on-device kernel oracle gates + timings (fixed kernels)"

# ---- phase 4: batch/infer refresh if the winner changed -----------------
if [ "$BEST_CONV" = "pallas" ]; then
    stamp "phase 4: pallas won — refresh batch/infer cells"
    R3_UNET=0 R3_STEP=0 R3_BATCH=1 R3_INFER=1 R3_STEPS=4 \
    R3_BATCH_CELLS="2:none,4:wide" \
    R3_BEST_CONV="$BEST_CONV" R3_BEST_RAYS="$BEST_RAYS" \
        timeout 2400 python tools/tpu_bench_r3.py
    commit_artifacts "Batch/inference cells refreshed for the pallas conv winner"
fi

# ---- phase 5: bench preview (numbers + driver cache warm) ---------------
stamp "phase 5: bench.py preview"
BENCH_1024=1 timeout 3600 python bench.py > tools/out/bench_preview_r3.json
cat tools/out/bench_preview_r3.json
commit_artifacts "Round-3 bench preview (tuned config, incl. 1024^2)"

stamp "chain complete"
touch /tmp/r3c_done.flag

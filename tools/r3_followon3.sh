#!/bin/bash
# Round-3 chain, part 3: runs after tools/r3_followon2.sh releases the
# single-client TPU tunnel.  Re-measures the Pallas conv path with the
# DMA-tile-alignment fix (pad W+2 to 8, C to 128 before the pallas_call
# — Mosaic rejects any HBM memref_slice whose extent along a tiled dim
# isn't tile-aligned, which killed every conv cell twice), refreshes the
# kernel-gate artifact, re-picks the bench config, then runs the
# canonical quality gate.  Sequential; every phase under timeout;
# nothing killed by pattern.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
CHAIN_PID="${1:-}"
exec >> /tmp/r3d.log 2>&1

stamp() { echo "=== [$(date +%H:%M:%S)] $*"; }

commit_artifacts() {
    git add -f tools/out/tpu_bench_r3.json tools/out/best_config.json \
        tools/out/kernels_gates.json KERNELS_r03.json \
        tools/out/bench_preview_r3.json \
        tools/out/quality_gate_canonical_r3.json 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

stamp "waiting for the part-2 chain (pid ${CHAIN_PID:-none})"
while [ ! -f /tmp/r3c_done.flag ]; do
    if [ -n "$CHAIN_PID" ] && ! kill -0 "$CHAIN_PID" 2>/dev/null; then
        stamp "chain pid gone without done-flag; proceeding"
        break
    fi
    sleep 60
done

# ---- phase A: aligned Pallas conv step cell -----------------------------
stamp "phase A: pallas/bf16 step cell (DMA-alignment fix)"
R3_UNET=0 R3_STEP=1 R3_BATCH=0 R3_INFER=0 R3_STEPS=4 \
R3_STEP_CELLS="pallas:bfloat16" \
    timeout 2400 python tools/tpu_bench_r3.py
commit_artifacts "On-device pallas conv step cell with DMA-tile-aligned halo copies"

# ---- phase B: re-pick ----------------------------------------------------
stamp "phase B: re-pick best config"
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
commit_artifacts "best_config.json refresh after the aligned pallas cell"
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
BEST_RAYS=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['rays_dtype'])")
stamp "best: conv=$BEST_CONV rays=$BEST_RAYS"

# ---- phase C: refresh kernel gates with the aligned kernels --------------
stamp "phase C: tpu_smoke refresh"
KERNELS_JSON=KERNELS_r03.json timeout 2400 python tools/tpu_smoke.py
commit_artifacts "KERNELS_r03.json refresh: conv gates with DMA-tile-aligned kernels"

# ---- phase D: winner-dependent batch/infer + bench preview ---------------
if [ "$BEST_CONV" = "pallas" ]; then
    stamp "phase D: pallas won — refresh batch/infer + bench preview"
    R3_UNET=0 R3_STEP=0 R3_BATCH=1 R3_INFER=1 R3_STEPS=4 \
    R3_BATCH_CELLS="2:none,4:wide" \
    R3_BEST_CONV="$BEST_CONV" R3_BEST_RAYS="$BEST_RAYS" \
        timeout 2400 python tools/tpu_bench_r3.py
    commit_artifacts "Batch/inference cells refreshed for the pallas conv winner"
    BENCH_1024=0 timeout 3000 python bench.py > tools/out/bench_preview_r3.json
    cat tools/out/bench_preview_r3.json
    commit_artifacts "Bench preview refreshed for the pallas conv winner"
fi

# ---- phase E: canonical 512^2 quality gate -------------------------------
stamp "phase E: canonical quality gate"
timeout 10800 python tools/quality_gate.py --canonical --img 512 \
    --iters 2000 --ablations default_strat,exact,r3_fast \
    | tee /tmp/r3_gate_stdout.log
grep -o 'QUALITY_GATE .*' /tmp/r3_gate_stdout.log | tail -1 \
    | sed 's/^QUALITY_GATE //' > tools/out/quality_gate_canonical_r3.json
commit_artifacts "Canonical-scale on-device quality gate: stratified vs exact kNN vs round-3 fast defaults (512^2, 2k iters)"

stamp "part-3 chain complete"
touch /tmp/r3d_done.flag

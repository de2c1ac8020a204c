#!/bin/bash
# Round-4 follow-on: waits for r4_queue2 to finish, then
#   A. re-runs tpu_smoke with the scalar-fetch sync (honest timings),
#   B. measures the GCN bf16-compute step cell (shipped r3, unmeasured),
#   C. refreshes bench.py if anything changed the best config.
# Log: /tmp/r4f.log   Done flag: /tmp/r4f_done.flag
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

for i in $(seq 1 720); do
  [ -f /tmp/r4q2_done.flag ] && break
  sleep 60
done
if [ ! -f /tmp/r4q2_done.flag ]; then
  echo "queue2 never finished; aborting follow-on"
  exit 1
fi

echo "=== phase A: tpu_smoke rerun (scalar-fetch sync) ==="
timeout 3600 env KERNELS_JSON=KERNELS_r04.json python tools/tpu_smoke.py || true
git add -A KERNELS_r04.json 2>/dev/null
git commit -q -m "KERNELS_r04: re-timed gates with one-scalar-fetch sync" || true

echo "=== phase B: GCN bf16-compute step cell ==="
timeout 7000 env BENCH_JSON=tpu_bench_r4.json R3_UNET=0 R3_BATCH=0 \
  R3_INFER=0 R3_STEP=1 R3_GCN_DTYPE=bfloat16 \
  R3_STEP_CELLS="xla:bfloat16" python tools/tpu_bench_r3.py || true
git add tools/out && git commit -q -m "tpu_bench_r4: gcn bf16-compute step cell" || true

echo "=== phase C: pick best config across all cells ==="
python - <<'EOF'
import json
rows = json.load(open("tools/out/tpu_bench_r4.json"))["step_b1"]
best, best_ms = None, 1e9
for tag, r in rows.items():
    if isinstance(r, dict) and r.get("ms") and r.get("loss_finite", True):
        if r["ms"] < best_ms:
            best, best_ms = tag, r["ms"]
print("BEST:", best, best_ms)
conv = "pallas" if best and best.startswith("pallas") else "xla"
gcn = "bfloat16" if best and "+gcnbf16" in best else "float32"
cfg = {"conv_backend": conv, "rays_dtype": "bfloat16", "gcn_dtype": gcn,
       "source": f"tpu_bench_r4 step_b1 {best} {best_ms} ms"}
json.dump(cfg, open("tools/out/best_config.json", "w"), indent=1)
EOF
git add tools/out && git commit -q -m "best_config: refresh across round-4 cells" || true

echo "=== phase D: bench refresh at final best config ==="
timeout 2400 python bench.py | tee /tmp/r4f_bench.log || true
git add -A tools/out 2>/dev/null
git commit -q -m "round-4 bench refresh (follow-on)" || true

touch /tmp/r4f_done.flag
echo FOLLOWON DONE

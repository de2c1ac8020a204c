#!/bin/bash
# Round-4 on-device queue: kernel gates -> full-step A/B -> canonical
# 512^2 quality gate.  One TPU client at a time, everything under
# timeout, artifacts committed per phase (CLAUDE.md tunnel rules).
# Log: /tmp/r4q.log   Done flag: /tmp/r4q_done.flag
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== phase A: tpu_smoke -> KERNELS_r04.json ==="
timeout 3600 env KERNELS_JSON=KERNELS_r04.json python tools/tpu_smoke.py
git add -A KERNELS_r04.json tools/out 2>/dev/null
git commit -q -m "KERNELS_r04: on-device kernel gates (split SH cells, shard_map gate, reworked raster backward)" || true

echo "=== phase B: full-step conv/sh A/B -> tpu_bench_r4.json ==="
timeout 7000 env BENCH_JSON=tpu_bench_r4.json R3_UNET=0 R3_BATCH=0 \
  R3_INFER=0 R3_STEP=1 \
  R3_STEP_CELLS="xla:bfloat16,pallas:bfloat16,xla:bfloat16:xla" \
  python tools/tpu_bench_r3.py
git add tools/out && git commit -q -m "tpu_bench_r4: 512^2 full-step A/B (conv xla vs pallas, sh pallas vs xla)" || true

echo "=== phase B2: pick best config, batch + infer cells ==="
python - <<'EOF'
import json
p = "tools/out/tpu_bench_r4.json"
try:
    rows = json.load(open(p))["step_b1"]
except Exception:
    rows = {}
best, best_ms = None, 1e9
for tag, r in rows.items():
    if isinstance(r, dict) and r.get("ms") and r.get("loss_finite", True):
        if r["ms"] < best_ms:
            best, best_ms = tag, r["ms"]
print("BEST:", best, best_ms)
if best:
    conv = "pallas" if best.startswith("pallas") else "xla"
    cfg = {"conv_backend": conv, "rays_dtype": "bfloat16",
           "gcn_dtype": "float32",
           "source": f"tpu_bench_r4 step_b1 {best} {best_ms} ms"}
    json.dump(cfg, open("tools/out/best_config.json", "w"), indent=1)
EOF
BEST_CONV=$(python -c "import json;print(json.load(open('tools/out/best_config.json'))['conv_backend'])")
timeout 7000 env BENCH_JSON=tpu_bench_r4.json R3_UNET=0 R3_STEP=0 \
  R3_BATCH=1 R3_INFER=1 R3_BEST_CONV="$BEST_CONV" \
  R3_BEST_RAYS=bfloat16 R3_BATCH_CELLS="2:none,4:wide" \
  python tools/tpu_bench_r3.py
git add tools/out && git commit -q -m "tpu_bench_r4: batch/infer cells at best config" || true

echo "=== phase C: canonical 512^2 quality gate (2k iters) ==="
timeout 28800 python tools/quality_gate.py --canonical --img 512 \
  --iters 2000 --root /root/qgate_scene_r4 \
  --ablations rays_bf16,exact,gcn_norm_batch,r3_fast \
  2>&1 | tee /tmp/r4_qgate.log
python - <<'EOF'
import re
txt = open("/tmp/r4_qgate.log").read()
m = re.search(r"QUALITY_GATE (\{.*\})", txt)
if m:
    open("tools/out/quality_gate_canonical_r4.json", "w").write(m.group(1))
    print("gate json written")
else:
    print("NO QUALITY_GATE LINE FOUND")
EOF
git add tools/out && git commit -q -m "quality_gate_canonical_r4: 512^2 2k-iter arms (rays_bf16 defaults, exact ref, gcn norm batch, conv pallas)" || true

echo "=== phase D: bench.py refresh ==="
timeout 2400 python bench.py | tee /tmp/r4_bench.log
git add -A tools/out && git commit -q -m "round-4 bench preview" || true

touch /tmp/r4q_done.flag
echo QUEUE DONE

#!/bin/bash
# Round-4 follow-up on-device queue (after the conv VMEM-budget fix and
# the subprocess-isolated quality gate).  One TPU client at a time,
# everything under timeout, artifacts committed per phase.
# Log: /tmp/r4q2.log   Done flag: /tmp/r4q2_done.flag
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== phase 0: TPU probe ==="
if ! timeout 1800 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones((256,256)))), flush=True)
"; then
  echo "PROBE FAILED — tunnel down; aborting queue"
  exit 1
fi

echo "=== phase A: tpu_smoke -> KERNELS_r04.json (incremental) ==="
if ! timeout 3600 env KERNELS_JSON=KERNELS_r04.json python tools/tpu_smoke.py; then
  echo "smoke failed; waiting 300 s and retrying once (transient-tunnel lesson)"
  sleep 300
  timeout 3600 env KERNELS_JSON=KERNELS_r04.json python tools/tpu_smoke.py || true
fi
git add -A KERNELS_r04.json tools/out 2>/dev/null
git commit -q -m "KERNELS_r04: on-device kernel gates after conv VMEM-budget fix" || true

echo "=== phase B: conv A/B with fixed tile budgets ==="
timeout 7000 env BENCH_JSON=tpu_bench_r4.json R3_UNET=0 R3_BATCH=0 \
  R3_INFER=0 R3_STEP=1 R3_STEP_CELLS="pallas:bfloat16" \
  python tools/tpu_bench_r3.py || true
git add tools/out && git commit -q -m "tpu_bench_r4: pallas conv full-step cell after VMEM-budget fix" || true

echo "=== phase B2: refresh best config; batch/infer only if pallas wins ==="
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
cfg = {"conv_backend": conv, "rays_dtype": "bfloat16",
       "gcn_dtype": "float32",
       "source": f"tpu_bench_r4 step_b1 {best} {best_ms} ms"}
json.dump(cfg, open("tools/out/best_config.json", "w"), indent=1)
open("/tmp/r4_best_conv.txt", "w").write(conv)
EOF
BEST_CONV=$(cat /tmp/r4_best_conv.txt)
if [ "$BEST_CONV" = "pallas" ]; then
  timeout 7000 env BENCH_JSON=tpu_bench_r4.json R3_UNET=0 R3_STEP=0 \
    R3_BATCH=1 R3_INFER=1 R3_BEST_CONV=pallas R3_BEST_RAYS=bfloat16 \
    R3_BATCH_CELLS="2:none,4:wide" python tools/tpu_bench_r3.py || true
fi
git add tools/out && git commit -q -m "tpu_bench_r4: best-config refresh" || true

echo "=== phase C: host-RSS leak probe ==="
timeout 1800 python tools/leak_probe.py 2>&1 | tee /tmp/r4_leak.log || true
cp /tmp/r4_leak.log tools/out/leak_probe_r4.log || true
git add tools/out && git commit -q -m "leak_probe_r4: host-RSS growth per device_put/fetch leg" || true

echo "=== phase D: canonical quality gate, subprocess-isolated arms ==="
timeout 21600 python tools/quality_gate.py --canonical --img 512 \
  --iters 2000 --root /root/qgate_scene_r4 \
  --ablations rays_bf16,gcn_norm_batch,exact,r3_fast \
  --out tools/out/quality_gate_canonical_r4.json \
  2>&1 | tee /tmp/r4_qgate2.log || true
git add tools/out && git commit -q -m "quality_gate_canonical_r4: 512^2 2k-iter arms (subprocess-isolated)" || true

echo "=== phase E: bench.py refresh ==="
timeout 2400 python bench.py | tee /tmp/r4_bench2.log || true
git add -A tools/out BENCH_r04.json 2>/dev/null
git commit -q -m "round-4 bench refresh" || true

touch /tmp/r4q2_done.flag
echo QUEUE DONE

"""Update tools/out/best_config.json from the r5 step_b1 A/B cells."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = "tools/out/tpu_bench_r5.json"
OUT = "tools/out/best_config.json"


def main():
    with open(BENCH) as f:
        cells = json.load(f)["step_b1"]
    finite = {k: v for k, v in cells.items()
              if v.get("loss_finite", True)}
    best = min(finite.items(), key=lambda kv: kv[1]["ms"])
    # cell key: "<conv>:<fan|nofan>[:r<K>][:<rays_dtype>]"
    parts = best[0].split(":")
    conv, fan_s = parts[0], parts[1]
    refresh, rays_dtype = 1, "bfloat16"
    for p in parts[2:]:
        if p.startswith("r") and p[1:].isdigit():
            refresh = int(p[1:])
        elif p in ("float32", "bfloat16"):
            rays_dtype = p
    cur = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            cur = json.load(f)
    # record the EXPLICIT winner; if it isn't what "auto" resolves to,
    # flipping the auto resolution (models/unet.py) is a follow-up
    # code change, not a config write
    cur.update({
        "conv_backend": conv,
        "rays_dtype": rays_dtype,
        "gcn_dtype": "float32",
        "sh_fan_fuse": fan_s == "fan",
        "graph_refresh_every": refresh,
        "source": "tpu_bench_r5 step_b1: " + ", ".join(
            f"{k} {v['ms']}ms" for k, v in sorted(
                cells.items(), key=lambda kv: kv[1]["ms"])),
    })
    with open(OUT, "w") as f:
        json.dump(cur, f, indent=1)
    print("best cell:", best[0], best[1], "->", OUT)


if __name__ == "__main__":
    main()

"""Round-4 on-device probe #5: gather cost vs source layout.

onehot_probe_r4 ruled out matmul-gathers; XLA's gather itself is ~50 ms
for [S^2] rows of 9 floats from [F, 9].  Hypothesis: the gathered slice
is 9 lanes (<128), so each row transfer wastes >90% of the vector width.
Cells gather the same 262k rows from sources padded to different lane
widths, plus per-plane scalar gathers:

  g_rows_w{9,16,128}   [S^2, W] from [F, W]
  g_scalar_x9          nine [S^2] gathers from [F] planes
  g_taps_c{3,128}      2.1M tap rows from [F*8, C] (texture case)

Writes tools/out/gather_probe_r4.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    S = 512
    F = 12000
    P = S * S
    rng = np.random.default_rng(0)
    idx_np = np.repeat(rng.integers(0, F, P // 16).astype(np.int32), 16)
    idx = jnp.asarray(idx_np)

    results = {"backend": jax.default_backend(), "cells": {}}
    STEPS = int(os.environ.get("R4_STEPS", 5))

    def sync(x):
        float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def cell(tag, fn, *args):
        try:
            out = fn(*args)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = fn(*args)
            sync(out)
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            results["cells"][tag] = round(ms, 2)
            print(f"{tag:24s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            results["cells"][tag] = {"error": repr(e)[:250]}
            print(f"{tag:24s} FAILED {e!r}", flush=True)

    for wlanes in (9, 16, 128):
        src = jnp.asarray(
            rng.standard_normal((F, wlanes)).astype(np.float32))
        cell(f"g_rows_w{wlanes}", jax.jit(lambda i_, s_: s_[i_]),
             idx, src)

    planes = jnp.asarray(rng.standard_normal((9, F)).astype(np.float32))

    def scalar9(i_, pl_):
        return jnp.stack([pl_[k][i_] for k in range(9)], -1)

    cell("g_scalar_x9", jax.jit(scalar9), idx, planes)

    tap_idx = jnp.asarray(
        np.repeat(rng.integers(0, F * 8, P // 2).astype(np.int32), 8))
    for c in (3, 128):
        src = jnp.asarray(
            rng.standard_normal((F * 8, c)).astype(np.float32))
        cell(f"g_taps_c{c}", jax.jit(lambda i_, s_: s_[i_]),
             tap_idx, src)

    # sum-of-8-taps variant: gather all 8 corners as one 24-wide row
    src24 = jnp.asarray(rng.standard_normal((F, 24)).astype(np.float32))
    cell("g_rows_w24", jax.jit(lambda i_, s_: s_[i_]), idx, src24)
    src24p = jnp.pad(src24, ((0, 0), (0, 128 - 24)))
    cell("g_rows_w24pad128", jax.jit(
        lambda i_, s_: s_[i_][:, :24]), idx, src24p)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "gather_probe_r4.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote gather_probe_r4.json", flush=True)


if __name__ == "__main__":
    main()

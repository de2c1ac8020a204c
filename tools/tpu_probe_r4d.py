"""Round-4 on-device probe #4: one-hot-matmul gather/scatter vs XLA
gather/scatter at the rasterize_opt interior sizes.

prim_probe_r4 measured the per-pixel face gather ([S^2,9] from [F,9]) at
56 ms and the tap scatter at 43 ms — both dominate the interior VJP
(~70 ms).  The MXU alternative: out = onehot(fim) @ src (chunked), and
its transpose onehot(fim)^T @ vals for scatters.  f32 for coords, bf16
one-hot for texture values.

Cells (S=512, F=12000):
  oh_gather_f32_c{N}   chunked one-hot gather [S^2,9], chunk N px
  oh_scatter_f32       transpose scatter [S^2,6] -> [F,6]
  oh_gather_bf16_24    [S^2,24] from [F,24] bf16 (texture corners)
  oh_scatter_bf16_24   transpose
  xla_gather_ref       take-along-axis reference
  xla_scatter_ref      segment-sum reference

Writes tools/out/onehot_probe_r4.json.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

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
    # spatially-coherent indices like a real winner map: blocks of runs
    idx_np = np.repeat(
        rng.integers(0, F, P // 16).astype(np.int32), 16)
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
            print(f"{tag:28s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            results["cells"][tag] = {"error": repr(e)[:250]}
            print(f"{tag:28s} FAILED {e!r}", flush=True)

    def oh_gather(idx_, src, chunk, dtype):
        f = src.shape[0]

        def one(ic):
            oh = (ic[:, None] == jnp.arange(f, dtype=jnp.int32)[None]
                  ).astype(dtype)
            return jax.lax.dot_general(
                oh, src.astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return jax.lax.map(one, idx_.reshape(-1, chunk))

    def oh_scatter(idx_, vals, f, chunk, dtype):
        def one(carry, xs):
            ic, vc = xs
            oh = (ic[:, None] == jnp.arange(f, dtype=jnp.int32)[None]
                  ).astype(dtype)
            return carry + jax.lax.dot_general(
                oh, vc.astype(dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        init = jnp.zeros((f, vals.shape[-1]), jnp.float32)
        out, _ = jax.lax.scan(
            one, init,
            (idx_.reshape(-1, chunk), vals.reshape(-1, chunk,
                                                   vals.shape[-1])))
        return out

    src9 = jnp.asarray(rng.standard_normal((F, 9)).astype(np.float32))
    for chunk in (2048, 8192):
        cell(f"oh_gather_f32_c{chunk}", jax.jit(partial(
            oh_gather, chunk=chunk, dtype=jnp.float32)), idx, src9)
    vals6 = jnp.asarray(rng.standard_normal((P, 6)).astype(np.float32))
    cell("oh_scatter_f32_c8192", jax.jit(partial(
        oh_scatter, f=F, chunk=8192, dtype=jnp.float32)), idx, vals6)

    src24 = jnp.asarray(rng.standard_normal((F, 24)).astype(np.float32))
    cell("oh_gather_bf16_24_c8192", jax.jit(partial(
        oh_gather, chunk=8192, dtype=jnp.bfloat16)), idx, src24)
    vals24 = jnp.asarray(
        rng.standard_normal((P, 24)).astype(np.float32))
    cell("oh_scatter_bf16_24_c8192", jax.jit(partial(
        oh_scatter, f=F, chunk=8192, dtype=jnp.bfloat16)), idx, vals24)

    cell("xla_gather_ref", jax.jit(lambda i_, s_: s_[i_]), idx, src9)
    cell("xla_scatter_ref", jax.jit(
        lambda i_, v_: jax.ops.segment_sum(v_, i_, num_segments=F)),
        idx, vals6)

    # correctness
    g_oh = np.asarray(jax.jit(partial(
        oh_gather, chunk=8192, dtype=jnp.float32))(idx, src9)
    ).reshape(P, 9)
    g_ref = np.asarray(src9)[idx_np]
    results["gather_max_err"] = float(np.max(np.abs(g_oh - g_ref)))
    s_oh = np.asarray(jax.jit(partial(
        oh_scatter, f=F, chunk=8192, dtype=jnp.float32))(idx, vals6))
    s_ref = np.zeros((F, 6), np.float32)
    np.add.at(s_ref, idx_np, np.asarray(vals6))
    results["scatter_rel_err"] = float(
        np.max(np.abs(s_oh - s_ref)) / (np.max(np.abs(s_ref)) + 1e-9))
    print("gather max err", results["gather_max_err"],
          "scatter rel err", results["scatter_rel_err"], flush=True)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "onehot_probe_r4.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote onehot_probe_r4.json", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 on-device probe #3: what inside the raster backward costs.

raster_probe_r4: edge_gradients 89 ms, interior VJP 71 ms.  This probe
times the raw primitives those are built from, at the exact sizes of the
512^2 / 12k-face gate, so the rework targets the real bottleneck:

  seg_2M_72k        segment_sum of 8*S^2 values into F*6 segments
  seg_2M_72k_sorted same, pre-sorted ids + indices_are_sorted=True
  sort_2M           the sort itself (key-value)
  gather_2M4_from_F take_face-style gather [S^2, 9] from [F, 9]
  scatter_tex       sample_textures-backward-style scatter (S^2*8 taps
                    into [F*8, 3])
  edge_alpha_only   edge_gradients with the alpha term only
  edge_full         edge_gradients with alpha+rgb (reference cell)

Writes tools/out/prim_probe_r4.json.
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

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tpu_smoke import make_sphere

    S = 512
    F = 12000
    NSEG = F * 6
    NEL = 8 * S * S
    rng = np.random.default_rng(0)

    results = {"backend": jax.default_backend(), "cells": {}}
    STEPS = int(os.environ.get("R4_STEPS", 5))

    def sync(x):
        # device-side reduce + ONE-scalar fetch: np.asarray(leaf) pulls
        # the whole array through the ~12 MB/s tunnel and poisons the
        # timing by fetched-bytes/12MB/s (leak_probe_r4 leg C)
        float(jnp.sum(jax.tree.leaves(x)[0]))

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

    seg = jnp.asarray(rng.integers(0, NSEG, NEL).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(NEL).astype(np.float32))
    cell("seg_2M_72k", jax.jit(
        lambda s, v: jax.ops.segment_sum(v, s, num_segments=NSEG)),
        seg, vals)
    seg_sorted = jnp.sort(seg)
    cell("seg_2M_72k_sorted", jax.jit(
        lambda s, v: jax.ops.segment_sum(
            v, s, num_segments=NSEG, indices_are_sorted=True)),
        seg_sorted, vals)
    cell("sort_2M_kv", jax.jit(
        lambda s, v: jax.lax.sort_key_val(s, v)), seg, vals)

    src = jnp.asarray(rng.standard_normal((F, 9)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, F, S * S).astype(np.int32))
    cell("gather_SS9_from_F", jax.jit(lambda s_, i_: s_[i_]), src, idx)

    tap_idx = jnp.asarray(
        rng.integers(0, F * 8, (S * S * 8,)).astype(np.int32))
    tap_val = jnp.asarray(
        rng.standard_normal((S * S * 8, 3)).astype(np.float32))
    cell("scatter_tex_2M_96k", jax.jit(
        lambda i_, v_: jnp.zeros((F * 8, 3), jnp.float32).at[i_].add(v_)),
        tap_idx, tap_val)

    # edge_gradients cells on real winner maps
    from rnr_tpu.ops.edge_grad import _interior, _rasterize_winner, \
        edge_gradients

    vs, vts, vns, faces_idx = make_sphere(n_lat=64, n_lon=96)
    v_ndc = vs * 1.6
    v_ndc[:, 2] = vs[:, 2] + 2.5
    faces = jnp.asarray(v_ndc[faces_idx][None])
    f = faces.shape[1]
    tex = jnp.asarray(
        rng.uniform(0, 1, (1, f, 2, 2, 2, 3)).astype(np.float32))
    out = jax.jit(lambda fa: _rasterize_winner(fa, S, 0.1, 100.0,
                                               "auto"))(faces)
    fim = out.face_index_map
    rgb, alpha, depth, w = jax.jit(
        lambda fa, t: _interior(fa, t, fim, S, 0.1, 100.0, 1e-4,
                                (0.0, 0.0, 0.0)))(faces, tex)
    g_alpha = jnp.ones_like(alpha)
    g_rgb = jnp.ones_like(rgb)

    cell("edge_alpha_only", jax.jit(lambda fa: edge_gradients(
        fa, fim, w, alpha, grad_alpha=g_alpha)), faces)
    cell("edge_full", jax.jit(lambda fa: edge_gradients(
        fa, fim, w, alpha, grad_alpha=g_alpha, rgb_map=rgb,
        grad_rgb=g_rgb)), faces)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "prim_probe_r4.json")
    with open(path, "w") as fjs:
        json.dump(results, fjs, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()

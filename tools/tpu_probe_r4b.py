"""Round-4 on-device probe #2: rasterize_opt backward breakdown.

KERNELS_r03: rasterize_opt fwd 41.7 ms, fwd+bwd 145.9 ms.  VERDICT r4
item 5 wants the backward at the forward's order.  Cells:

  A. rasterize_opt fwd-only (the r3 gate cell).
  B. rasterize_opt fwd+bwd (grad wrt faces+textures of sum(rgb^2+alpha)).
  C. edge_gradients alone, jitted on fixed winner maps (the coverage
     term, now single-gather + single-segment_sum).
  D. interior VJP alone (pixel_attrs + sample_textures autodiff).

Writes tools/out/raster_probe_r4.json.
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

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from tpu_smoke import make_sphere

    from rnr_tpu.ops.edge_grad import (
        _interior, _rasterize_winner, edge_gradients, rasterize_opt,
    )

    S = 512
    vs, vts, vns, faces_idx = make_sphere(n_lat=64, n_lon=96)
    # ~12k faces like the r3 gate
    v_ndc = vs * 1.6
    v_ndc[:, 2] = vs[:, 2] + 2.5  # depth in front of near plane
    faces = jnp.asarray(v_ndc[faces_idx][None])          # [1, F, 3, 3]
    f = faces.shape[1]
    rng = np.random.default_rng(0)
    tex = jnp.asarray(
        rng.uniform(0, 1, (1, f, 2, 2, 2, 3)).astype(np.float32))

    results = {"backend": jax.default_backend(), "faces": int(f),
               "cells": {}}
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
            print(f"{tag:36s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            results["cells"][tag] = {"error": repr(e)[:250]}
            print(f"{tag:36s} FAILED {e!r}", flush=True)

    fwd = jax.jit(lambda fa, t: rasterize_opt(fa, t, S, near=0.1,
                                              far=100.0)["rgb"])
    cell("A_rasterize_opt_fwd", fwd, faces, tex)

    def loss(fa, t):
        out = rasterize_opt(fa, t, S, near=0.1, far=100.0)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["alpha"])

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
    cell("B_rasterize_opt_fwdbwd", bwd, faces, tex)
    cell("B2_grad_textures_only", jax.jit(jax.grad(loss, argnums=1)),
         faces, tex)
    cell("B3_grad_faces_only", jax.jit(jax.grad(loss, argnums=0)),
         faces, tex)

    def loss_alpha(fa, t):
        return jnp.sum(rasterize_opt(fa, t, S, near=0.1,
                                     far=100.0)["alpha"])

    cell("B4_grad_faces_alpha_only", jax.jit(
        jax.grad(loss_alpha, argnums=0)), faces, tex)

    # fixed winner maps for the isolated cells
    out = jax.jit(lambda fa: _rasterize_winner(fa, S, 0.1, 100.0,
                                               "auto"))(faces)
    fim = out.face_index_map
    rgb, alpha, depth, w = jax.jit(
        lambda fa, t: _interior(fa, t, fim, S, 0.1, 100.0, 1e-4,
                                (0.0, 0.0, 0.0)))(faces, tex)
    g_alpha = jnp.ones_like(alpha)
    g_rgb = jnp.ones_like(rgb)

    eg = jax.jit(lambda fa: edge_gradients(
        fa, fim, w, alpha, grad_alpha=g_alpha, rgb_map=rgb,
        grad_rgb=g_rgb))
    cell("C_edge_gradients_only", eg, faces)

    def interior_vjp(fa, t):
        def f_(f2, t2):
            r, a, d, _ = _interior(f2, t2, fim, S, 0.1, 100.0, 1e-4,
                                   (0.0, 0.0, 0.0))
            return r, a, d
        _, vjp = jax.vjp(f_, fa, t)
        return vjp((g_rgb, g_alpha, jnp.zeros_like(depth)))

    cell("D_interior_vjp_only", jax.jit(interior_vjp), faces, tex)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "raster_probe_r4.json")
    with open(path, "w") as fjs:
        json.dump(results, fjs, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()

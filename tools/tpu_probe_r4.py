"""Round-4 on-device probe #1: reconcile the SH backward contradiction.

KERNELS_r03 recorded sh_shade fwd 28.7 ms but fwd+bwd 665.6 ms, while the
full train step that contains the same backward measured 157.9 ms total
(VERDICT.md "What's weak" #2).  This probe splits the measurement into
single-purpose cells so the contradiction can't hide:

  A. sh_shade forward only (pallas), rays f32 and bf16.
  B. backward-only: _sh_shade_bwd_impl called directly on pre-transposed
     operands, variants {fused (r3 grid-accumulated dcoeff), partials
     (per-cell dcoeff blocks + XLA sum)} x rays {f32, bf16}.
  C. ray_render_sh fwd+bwd via jax.grad (exactly the r3 gate cell) for
     pallas-partials, pallas-fused, and the XLA backend (the reference
     column the r3 gate lacked).

Writes tools/out/sh_probe_r4.json.  Run under `timeout`, one process.
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

    from rnr_tpu.models.rays import ray_render_sh
    from rnr_tpu.ops import sh_pallas
    from rnr_tpu.ops.sh_pallas import (
        _pick_th_sh, _sh_shade_bwd_impl, _sh_shade_impl,
    )

    S = 512
    R, C, LMAX, RSPEC = 26, 3, 10, 13
    rng = np.random.default_rng(1)
    d = rng.standard_normal((1, S, S, 3, R)).astype(np.float32)
    d /= np.linalg.norm(d, axis=3, keepdims=True)
    lt = rng.uniform(0, 2, (1, S, S, R, C)).astype(np.float32)
    al = (rng.uniform(size=(1, S, S, 1)) > 0.3).astype(np.float32)
    cf = rng.standard_normal((121, C)).astype(np.float32)
    alb = rng.uniform(0, 1, (1, S, S, C)).astype(np.float32)
    kw = dict(num_ray_diffuse=13, albedo_diffuse=jnp.asarray(alb),
              separate_albedo=True)

    results = {"backend": jax.default_backend(), "cells": {}}
    STEPS = int(os.environ.get("R4_STEPS", 5))

    def sync(x):
        float(jnp.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def timeit(fn, *args):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / STEPS * 1e3

    def cell(tag, fn, *args):
        try:
            ms = timeit(fn, *args)
            results["cells"][tag] = round(ms, 2)
            print(f"{tag:48s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            results["cells"][tag] = {"error": repr(e)[:250]}
            print(f"{tag:48s} FAILED {e!r}", flush=True)

    for dt, dtag in ((np.float32, "f32"), (np.dtype("bfloat16"), "bf16")):
        rd_t = jnp.asarray(
            np.transpose(d, (0, 4, 3, 1, 2)).astype(dt))    # [N,R,3,H,W]
        rl_t = jnp.asarray(
            np.transpose(lt, (0, 3, 4, 1, 2)).astype(dt))   # [N,R,C,H,W]
        al_t = jnp.asarray(np.transpose(al, (0, 3, 1, 2)))
        cfj = jnp.asarray(cf)
        gs_t = jnp.asarray(
            rng.standard_normal((1, C, S, S)).astype(np.float32))
        gd_t = jnp.asarray(
            rng.standard_normal((1, C, S, S)).astype(np.float32))

        th_f = _pick_th_sh(S, S, R, C, LMAX, np.dtype(dt).itemsize, False)
        th_b = _pick_th_sh(S, S, R, C, LMAX, np.dtype(dt).itemsize, True)
        results["cells"][f"th_pick_{dtag}"] = {"fwd": th_f, "bwd": th_b}
        print(f"th picks [{dtag}]: fwd {th_f} bwd {th_b}", flush=True)

        cell(f"A_fwd_pallas_{dtag}",
             lambda rd=rd_t, rl=rl_t: _sh_shade_impl(
                 rd, rl, al_t, cfj, LMAX, RSPEC, False))
        for var in ("partials", "fused"):
            cell(f"B_bwdonly_{var}_{dtag}",
                 lambda rd=rd_t, rl=rl_t, v=var: _sh_shade_bwd_impl(
                     rd, rl, al_t, cfj, gs_t, gd_t, LMAX, RSPEC, False,
                     variant=v))

    # C: the r3 gate cell, with backend/variant columns
    dj = jnp.asarray(d)
    ltj = jnp.asarray(lt)
    alj = jnp.asarray(al)
    cfj = jnp.asarray(cf)

    def grad_cell(backend, variant):
        os.environ["RNR_SH_BWD"] = variant
        g = jax.jit(jax.grad(lambda l, c_: jnp.sum(ray_render_sh(
            jnp.asarray(alb), dj, alj, l, c_, LMAX, backend=backend, **kw
        )["out"] ** 2), argnums=(0, 1)))
        cell(f"C_gate_fwdbwd_{backend}_{variant}", g, ltj, cfj)

    grad_cell("pallas", "partials")
    grad_cell("pallas", "fused")
    grad_cell("xla", "partials")

    # numerical agreement partials vs fused vs xla
    def grads(backend, variant):
        os.environ["RNR_SH_BWD"] = variant
        g = jax.jit(jax.grad(lambda l, c_: jnp.sum(ray_render_sh(
            jnp.asarray(alb), dj, alj, l, c_, LMAX, backend=backend, **kw
        )["out"] ** 2), argnums=(0, 1)))
        gl, gc = g(ltj, cfj)
        return np.asarray(gl), np.asarray(gc)

    try:
        glp, gcp = grads("pallas", "partials")
        glx, gcx = grads("xla", "partials")
        results["grad_rel_err"] = {
            "dlt": float(np.max(np.abs(glp - glx))
                         / (np.max(np.abs(glx)) + 1e-9)),
            "dcf": float(np.max(np.abs(gcp - gcx))
                         / (np.max(np.abs(gcx)) + 1e-9)),
        }
        print("grad rel err vs xla:", results["grad_rel_err"], flush=True)
    except Exception as e:
        results["grad_rel_err"] = {"error": repr(e)[:250]}

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "sh_probe_r4.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()

"""Round-4 probe: 3x3 conv as XLA conv emitter vs explicit im2col+dot.

The U-Net runs at ~15 TF/s bf16 through `lax.conv_general_dilated` on
these NHWC shapes (O=64 at full res fills half the MXU lanes; the conv
emitter's schedule leaves more on the table).  Hypothesis: patches
(nine shifted slices concatenated on channels, K = 9C) feeding ONE
`dot_general` reaches the dot emitter's much higher MXU efficiency and
pays only ~0.7 ms/conv of patches HBM traffic at 512^2.

Cells time a CHAIN of 12 convs (64->64, same shapes) so the ~3-6 ms
tunnel dispatch floor amortizes; fwd and fwd+bwd (value_and_grad wrt
weights and input).  Writes tools/out/convdot_probe_r4.json.
"""

from __future__ import annotations

import json
import os
import time

import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    S = 512
    C = 64
    DEPTH = 12
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((1, S, S, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ws = jnp.asarray(
        (rng.standard_normal((DEPTH, 3, 3, C, C)) * 0.05).astype(
            np.float32
        )
    )

    def conv_xla(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_dot(x, w):
        n, h, wd, c = x.shape
        o = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pats = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + wd, :]
             for dy in range(3) for dx in range(3)],
            axis=-1,
        )
        y = jax.lax.dot_general(
            pats.reshape(n * h * wd, 9 * c),
            w.astype(x.dtype).reshape(9 * c, o),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(n, h, wd, o).astype(x.dtype)

    def chain(conv):
        def f(x, ws_):
            def body(y, w):
                return conv(y, w), None
            y, _ = jax.lax.scan(body, x, ws_)
            return y
        return jax.jit(f)

    def chain_grad(conv):
        def loss(x, ws_):
            def body(y, w):
                return conv(y, w), None
            y, _ = jax.lax.scan(body, x, ws_)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    results = {"backend": jax.default_backend(), "depth": DEPTH,
               "shape": [1, S, S, C], "cells": {}}
    # conv FLOPs of the whole chain, for TF/s accounting
    flops_fwd = DEPTH * 2 * 9 * S * S * C * C

    def cell(tag, fn, *args, passes=1):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        dt = (time.perf_counter() - t0) / 5
        tfs = flops_fwd * passes / dt / 1e12
        results["cells"][tag] = {
            "ms": round(dt * 1e3, 2),
            "ms_per_conv": round(dt * 1e3 / DEPTH / passes, 3),
            "tf_per_s": round(tfs, 1),
        }
        print(f"{tag:24s} {dt * 1e3:8.2f} ms "
              f"({dt * 1e3 / DEPTH / passes:6.3f} ms/conv, {tfs:6.1f} TF/s)",
              flush=True)
        return out

    def conv_pallas(x, w):
        from rnr_tpu.ops.conv_pallas import conv3x3
        return conv3x3(x, w, jnp.zeros((w.shape[-1],), jnp.float32),
                       "same", False, 0.2, False)

    f_x = chain(conv_xla)
    f_d = chain(conv_dot)
    o_x = cell("fwd_xla_conv", f_x, x0, ws)
    o_d = cell("fwd_im2col_dot", f_d, x0, ws)
    try:
        f_p = chain(conv_pallas)
        o_p = cell("fwd_pallas_pertap", f_p, x0, ws)
        results["pallas_fwd_rel_err"] = float(
            jnp.max(jnp.abs(o_x.astype(jnp.float32)
                            - o_p.astype(jnp.float32)))
            / (jnp.max(jnp.abs(o_x.astype(jnp.float32))) + 1e-9))
        g_p = chain_grad(conv_pallas)
        cell("fwdbwd_pallas_pertap", g_p, x0, ws, passes=3)
    except Exception as e:
        results["cells"]["pallas_pertap"] = {"error": repr(e)[:300]}
        print("pallas cell FAILED", repr(e)[:200], flush=True)
    rel = float(
        jnp.max(jnp.abs(o_x.astype(jnp.float32) - o_d.astype(jnp.float32)))
        / (jnp.max(jnp.abs(o_x.astype(jnp.float32))) + 1e-9)
    )
    results["fwd_rel_err"] = rel
    print(f"fwd rel err {rel:.5f}", flush=True)

    # fwd+bwd = ~3 conv passes of FLOPs
    g_x = chain_grad(conv_xla)
    g_d = chain_grad(conv_dot)
    cell("fwdbwd_xla_conv", g_x, x0, ws, passes=3)
    cell("fwdbwd_im2col_dot", g_d, x0, ws, passes=3)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "convdot_probe_r4.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()

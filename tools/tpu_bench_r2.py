"""Round-2 TPU micro-benchmarks: texture scatter kernel + kNN breakdown.

One process, sequential sections, scalar-only host fetches.
Usage: timeout 900 python -u tools/tpu_bench_r2.py [sections...]
Sections: tex knn
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def bench(fn, *args, steps=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        # reduce over the FULL output: slicing before the reduce lets XLA
        # dead-code-eliminate most of the benchmarked work
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        )

    float(np.asarray(scalar_fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(steps):
        out = scalar_fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / steps * 1e3


def section_tex():
    import jax
    import jax.numpy as jnp

    from rnr_tpu.ops.texture_pallas import (
        _chunk_coords,
        _chunk_values,
        _level_coords,
        _xla_scatter_taps,
        mipmap_sample,
        scatter_taps,
    )
    from rnr_tpu.ops.interpolate import interpolate_bilinear

    rng = np.random.default_rng(0)
    n, s, ch = 1, 512, 24
    sizes = [512, 256, 128, 64]
    texs = tuple(
        jnp.asarray(rng.standard_normal((sz, sz, ch)).astype(np.float32))
        for sz in sizes
    )
    # spatially coherent uv: smooth field so binning pays off
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    u = (xx + 0.08 * np.sin(6 * yy)) % 1.0
    v = (yy + 0.08 * np.cos(6 * xx)) % 1.0
    uv = jnp.asarray(np.stack([u, v], -1)[None])
    g = jnp.asarray(rng.standard_normal((n, s, s, ch)).astype(np.float32))

    # single-level scatter: pallas vs xla
    xl, yl = _level_coords(uv, 512)
    xc, yc = _chunk_coords(xl, yl)
    gc = _chunk_values(g)
    t = bench(lambda: scatter_taps(xc, yc, gc, 512, 512)[0], steps=10)
    print(f"tex scatter L0 512 pallas   {t:8.2f} ms")
    ovf = int(scatter_taps(xc, yc, gc, 512, 512)[1])
    print(f"  (overflow={ovf})")
    t = bench(lambda: _xla_scatter_taps(xc, yc, gc, 512, 512), steps=3)
    print(f"tex scatter L0 512 xla      {t:8.2f} ms")

    # full mipmap backward: pallas vs autodiff
    def loss_pallas(texs):
        return jnp.sum(mipmap_sample(texs, uv, False) * g)

    def loss_xla(texs):
        out = None
        for tex in texs:
            x2, y2 = _level_coords(uv, tex.shape[0])
            sm = interpolate_bilinear(tex, x2, y2)
            out = sm if out is None else out + sm
        return jnp.sum(out * g)

    t = bench(lambda: jax.grad(loss_pallas)(texs), steps=10)
    print(f"mipmap fwd+bwd pallas       {t:8.2f} ms")
    t = bench(lambda: jax.grad(loss_xla)(texs), steps=5)
    print(f"mipmap fwd+bwd xla          {t:8.2f} ms")
    t = bench(lambda: loss_xla(texs), steps=10)
    print(f"mipmap fwd only xla         {t:8.2f} ms")


def section_knn():
    import jax
    import jax.numpy as jnp

    from rnr_tpu.models.gcn import knn_graph

    V, C = 7500, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (V, C))
    xb = x.astype(jnp.bfloat16)

    def fused(xb, kk, rc):
        sq = jnp.sum(xb * xb, -1, keepdims=True)
        d = sq + sq.T - 2.0 * jax.lax.dot(
            xb, xb.T, preferred_element_type=jnp.bfloat16
        )
        return jax.lax.approx_max_k(-d, kk, recall_target=rc)[1]

    for kk in (16, 80, 160, 304):
        for rc in (0.95, 0.9, 0.8, 0.7):
            t = bench(lambda xb, kk=kk, rc=rc: fused(xb, kk, rc), xb)
            print(f"fused dist+approx k={kk:4d} r={rc}  {t:8.2f} ms")

    def matmul_only(xb):
        return jax.lax.dot(xb, xb.T, preferred_element_type=jnp.bfloat16)

    print(f"dist matmul only            {bench(matmul_only, xb):8.2f} ms")

    # the real 19-call schedule at refresh 1 and 2
    for refresh in (1, 2, 4):
        def sched(x, refresh=refresh):
            acc = 0
            h = x
            cache_k = None
            for i in range(19):
                if i % refresh == 0:
                    last = min(i + refresh - 1, 18)
                    kk = 16 * (1 + last)
                    idx = knn_graph(h, kk, approx=True, recall=0.9)
                    acc = acc + idx[:, 0]
                h = h + 1e-6
            return acc

        print(f"gcn knn schedule refresh={refresh} {bench(sched, x):8.2f} ms")


if __name__ == "__main__":
    wanted = sys.argv[1:] or ["tex", "knn"]
    for w in wanted:
        print(f"== section {w} ==", flush=True)
        globals()[f"section_{w}"]()

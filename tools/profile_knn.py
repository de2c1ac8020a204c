"""Bisect the kNN cost on TPU: matmul vs ApproxTopK vs exact aggregation.

The GCN spends ~144 ms/step in graph construction (20 kNN calls over a
[7500, 7500] distance matrix).  This tool separates:
  - the distance matmul alone,
  - approx_max_k with aggregate_to_topk=True (what knn_graph uses),
  - approx_max_k with aggregate_to_topk=False (bucketed candidates only),
  - exact top_k,
at the k values the 20-block GCN actually requests (16..304).

Usage: timeout 600 python tools/profile_knn.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def bench(fn, *args, steps=10):
    # wrap so only a scalar crosses the host boundary (fetching the whole
    # output array over the TPU tunnel dominates otherwise)
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        return jnp.sum(
            jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:16]
        )

    _sync(scalar_fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = scalar_fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def _sync(x):
    float(np.asarray(x).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    V, C = 7500, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (V, C))
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def dist_only(xb):
        sq = jnp.sum(xb * xb, axis=-1, keepdims=True)
        inner = jax.lax.dot(xb, xb.T, preferred_element_type=jnp.bfloat16)
        return sq + sq.T - 2.0 * inner

    print(f"dist matmul bf16 [{V}x{V}]   {bench(dist_only, xb):8.2f} ms")
    dist = dist_only(xb)
    distf = dist.astype(jnp.float32)

    for kk in (16, 32, 80, 160, 304):
        f_agg = jax.jit(
            lambda d, kk=kk: jax.lax.approx_max_k(
                -d, kk, recall_target=0.9, aggregate_to_topk=True
            )[1]
        )
        f_noagg = jax.jit(
            lambda d, kk=kk: jax.lax.approx_max_k(
                -d, kk, recall_target=0.9, aggregate_to_topk=False
            )[1]
        )
        t_agg = bench(f_agg, dist)
        t_noagg = bench(f_noagg, dist)
        print(
            f"approx_max_k k={kk:4d}  agg={t_agg:8.2f} ms  "
            f"noagg={t_noagg:8.2f} ms"
        )

    # fused (matmul + approx topk in one program) vs staged
    for kk in (16, 304):
        f_fused = jax.jit(
            lambda xb, kk=kk: jax.lax.approx_max_k(
                -(
                    jnp.sum(xb * xb, -1, keepdims=True)
                    + jnp.sum(xb * xb, -1)[None, :]
                    - 2.0
                    * jax.lax.dot(
                        xb, xb.T, preferred_element_type=jnp.bfloat16
                    )
                ),
                kk,
                recall_target=0.9,
            )[1]
        )
        print(f"fused dist+approx k={kk:4d}   {bench(f_fused, xb):8.2f} ms")

    # exact top_k on f32 for reference
    for kk in (16, 304):
        f_exact = jax.jit(lambda d, kk=kk: jax.lax.top_k(-d, kk)[1])
        print(f"exact top_k k={kk:4d}        {bench(f_exact, distf):8.2f} ms")

    # the actual knn schedule of a 20-block GCN with refresh_every=1:
    # head k=16 on pos, then blocks i=0..18 request k_window=16*(1+i)
    from rnr_tpu.models.gcn import knn_graph

    @jax.jit
    def gcn_knn_schedule(x):
        acc = 0
        h = x
        for i in range(19):
            idx = knn_graph(h, 16 * (1 + i), approx=True, recall=0.9)
            acc = acc + idx[:, 0]
            h = h + 1e-6
        return acc

    print(f"gcn knn schedule (19 calls)  {bench(gcn_knn_schedule, x):8.2f} ms")


if __name__ == "__main__":
    main()

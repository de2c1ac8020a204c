"""Bisect the GCN's on-device cost: knn vs gathers vs dense vs readout.

Usage: python tools/profile_gcn.py [--v 7500] [--blocks 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def bench(fn, *args, steps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    float(np.asarray(leaf).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=7500)
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rnr_tpu.models.gcn import knn_graph, DenseDeepGCN, GCNConfig

    key = jax.random.PRNGKey(0)
    V, C, K, B = args.v, args.c, args.k, args.blocks
    x = jax.random.normal(key, (V, C))
    pos = jax.random.normal(key, (V, 3))

    # chained approx knn (dependency via feature bump) at every dilation
    @jax.jit
    def knn_chain(x):
        h = x
        acc = 0
        for i in range(B - 1):
            idx = knn_graph(h, K * (1 + i), approx=True)
            acc = acc + idx[:, 0]
            h = h + 1e-6
        return acc

    print(f"knn_chain x{B - 1}        {bench(knn_chain, x):9.1f} ms")

    # single knn at several k
    for kk in (16, 64, 160, 320):
        f = jax.jit(lambda x, kk=kk: knn_graph(x, kk, approx=True))
        print(f"approx knn k={kk:4d}      {bench(f, x):9.1f} ms")

    # gathers + dense (EdgeConv compute without graph build)
    idx = knn_graph(x, K, approx=True)
    w = jax.random.normal(key, (2 * C, C))

    @jax.jit
    def edge_stack(x, idx, w):
        h = x
        for _ in range(B - 1):
            xj = h[idx]
            feat = jnp.concatenate(
                [jnp.broadcast_to(h[:, None, :], xj.shape), xj - h[:, None, :]],
                axis=-1,
            )
            h = jnp.max(jax.nn.relu(feat @ w), axis=1) + h
        return h

    print(f"edge_stack x{B - 1}       {bench(edge_stack, x, idx, w):9.1f} ms")

    # full gcn fwd for reference
    gcn = DenseDeepGCN(GCNConfig(n_blocks=B, kernel_size=K, n_filters=C,
                                 out_channels=512))
    vars_ = gcn.init(key, pos)
    f = jax.jit(
        lambda v, p: gcn.apply(v, p, train=False, mutable=["spectral"])[0]
    )
    print(f"gcn_forward            {bench(f, vars_, pos):9.1f} ms")

    # recall variants
    for rc in (0.9, 0.8):
        gcnr = DenseDeepGCN(GCNConfig(n_blocks=B, kernel_size=K, n_filters=C,
                                      out_channels=512, knn_recall=rc))
        vr = gcnr.init(key, pos)
        fr = jax.jit(
            lambda v, p, g=gcnr: g.apply(v, p, train=False,
                                         mutable=["spectral"])[0]
        )
        print(f"gcn_forward recall={rc} {bench(fr, vr, pos):9.1f} ms")

    # graph_refresh_every=4 variant
    gcn4 = DenseDeepGCN(GCNConfig(n_blocks=B, kernel_size=K, n_filters=C,
                                  out_channels=512, graph_refresh_every=4))
    vars4 = gcn4.init(key, pos)
    f4 = jax.jit(
        lambda v, p: gcn4.apply(v, p, train=False, mutable=["spectral"])[0]
    )
    print(f"gcn_forward refresh=4  {bench(f4, vars4, pos):9.1f} ms")


if __name__ == "__main__":
    main()

"""Fused Pallas kNN-candidate kernel for the dynamic GCN graphs.

The reference rebuilds a dense kNN graph per GCN block — a [V, V] pairwise
distance matrix plus top-k*dilation (gcn_lib/dense/torch_edge.py:46-65) —
which on TPU costs ~3 ms of matmul HBM round-trip plus an ApproxTopK whose
cost grows linearly in k (measured 16.5 ms at k=304, recall 0.9).  Across
a 20-block schedule that is ~135 ms/step, the single largest line item of
the whole RNR training step.

This kernel replaces the *large-k* graph builds with a TPU-native
formulation: **stratified nearest neighbors**.  For each query row it
returns the nearest vertex within each contiguous column stratum of
`stratum` vertices — computed in one pass that fuses the distance matmul
(MXU) with per-stratum argmin (VPU) in VMEM, so the [V, V] distance
matrix never exists in HBM and nothing is ever sorted:

  score(i, j) = 2 x_i . x_j - |x_j|^2      (row term |x_i|^2 cannot
                                            change a per-row argmax)
  out[i, s]   = argmax_{j in stratum s} score(i, j)

The stratified candidate set plays the role of the reference's
k*dilation-nearest window: dilated blocks sample k strata with a
per-block phase stride (or a random subset with probability epsilon,
matching DenseDilated's stochastic sampling, torch_edge.py:6-29).  The
true nearest neighbor is always among the candidates; high-dilation
blocks — which the reference architecture *wants* to see wide, sparse
neighborhoods — get exactly that.  Exact-rank kNN remains available for
the graph head and low-dilation blocks (models/gcn.py `knn_graph`).

Mesh vertex order is spatially coherent (OBJ export order), so contiguous
strata correspond to compact surface patches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stratified_kernel(row_tile, col_tile, stratum, c_pad):
    n_per_tile = col_tile // stratum

    def kernel(xr_ref, xc_ref, out_ref):
        ct = pl.program_id(1)
        xr = xr_ref[:, :]                       # [R, C] bf16
        xc = xc_ref[:, :]                       # [W, C] bf16
        # transposed scores [W, R]: strata become *sublane* groups, so
        # the per-stratum reduction is a free leading-dim reshape — no
        # lane relayout anywhere in the kernel
        inner = jax.lax.dot_general(
            xc, xr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [W, R]
        sq = jnp.sum(
            xc.astype(jnp.float32) * xc.astype(jnp.float32), axis=1
        )                                        # [W]
        score = 2.0 * inner - sq[:, None]
        sg = score.reshape(n_per_tile, stratum, row_tile)
        mx = jnp.max(sg, axis=1, keepdims=True)
        sub_io = jax.lax.broadcasted_iota(
            jnp.int32, (n_per_tile, stratum, row_tile), 1
        )
        sel = jnp.where(sg == mx, sub_io, stratum)
        a = jnp.min(sel, axis=1)                 # first max among ties
        base = jax.lax.broadcasted_iota(
            jnp.int32, (n_per_tile, row_tile), 0
        ) * stratum
        out_ref[:, :] = ct * col_tile + base + a

    return kernel


@partial(
    jax.jit,
    static_argnames=("stratum", "row_tile", "col_tile", "interpret"),
)
def stratified_knn(
    x: jax.Array,
    stratum: int = 16,
    row_tile: int = 256,
    col_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Nearest vertex per column stratum, for every query row.

    Args:
      x: [V, C] vertex features (any float dtype; compute is bf16 with
        f32 scores, the same precision class as the approx-kNN path).
      stratum: stratum width in vertices.

    Returns: idx [V, ceil(V / stratum)] int32 — column j holds the index
    of the nearest vertex among [j*stratum, (j+1)*stratum) (self
    included, like the reference's dense_knn_matrix).
    """
    v, c = x.shape
    c_pad = 128
    if c > c_pad:
        raise ValueError(f"C={c} > {c_pad} not supported")
    v_pad = -(-v // col_tile) * col_tile
    if v_pad % row_tile:
        raise ValueError("col_tile must be a multiple of row_tile")
    # Padded columns get a huge coordinate -> hugely negative score ->
    # never selected while any real vertex shares the stratum.
    xb = x.astype(jnp.bfloat16)
    xb = jnp.pad(
        xb, ((0, v_pad - v), (0, c_pad - c)), constant_values=1e4
    )
    xb = xb.at[v:, :].set(jnp.bfloat16(1e4))
    xb = xb.at[:v, c:].set(jnp.bfloat16(0.0))

    n_rt = v_pad // row_tile
    n_ct = v_pad // col_tile
    n_per_tile = col_tile // stratum
    kernel = _stratified_kernel(row_tile, col_tile, stratum, c_pad)
    idx_t = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        in_specs=[
            pl.BlockSpec(
                (row_tile, c_pad), lambda rt, ct: (rt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (col_tile, c_pad), lambda rt, ct: (ct, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_per_tile, row_tile), lambda rt, ct: (ct, rt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_ct * n_per_tile, v_pad), jnp.int32
        ),
        interpret=interpret,
    )(xb, xb)

    n_valid = -(-v // stratum)
    return jnp.minimum(idx_t.T[:v, :n_valid], v - 1)


def stratified_knn_xla(x: jax.Array, stratum: int = 16) -> jax.Array:
    """XLA oracle for `stratified_knn` (any backend; used by tests)."""
    v, c = x.shape
    xb = x.astype(jnp.bfloat16)
    sq = jnp.sum(
        xb.astype(jnp.float32) * xb.astype(jnp.float32), axis=1
    )
    inner = jax.lax.dot_general(
        xb, xb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    score = 2.0 * inner - sq[None, :]
    v_pad = -(-v // stratum) * stratum
    score = jnp.pad(
        score, ((0, 0), (0, v_pad - v)), constant_values=-jnp.inf
    )
    score = score.reshape(v, v_pad // stratum, stratum)
    idx = jnp.argmax(score, axis=-1).astype(jnp.int32) + (
        jnp.arange(v_pad // stratum, dtype=jnp.int32)[None, :] * stratum
    )
    return jnp.minimum(idx, v - 1)

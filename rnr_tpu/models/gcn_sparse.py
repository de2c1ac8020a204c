"""Edge-list ("sparse") graph convolution variants.

Counterpart of the reference's `gcn_lib.sparse` package (torch_geometric
EdgeConv/MRConv over COO edge lists) — never exercised by the reference
drivers (only `gcn_lib.dense` is imported, network.py:7) but part of the
library surface.  On TPU the dense [V, k] gather formulation in
`rnr_tpu.models.gcn` is strictly faster for the regular kNN graphs this
model family uses; the edge-list forms here exist for irregular graphs
(variable degree) and API completeness, built on `segment_max`/
`segment_sum` instead of scatter atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def knn_edges(x: jax.Array, k: int) -> jax.Array:
    """COO edge list [2, V*k] = (source=neighbor, target=center) from kNN.

    Matches the dense graph's (nn_idx, center_idx) stacking
    (gcn_lib/dense/torch_edge.py:57-65).
    """
    from rnr_tpu.models.gcn import knn_graph

    v = x.shape[0]
    nbr = knn_graph(x, k)                       # [V, k]
    center = jnp.broadcast_to(jnp.arange(v)[:, None], (v, k))
    return jnp.stack([nbr.reshape(-1), center.reshape(-1)], axis=0)


class SparseEdgeConv(nn.Module):
    """EdgeConv over an edge list: max_j MLP([x_i || x_j - x_i]).

    Reference: gcn_lib/sparse twin of torch_vertex.EdgeConv4D.  The
    per-center max reduction is a `segment_max` over target ids — the
    TPU-native replacement for scatter-with-atomics.
    """

    out_ch: int

    @nn.compact
    def __call__(self, x: jax.Array, edge_index: jax.Array) -> jax.Array:
        src, dst = edge_index[0], edge_index[1]
        x_j = x[src]
        x_i = x[dst]
        feat = jnp.concatenate([x_i, x_j - x_i], axis=-1)
        h = nn.relu(nn.Dense(self.out_ch)(feat))
        return jax.ops.segment_max(
            h, dst, num_segments=x.shape[0], indices_are_sorted=False
        )


class SparseMRConv(nn.Module):
    """Max-relative conv over an edge list (gcn_lib sparse MRConv)."""

    out_ch: int

    @nn.compact
    def __call__(self, x: jax.Array, edge_index: jax.Array) -> jax.Array:
        src, dst = edge_index[0], edge_index[1]
        rel = jax.ops.segment_max(
            x[src] - x[dst], dst, num_segments=x.shape[0]
        )
        feat = jnp.concatenate([x, rel], axis=-1)
        return nn.relu(nn.Dense(self.out_ch)(feat))


class SparseResDynBlock(nn.Module):
    """Residual dynamic edge-conv block over recomputed kNN edges."""

    channels: int
    kernel_size: int = 9
    conv_type: str = "edge"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        edges = knn_edges(x, self.kernel_size)
        conv = (
            SparseEdgeConv(self.channels)
            if self.conv_type == "edge"
            else SparseMRConv(self.channels)
        )
        return conv(x, edges) + x

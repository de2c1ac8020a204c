"""Dense deep GCN over mesh vertices — the global light-transport prior.

Re-design of the reference `DenseDeepGCN` + `gcn_lib.dense`
(network.py:256-315, gcn_lib/dense/torch_vertex.py:27-102,
torch_edge.py:6-83): a head EdgeConv on vertex positions, a stack of
residual dynamic EdgeConv blocks whose kNN graphs are recomputed from the
current features with growing dilation (and stochastic dilation sampling
during training), channel-concat fusion to 1024, a channel-max readout to
one scalar per vertex, and a spectral-normalized MLP over the vertex
dimension producing a single global feature vector.

TPU notes: the dense V x V distance matrix is one big MXU matmul
(7500^2 ~ 56M f32, trivially HBM-resident); `jax.lax.top_k` runs on the
final axis.  Every EdgeConv is a [V, k, 2C] gather + Dense + max — gather
bandwidth dominates, so features stay channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.parallel.constraints import constrain


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    """Knobs mirroring the reference CLI flags (train_rnr.py:84-95)."""

    in_channels: int = 6
    n_filters: int = 64
    kernel_size: int = 16
    n_blocks: int = 20
    conv_type: Literal["edge", "mr"] = "edge"
    block_type: Literal["res", "dense"] = "res"
    # BasicConv structure knobs (reference train_rnr.py:88-90,
    # gcn_lib/dense/torch_nn.py:9-40): activation {relu, leakyrelu
    # (slope 0.2), prelu (single learned slope, init 0.2)}, post-act
    # normalization {None, "batch" (affine), "instance" (no affine)},
    # conv bias.  Norms use current-batch statistics — the GCN only ever
    # runs in train mode (the reference never .eval()s it; at inference
    # v_feature is restored from the checkpoint, test_rnr.py:168-182),
    # and with the [V, k] layout batch/instance statistics coincide
    # (single sample), so no running stats are kept.
    # NOTE default deviation: the reference CLI defaults to
    # norm_type='batch'; rnr_tpu ships None (no norm) — the round-1/2
    # quality gates and recorded benches were measured without it.  See
    # PARITY.md "Known deltas".
    act_type: Literal["relu", "leakyrelu", "prelu"] = "relu"
    norm_type: str | None = None
    use_bias: bool = True
    stochastic: bool = True
    epsilon: float = 0.2
    num_v: int = 7500
    out_channels: int = 512
    knn_approx: bool = True
    # ApproxTopK recall target: the dominant GCN cost knob (v5e, V=7500:
    # 0.95 -> 335 ms, 0.9 -> 144 ms, 0.8 -> 63 ms per forward).  The graph
    # is already a stochastic neighborhood prior (epsilon-dilation
    # sampling), so 0.9 is the default; knn_approx=False gives the exact
    # reference graph.
    knn_recall: float = 0.9
    # EdgeConv gather/matmul compute dtype ("bfloat16" halves the [V, k,
    # 2C] gather bytes and MXU time).  Graph construction (distances /
    # top-k / strata) always runs on f32 features so neighbor selection
    # is dtype-independent; the head fusion + spectral-norm projections
    # stay f32.
    compute_dtype: str = "float32"
    # Rebuild the dynamic kNN graph every Nth block, reusing the previous
    # block's neighborhood otherwise.  1 = reference parity (every block,
    # gcn_lib/dense/torch_vertex.py:68-70); higher values trade graph
    # freshness for a near-linear cut in top-k cost (SURVEY hard-part #7).
    graph_refresh_every: int = 1
    # Blocks with dilation >= strat_min_dilation build their neighborhoods
    # from the fused Pallas stratified-kNN kernel (ops/knn_pallas.py):
    # nearest-vertex-per-column-stratum candidates sampled with a
    # per-block phase stride.  ApproxTopK cost grows linearly with
    # k*dilation (16.5 ms at k=304/recall 0.9 on v5e) while the
    # stratified kernel is k-independent (~1 ms); low-dilation blocks
    # keep exact-rank graphs where tight neighborhoods matter.
    # 0 disables stratified sampling entirely (pure reference semantics).
    strat_min_dilation: int = 3
    stratum_width: int = 16


def knn_graph(x: jax.Array, k: int, approx: bool = False,
              recall: float = 0.95) -> jax.Array:
    """Indices of the k nearest neighbors (including self) per vertex.

    x: [V, C] -> [V, k] int32.  Matches `dense_knn_matrix`
    (gcn_lib/dense/torch_edge.py:46-65): full pairwise distances + top-k.

    approx=True uses `jax.lax.approx_max_k` — the TPU-native partial-sort
    (ApproxTopK) that avoids the full-sort cost of exact top_k.  The graph
    is only a stochastic neighborhood prior (the reference even *samples*
    it randomly via stochastic dilation), so a 0.95-recall neighbor set
    preserves model quality.
    """
    # graph construction is non-differentiable (integer indices); make it
    # explicit so no distance-matrix residuals are kept for backward
    x = jax.lax.stop_gradient(x)
    if approx:
        # bf16 end to end: the [V, V] distance matrix is the dominant HBM
        # traffic of the whole GCN (19 rebuilds/step); bf16 halves it, and
        # MXU-native ranking precision is plenty for neighbors that are
        # then stochastically subsampled anyway.
        xb = x.astype(jnp.bfloat16)
        sq = jnp.sum(xb * xb, axis=-1, keepdims=True)
        inner = jax.lax.dot(
            xb, xb.T, preferred_element_type=jnp.bfloat16
        )
        # under a mesh: row-shard the [V, V] distance matrix over sp so
        # every device ranks only its own query rows (top-k is per-row)
        dist = constrain(sq + sq.T - 2.0 * inner, "sp", None)
        _, idx = jax.lax.approx_max_k(-dist, k, recall_target=recall)
    else:
        sq = jnp.sum(x * x, axis=-1, keepdims=True)       # [V, 1]
        dist = sq + sq.T - 2.0 * jax.lax.dot(
            x, x.T, precision=jax.lax.Precision.HIGHEST
        )
        dist = constrain(dist, "sp", None)
        _, idx = jax.lax.top_k(-dist, k)
    return idx.astype(jnp.int32)


def stratified_candidates(x: jax.Array, stratum: int) -> jax.Array:
    """Per-row nearest-in-stratum candidate sets (non-differentiable)."""
    from rnr_tpu.ops.knn_pallas import stratified_knn

    x = jax.lax.stop_gradient(x)
    return stratified_knn(
        x, stratum=stratum, interpret=jax.default_backend() != "tpu"
    )


def sample_strata(
    strat: jax.Array,
    k: int,
    phase_seed: int,
    stochastic: bool,
    epsilon: float,
    rng: jax.Array | None,
    train: bool,
) -> jax.Array:
    """Pick k strata from a stratified candidate set.

    Deterministic path: a phase-strided subset (per-block `phase_seed`
    varies the strata across blocks, playing the role of dilation).
    Stochastic path: with probability epsilon pick k random strata —
    the analog of DenseDilated's random sampling (torch_edge.py:6-29).
    """
    ns = strat.shape[1]
    stride = max(ns // k, 1)
    phase = (phase_seed * 7) % stride
    strided = strat[:, phase::stride][:, :k]
    if not (stochastic and train) or rng is None:
        return strided
    r_choice, r_perm = jax.random.split(rng)
    perm = jax.random.permutation(r_perm, ns)[:k]
    random_pick = strat[:, perm]
    use_random = jax.random.uniform(r_choice, ()) < epsilon
    return jnp.where(use_random, random_pick, strided)


def dilate_edges(
    idx: jax.Array,
    k: int,
    dilation: int,
    stochastic: bool,
    epsilon: float,
    rng: jax.Array | None,
    train: bool,
) -> jax.Array:
    """Dilated neighbor selection (gcn_lib/dense/torch_edge.py:6-29).

    idx: [V, k*dilation] -> [V, k].  During training, with probability
    `epsilon`, pick a random subset of k instead of the ::dilation stride.
    """
    strided = idx[:, ::dilation][:, :k]
    if not (stochastic and train) or rng is None or dilation == 1:
        return strided
    r_choice, r_perm = jax.random.split(rng)
    perm = jax.random.permutation(r_perm, idx.shape[1])[:k]
    random_pick = idx[:, perm]
    use_random = jax.random.uniform(r_choice, ()) < epsilon
    return jnp.where(use_random, random_pick, strided)


class _Act(nn.Module):
    """act_layer (torch_nn.py:9-28): relu / leakyrelu(0.2) / prelu with a
    single learned slope (init 0.2, torch PReLU num_parameters=1)."""

    act_type: str = "relu"

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        if self.act_type == "relu":
            return nn.relu(h)
        if self.act_type == "leakyrelu":
            return nn.leaky_relu(h, negative_slope=0.2)
        if self.act_type == "prelu":
            a = self.param("prelu_slope", nn.initializers.constant(0.2),
                           (), jnp.float32)
            return jnp.where(h >= 0, h, h * a.astype(h.dtype))
        raise ValueError(f"act_type {self.act_type!r}")


class EdgeConv(nn.Module):
    """max_j MLP([x_i || x_j - x_i])  (gcn_lib/dense/torch_vertex.py:23-38).

    The MLP is the reference's BasicConv (torch_nn.py:55-64): 1x1 conv ->
    activation -> optional normalization, with the max over neighbors
    taken AFTER the full BasicConv for conv_type="edge" and BEFORE it for
    "mr" (torch_vertex.py:16-35).
    """

    out_ch: int
    conv_type: Literal["edge", "mr"] = "edge"
    act_type: str = "relu"
    norm_type: str | None = None
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    def _norm(self, h: jax.Array) -> jax.Array:
        """Per-channel current-batch-statistics norm over all leading axes.

        'batch' = BatchNorm2d(affine) in perpetual train mode; 'instance'
        = InstanceNorm2d(affine=False).  On the single-sample [V, k, C]
        layout both normalize over the same (V, k) axes.
        """
        if self.norm_type is None or self.norm_type == "none":
            return h
        axes = tuple(range(h.ndim - 1))
        h32 = h.astype(jnp.float32)
        mean = jnp.mean(h32, axis=axes, keepdims=True)
        var = jnp.var(h32, axis=axes, keepdims=True)
        y = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm_type == "batch":
            scale = self.param("norm_scale", nn.initializers.ones,
                               (h.shape[-1],), jnp.float32)
            bias = self.param("norm_bias", nn.initializers.zeros,
                              (h.shape[-1],), jnp.float32)
            y = y * scale + bias
        elif self.norm_type != "instance":
            raise ValueError(f"norm_type {self.norm_type!r}")
        return y.astype(h.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x_j = x[idx]                      # [V, k, C]
        x_i = x[:, None, :]
        if self.conv_type == "edge":
            feat = jnp.concatenate(
                [jnp.broadcast_to(x_i, x_j.shape), x_j - x_i], axis=-1
            )
            h = self._norm(_Act(self.act_type)(
                nn.Dense(self.out_ch, use_bias=self.use_bias,
                         dtype=self.dtype)(feat)))
            return jnp.max(h, axis=1)
        # max-relative conv (MRConv4D): max over neighbors first
        rel = jnp.max(x_j - x_i, axis=1)
        feat = jnp.concatenate([x, rel], axis=-1)
        return self._norm(_Act(self.act_type)(
            nn.Dense(self.out_ch, use_bias=self.use_bias,
                     dtype=self.dtype)(feat)))


class SNDense(nn.Module):
    """Dense layer with spectral weight normalization.

    Power-iteration vectors live in the 'spectral' variable collection and
    are advanced one step per training call, mirroring
    `torch.nn.utils.spectral_norm` (used at network.py:287).
    """

    features: int
    power_iters: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        in_f = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_f, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        u = u_var.value
        v = None
        for _ in range(self.power_iters):
            v = w @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            u = v @ w
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("i,ij,j->", v, w, u)
        if train and not self.is_initializing():
            u_var.value = u
        return x @ (w / sigma) + b


class DenseDeepGCN(nn.Module):
    """Vertex GCN -> one global feature vector (network.py:256-315)."""

    cfg: GCNConfig = GCNConfig()

    @nn.compact
    def __call__(
        self, pos: jax.Array, x: jax.Array | None = None, *, train: bool = True
    ) -> jax.Array:
        """pos: [V, 3] vertex positions; x: [V, C] features (default pos).

        Returns [1, out_channels] global feature (the reference's
        `v_feature`).
        """
        cfg = self.cfg
        if x is None:
            x = pos
        data = jnp.concatenate([pos, x], axis=-1)  # [V, in_channels]
        if data.shape[-1] != cfg.in_channels:
            raise ValueError(
                f"GCN input is pos(3) + features({x.shape[-1]}) = "
                f"{data.shape[-1]} channels but in_channels="
                f"{cfg.in_channels}; pass matching --in_channels "
                f"(reference train_rnr.py:84)"
            )
        cdt = jnp.dtype(cfg.compute_dtype)

        # head: static graph from positions
        idx0 = knn_graph(pos, cfg.kernel_size, approx=cfg.knn_approx,
                         recall=cfg.knn_recall)
        conv_kw = dict(act_type=cfg.act_type, norm_type=cfg.norm_type,
                       use_bias=cfg.use_bias, dtype=cdt)
        feats = [EdgeConv(cfg.n_filters, cfg.conv_type, **conv_kw)(
            data, idx0)]

        idx_cache = None
        strat_cache = None
        # stratified candidates need at least k strata to sample from;
        # below that every block takes the windowed path, so the window
        # cache must NOT be capped at strat_min_dilation (a short cache
        # would truncate high-dilation neighbor lists)
        strat_possible = (
            cfg.strat_min_dilation > 0
            and pos.shape[0] >= cfg.kernel_size * cfg.stratum_width
        )
        for i in range(cfg.n_blocks - 1):
            dilation = 1 + i
            h = feats[-1]
            use_strat = strat_possible and dilation >= cfg.strat_min_dilation
            rng = (
                self.make_rng("gcn")
                if (train and cfg.stochastic and self.has_rng("gcn"))
                else None
            )
            if use_strat:
                if strat_cache is None or i % cfg.graph_refresh_every == 0:
                    strat_cache = stratified_candidates(
                        h.astype(jnp.float32), cfg.stratum_width
                    )
                idx = sample_strata(
                    strat_cache, cfg.kernel_size, i, cfg.stochastic,
                    cfg.epsilon, rng, train,
                )
            else:
                if idx_cache is None or i % cfg.graph_refresh_every == 0:
                    # size the graph for every windowed block until the
                    # next refresh (stratified blocks don't need windows)
                    last = min(
                        i + cfg.graph_refresh_every - 1, cfg.n_blocks - 2
                    )
                    if strat_possible:
                        last = min(last, cfg.strat_min_dilation - 2)
                    k_window = cfg.kernel_size * (1 + last)
                    idx_cache = knn_graph(
                        h.astype(jnp.float32), k_window,
                        approx=cfg.knn_approx,
                        recall=cfg.knn_recall,
                    )
                idx_full = idx_cache[:, : cfg.kernel_size * dilation]
                idx = dilate_edges(
                    idx_full, cfg.kernel_size, dilation, cfg.stochastic,
                    cfg.epsilon, rng, train,
                )
            if cfg.block_type == "res":
                feats.append(
                    EdgeConv(cfg.n_filters, cfg.conv_type,
                             **conv_kw)(h, idx) + h
                )
            else:
                feats.append(
                    jnp.concatenate(
                        [h, EdgeConv(cfg.n_filters, cfg.conv_type,
                                     **conv_kw)(h, idx)],
                        axis=-1,
                    )
                )

        fused = jnp.concatenate(feats, axis=-1).astype(jnp.float32)
        # fusion_block: BasicConv([.., 1024], act, norm=None, bias)
        fused = _Act(cfg.act_type)(
            nn.Dense(1024, use_bias=cfg.use_bias)(fused))
        per_vertex = jnp.max(fused, axis=-1)             # channel max -> [V]
        h = SNDense(2048)(per_vertex[None, :], train=train)
        out = SNDense(cfg.out_channels)(h, train=train)
        return out                                        # [1, out_channels]

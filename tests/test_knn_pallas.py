"""Stratified kNN kernel (ops/knn_pallas.py) + its GCN integration."""

import numpy as np
import jax
import jax.numpy as jnp

from rnr_tpu.ops.knn_pallas import stratified_knn, stratified_knn_xla
from rnr_tpu.models.gcn import (
    DenseDeepGCN,
    GCNConfig,
    knn_graph,
    sample_strata,
)


class TestStratifiedKnn:
    def test_matches_xla_oracle(self):
        rng = np.random.default_rng(0)
        for v, c in [(1024, 64), (700, 3), (512, 6)]:
            x = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32))
            a = stratified_knn(
                x, stratum=16, row_tile=128, col_tile=512, interpret=True
            )
            b = stratified_knn_xla(x, stratum=16)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_contains_true_nearest_neighbor(self):
        rng = np.random.default_rng(1)
        v = 768
        x = jnp.asarray(rng.standard_normal((v, 8)).astype(np.float32))
        idx = stratified_knn(
            x, stratum=16, row_tile=128, col_tile=256, interpret=True
        )
        d = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
        d = d.at[jnp.arange(v), jnp.arange(v)].set(jnp.inf)
        nn = jnp.argmin(d, axis=1)
        hits = jnp.any(idx == nn[:, None], axis=1)
        # self wins its own stratum (score |x|^2 — the reference's dense
        # kNN also ranks self first), so the true non-self NN is only
        # shadowed when it shares self's stratum (prob ~ stratum/V)
        shadowed = (nn // 16) == (jnp.arange(v) // 16)
        assert float((hits | shadowed).mean()) == 1.0
        assert float(hits.mean()) > 0.9
        # self is always a candidate
        self_hit = jnp.any(idx == jnp.arange(v)[:, None], axis=1)
        assert float(self_hit.mean()) == 1.0

    def test_indices_in_range(self):
        rng = np.random.default_rng(2)
        v = 700  # non-multiple of everything
        x = jnp.asarray(rng.standard_normal((v, 4)).astype(np.float32))
        idx = stratified_knn(
            x, stratum=16, row_tile=128, col_tile=256, interpret=True
        )
        assert int(idx.min()) >= 0 and int(idx.max()) < v


class TestSampleStrata:
    def test_deterministic_phase_stride(self):
        strat = jnp.arange(5 * 64).reshape(5, 64).astype(jnp.int32)
        a = sample_strata(strat, 8, 0, False, 0.2, None, True)
        b = sample_strata(strat, 8, 1, False, 0.2, None, True)
        assert a.shape == (5, 8)
        # different phase seeds -> different strata
        assert not np.array_equal(np.asarray(a), np.asarray(b))
        # phase 0 takes every (64//8)=8th stratum
        np.testing.assert_array_equal(
            np.asarray(a[0]), np.arange(0, 64, 8)
        )

    def test_stochastic_path_shape(self):
        strat = jnp.arange(5 * 64).reshape(5, 64).astype(jnp.int32)
        out = sample_strata(
            strat, 8, 0, True, 1.1, jax.random.PRNGKey(0), True
        )
        assert out.shape == (5, 8)


class TestGCNStratified:
    def test_forward_finite_and_param_identical(self):
        """Stratified default changes graphs, not parameters: the same
        weights must apply under both modes."""
        rng = np.random.default_rng(3)
        v = 512
        pos = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
        cfg_ref = GCNConfig(
            n_blocks=6, kernel_size=16, n_filters=16, num_v=v,
            out_channels=32, strat_min_dilation=0, stratum_width=16,
        )
        cfg_strat = GCNConfig(
            n_blocks=6, kernel_size=16, n_filters=16, num_v=v,
            out_channels=32, strat_min_dilation=3, stratum_width=16,
        )
        gcn_ref = DenseDeepGCN(cfg_ref)
        gcn_strat = DenseDeepGCN(cfg_strat)
        vars_ref = gcn_ref.init(jax.random.PRNGKey(0), pos)
        out_ref = gcn_ref.apply(
            vars_ref, pos, train=False, mutable=["spectral"]
        )[0]
        out_strat = gcn_strat.apply(
            vars_ref, pos, train=False, mutable=["spectral"]
        )[0]
        assert out_ref.shape == out_strat.shape == (1, 32)
        assert np.isfinite(np.asarray(out_ref)).all()
        assert np.isfinite(np.asarray(out_strat)).all()

    def test_small_mesh_high_dilation_windowed_fallback(self):
        """V below k*stratum_width forces every block onto the windowed
        path — the window cache must still cover the highest dilation
        (regression: strat cap truncated neighbor lists -> shape error
        in dilate_edges on a 117-vertex mesh with 8 blocks)."""
        rng = np.random.default_rng(5)
        v = 117  # < kernel_size * stratum_width = 128
        pos = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
        cfg = GCNConfig(
            n_blocks=8, kernel_size=8, n_filters=8, num_v=v,
            out_channels=16, strat_min_dilation=3, stratum_width=16,
        )
        gcn = DenseDeepGCN(cfg)
        variables = gcn.init(
            {"params": jax.random.PRNGKey(0), "gcn": jax.random.PRNGKey(1)},
            pos,
        )
        out = gcn.apply(
            variables, pos, train=True, mutable=["spectral"],
            rngs={"gcn": jax.random.PRNGKey(2)},
        )[0]
        assert out.shape == (1, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_exact_parity_mode_unchanged(self):
        """knn_approx=False + strat_min_dilation=0 is the reference graph
        (exact windowed top-k, gcn_lib/dense/torch_edge.py:46-65)."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((96, 8)).astype(np.float32))
        idx = knn_graph(x, 12, approx=False)
        d = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
        ref = jnp.argsort(d, axis=1)[:, :12]
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), axis=1), np.sort(np.asarray(ref), axis=1)
        )

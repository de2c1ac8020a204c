"""Pallas texture-gradient kernel vs XLA autodiff (interpret mode on CPU).

The Pallas scatter (ops/texture_pallas.py) is the production TPU path for
the texture backward (reference analog: cuda/rasterize_cuda_kernel.cu:
505-540 atomicAdd scatter).  These tests pin it element-wise (to bf16
operand precision) against the autodiff VJP of the oracle sampler.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnr_tpu.ops.interpolate import interpolate_bilinear
from rnr_tpu.ops.texture_pallas import (
    _bin_chunks,
    _level_coords,
    _xla_scatter_taps,
    mipmap_sample,
    scatter_taps,
)


def _rand_coords(rng, n_chunks, cp, lo, hi):
    return (
        jnp.asarray(rng.uniform(lo, hi, (n_chunks, cp)).astype(np.float32)),
        jnp.asarray(rng.uniform(lo, hi, (n_chunks, cp)).astype(np.float32)),
    )


class TestScatterTaps:
    def test_matches_xla_scatter(self):
        rng = np.random.default_rng(0)
        n_chunks, cp, ch, s = 6, 256, 8, 64
        x, y = _rand_coords(rng, n_chunks, cp, -4, s + 3)
        g = jnp.asarray(
            rng.standard_normal((n_chunks, cp, ch)).astype(np.float32)
        )
        dt, ovf = scatter_taps(
            x, y, g, s, s, tile_r=32, tile_c=32,
            max_chunks_per_tile=n_chunks, interpret=True,
        )
        ref = _xla_scatter_taps(x, y, g, s, s)
        assert int(ovf) == 0
        np.testing.assert_allclose(
            np.asarray(dt), np.asarray(ref), atol=2e-2, rtol=0
        )

    def test_out_of_range_pixels_contribute_nothing(self):
        rng = np.random.default_rng(1)
        n_chunks, cp, ch, s = 2, 256, 8, 32
        x, y = _rand_coords(rng, n_chunks, cp, s + 1, s + 40)
        g = jnp.ones((n_chunks, cp, ch), jnp.float32)
        dt, ovf = scatter_taps(x, y, g, s, s, interpret=True)
        assert float(jnp.max(jnp.abs(dt))) == 0.0

    def test_overflow_reported_not_silent(self):
        rng = np.random.default_rng(2)
        n_chunks, cp, ch, s = 8, 256, 4, 32
        # all chunks land in the single tile; cap forces overflow
        x, y = _rand_coords(rng, n_chunks, cp, 0, s - 1)
        g = jnp.ones((n_chunks, cp, ch), jnp.float32)
        _, ovf = scatter_taps(
            x, y, g, s, s, max_chunks_per_tile=3, interpret=True
        )
        assert int(ovf) == n_chunks - 3

    def test_binning_counts(self):
        # two chunks in disjoint tiles of a 64x64 grid with 32x32 tiles
        x = jnp.asarray([[1.0] * 4, [40.0] * 4])
        y = jnp.asarray([[1.0] * 4, [40.0] * 4])
        ids, counts, ovf = _bin_chunks(x, y, 64, 64, 32, 32, 4)
        assert int(ovf) == 0
        np.testing.assert_array_equal(np.asarray(counts), [1, 0, 0, 1])
        assert int(ids[0, 0]) == 0 and int(ids[3, 0]) == 1


class TestMipmapSample:
    def _setup(self, rng, sizes, n=1, h=64, w=64, ch=8):
        texs = tuple(
            jnp.asarray(rng.standard_normal((s, s, ch)).astype(np.float32))
            for s in sizes
        )
        uv = jnp.asarray(
            rng.uniform(-0.1, 1.1, (n, h, w, 2)).astype(np.float32)
        )
        tgt = jnp.asarray(
            rng.standard_normal((n, h, w, ch)).astype(np.float32)
        )
        return texs, uv, tgt

    def _loss_ref(self, texs, uv, tgt):
        out = None
        for t in texs:
            x, y = _level_coords(uv, t.shape[0])
            s = interpolate_bilinear(t, x, y)
            out = s if out is None else out + s
        return jnp.sum(out * tgt)

    def test_forward_and_grads_close(self):
        # forward runs the Pallas matmul-gather in bf16 compute (same
        # mixed-precision class as the scatter backward / bf16 U-Net);
        # both sides are compared at that tolerance
        rng = np.random.default_rng(3)
        texs, uv, tgt = self._setup(rng, [64, 32, 16, 8])
        f_p = lambda tx: jnp.sum(mipmap_sample(tx, uv, True) * tgt)
        f_r = lambda tx: self._loss_ref(tx, uv, tgt)
        rel = float(abs(f_p(texs) - f_r(texs))) / (
            float(abs(f_r(texs))) + 1e-6
        )
        assert rel < 2e-2, rel
        g_p = jax.grad(f_p)(texs)
        g_r = jax.grad(f_r)(texs)
        for a, b in zip(g_p, g_r):
            scale = float(jnp.max(jnp.abs(b))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=6e-3
            )

    def test_uv_gets_zero_gradient(self):
        rng = np.random.default_rng(4)
        texs, uv, tgt = self._setup(rng, [32, 16], h=32, w=32)
        g_uv = jax.grad(
            lambda u: jnp.sum(mipmap_sample(texs, u, True) * tgt)
        )(uv)
        assert float(jnp.max(jnp.abs(g_uv))) == 0.0

    def test_batch(self):
        rng = np.random.default_rng(5)
        texs, uv, tgt = self._setup(rng, [32, 16], n=2, h=32, w=64)
        f_p = lambda tx: jnp.sum(mipmap_sample(tx, uv, True) * tgt)
        f_r = lambda tx: self._loss_ref(tx, uv, tgt)
        g_p = jax.grad(f_p)(texs)
        g_r = jax.grad(f_r)(texs)
        for a, b in zip(g_p, g_r):
            scale = float(jnp.max(jnp.abs(b))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=6e-3
            )

"""Tests for texture atlas ops and host eval metrics."""

import numpy as np

import jax.numpy as jnp

from rnr_tpu.ops.texture_atlas import (
    load_textures, create_texture_image, REPEAT, MIRRORED_REPEAT,
    CLAMP_TO_EDGE, CLAMP_TO_BORDER,
)
from rnr_tpu.utils.eval_metrics import compute_err_metrics_batch


def test_load_textures_constant_image():
    img = jnp.full((8, 8, 3), 0.6)
    uv = jnp.asarray([[[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]])
    tex = load_textures(img, uv, texture_size=4)
    assert tex.shape == (1, 4, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(tex), 0.6, atol=1e-6)


def test_load_textures_wrap_modes(rng):
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    uv_out = jnp.asarray([[[1.25, 0.5], [1.75, 0.5], [1.5, 0.75]]])
    t_rep = load_textures(img, uv_out, 2, wrap=REPEAT)
    uv_eq = jnp.asarray([[[0.25, 0.5], [0.75, 0.5], [0.5, 0.75]]])
    t_eq = load_textures(img, uv_eq, 2, wrap=REPEAT)
    np.testing.assert_allclose(np.asarray(t_rep), np.asarray(t_eq), atol=1e-6)
    # mirrored: u in [1,2) maps to 1-frac
    t_mir = load_textures(img, uv_out, 2, wrap=MIRRORED_REPEAT)
    uv_mir = jnp.asarray([[[0.75, 0.5], [0.25, 0.5], [0.5, 0.75]]])
    t_mir_eq = load_textures(img, uv_mir, 2, wrap=REPEAT)
    np.testing.assert_allclose(np.asarray(t_mir), np.asarray(t_mir_eq), atol=1e-6)
    # border: zeros
    t_bor = load_textures(img, uv_out, 2, wrap=CLAMP_TO_BORDER)
    np.testing.assert_allclose(np.asarray(t_bor), 0.0)
    # edge clamp stays in range
    t_edge = load_textures(img, uv_out, 2, wrap=CLAMP_TO_EDGE)
    assert np.isfinite(np.asarray(t_edge)).all()


def test_create_texture_image_roundtrip_constant():
    tex = jnp.full((5, 4, 4, 4, 3), 0.3)
    img, uv = create_texture_image(tex, texture_size_out=8)
    # 5 faces -> 3x2 tile grid
    assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
    assert uv.shape == (5, 3, 2)
    assert 0 <= float(uv.min()) and float(uv.max()) <= 1.0
    np.testing.assert_allclose(np.asarray(img), 0.3, atol=1e-5)


def test_eval_metrics_reference_semantics(rng):
    est = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    gt = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    mask = np.zeros((2, 16, 16, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    m = compute_err_metrics_batch(est, gt, mask, compute_ssim=True)
    for k in ("mae", "mae_bb", "mae_valid", "mse", "psnr", "psnr_valid",
              "ssim", "ssim_bb", "ssim_valid"):
        assert k + "_mean" in m, k
        assert np.isfinite(m[k + "_mean"]), k
    # identical inputs give perfect scores
    m2 = compute_err_metrics_batch(gt.copy(), gt.copy(), mask)
    assert m2["mae_valid_mean"] == 0.0
    assert m2["psnr_valid_mean"] == 100.0
    np.testing.assert_allclose(m2["ssim_valid_mean"], 1.0, atol=1e-4)

"""Image error metrics (masked MAE/MSE/PSNR and SSIM) as pure XLA.

The reference computes metrics on host NumPy with dynamic-shape bounding-box
crops (metric.py:19-121).  Inside jit we need static shapes, so this module
provides mask-weighted reductions (exact for the *_valid variants) and a
Gaussian SSIM.  Host-side bounding-box variants with reference semantics
live in `rnr_tpu.utils.eval_metrics`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(img_est: jax.Array, img_gt: jax.Array, mask: jax.Array | None = None,
         max_val: float = 255.0) -> jax.Array:
    """PSNR in dB over 0..max_val images; optionally masked (metric.py:7-16)."""
    diff = (img_est - img_gt) / max_val
    if mask is None:
        mse = jnp.mean(diff * diff)
    else:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        mse = jnp.sum(diff * diff * mask) / denom
    mse = jnp.maximum(mse, 1e-10)
    return jnp.where(mse <= 1.0e-10, 100.0, -10.0 * jnp.log10(mse))


def masked_err_metrics(
    img_est: jax.Array, img_gt: jax.Array, mask: jax.Array
) -> dict[str, jax.Array]:
    """MAE/MSE/PSNR over full image and valid (masked) region.

    Args:
      img_est, img_gt: [N, H, W, C] in 0..255.
      mask: [N, H, W, 1] binary validity.

    Returns dict of per-batch-mean scalars mirroring the always-computed
    subset of reference metric.py:62-74 (bounding-box variants are host-side).
    """
    mask3 = jnp.broadcast_to(mask, img_est.shape)
    est = img_est * mask3
    gt = img_gt * mask3
    diff = jnp.abs(est - gt)
    num_valid = jnp.maximum(jnp.sum(mask3, axis=(1, 2, 3)), 1.0)

    mae = jnp.mean(diff, axis=(1, 2, 3))
    mae_valid = jnp.sum(diff, axis=(1, 2, 3)) / num_valid
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    mse_valid = jnp.sum(diff * diff, axis=(1, 2, 3)) / num_valid

    def _psnr_from_mse(m):
        m = jnp.maximum(m / (255.0 ** 2), 1e-10)
        return -10.0 * jnp.log10(m)

    return {
        "mae": jnp.mean(mae),
        "mae_valid": jnp.mean(mae_valid),
        "mse": jnp.mean(mse),
        "mse_valid": jnp.mean(mse_valid),
        "psnr": jnp.mean(_psnr_from_mse(mse)),
        "psnr_valid": jnp.mean(_psnr_from_mse(mse_valid)),
    }


def _gaussian_kernel(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 255.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Gaussian-window SSIM over [N, H, W, C] images (pytorch_msssim parity).

    Separable depthwise convolution keeps this VPU-friendly; returns the
    mean SSIM per batch, averaged over batch.
    """
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # shrink the window for images smaller than the default 11x11 (keeps
    # bounding-box SSIM defined on small crops)
    max_win = min(img1.shape[1], img1.shape[2])
    if win_size > max_win:
        win_size = max_win if max_win % 2 == 1 else max_win - 1
    kernel = _gaussian_kernel(win_size, sigma)

    def blur(x):
        # Separable filter along H then W, independently per channel.
        n, h, w, c = x.shape
        xt = jnp.moveaxis(x, -1, 1).reshape(n * c, 1, h, w)
        kh = kernel.reshape(1, 1, win_size, 1)
        kw = kernel.reshape(1, 1, 1, win_size)
        y = jax.lax.conv_general_dilated(xt, kh, (1, 1), "VALID")
        y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID")
        hh, ww = y.shape[-2], y.shape[-1]
        return jnp.moveaxis(y.reshape(n, c, hh, ww), 1, -1)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    # Variances/covariance are shift-invariant: compute them on
    # globally mean-shifted inputs so blur(x^2) - mu^2 cancels at the
    # scale of the local CONTRAST, not of the absolute magnitude
    # (unclipped network outputs reach |x| ~ 1e4-1e5 x255 early in
    # training, where the raw formulation loses every significant bit
    # of a near-zero variance to f32 rounding).
    d1 = img1 - jnp.mean(img1)
    d2 = img2 - jnp.mean(img2)
    nu1 = blur(d1)
    nu2 = blur(d2)
    sigma1_sq = blur(d1 * d1) - nu1 * nu1
    sigma2_sq = blur(d2 * d2) - nu2 * nu2
    sigma12 = blur(d1 * d2) - nu1 * nu2
    # Numerical-robustness clamps enforcing the exact-arithmetic
    # invariants sigma^2 >= 0 and |sigma12| <= sqrt(sigma1^2 sigma2^2).
    # The f32 window normalization is off by ~5e-8, so blur(x^2)-mu^2
    # carries an error ~ -eps*mu^2: for unclipped network outputs with
    # |x| ~ 1e4-1e5 (early-training relight renders x255) that error
    # swamps c2 = (0.03*255)^2, the denominator crosses zero, and the
    # SSIM map blows up (observed: "ssim 16.6" in a relight validation).
    # For in-range inputs the clamps are a rounding-level no-op, keeping
    # pytorch_msssim parity.
    sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
    sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
    bound = jnp.sqrt(sigma1_sq * sigma2_sq)
    sigma12 = jnp.clip(sigma12, -bound, bound)

    ssim_map = ((2.0 * mu12 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)

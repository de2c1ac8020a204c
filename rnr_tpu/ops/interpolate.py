"""Bilinear gather — the workhorse sampling op of the framework.

Semantics match the reference implementation's `misc.interpolate_bilinear`
(reference: misc.py:5-42): coordinates are in *texel* units, samples outside
[0, W-1] x [0, H-1] return exactly zero (the validity mask multiplies the
weights), and the corner indices are clamped to the array bounds with a
boundary fix-up so that sampling exactly at the last texel returns that
texel.

TPU notes: this lowers to four flat XLA gathers + fused VPU arithmetic.
Gathers from HBM are bandwidth-bound; the mipmap texture sampler batches all
levels into one call-site so XLA can pipeline them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_bilinear(data: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample `data` at fractional positions, zero outside the valid range.

    Args:
      data: [H, W, C] source grid.
      x: [...] fractional column coordinates (texel units).
      y: [...] fractional row coordinates (texel units).

    Returns:
      [..., C] samples; exactly 0 where (x, y) falls outside
      [0, W-1] x [0, H-1]  (reference: misc.py:14,37-40).
    """
    h, w = data.shape[0], data.shape[1]
    dtype = data.dtype
    x = x.astype(dtype)
    y = y.astype(dtype)

    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    ).astype(dtype)

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    flat = data.reshape(h * w, -1)
    i00 = jnp.take(flat, y0 * w + x0, axis=0)
    i10 = jnp.take(flat, y1 * w + x0, axis=0)
    i01 = jnp.take(flat, y0 * w + x1, axis=0)
    i11 = jnp.take(flat, y1 * w + x1, axis=0)

    # Boundary fix-up: at the right/bottom edge x0 == x1 after clamping, so
    # shift the *weight* anchor one texel back (reference: misc.py:32-35).
    x0w = (x0 - (x0 == x1)).astype(dtype)
    y0w = (y0 - (y0 == y1)).astype(dtype)
    x1w = x1.astype(dtype)
    y1w = y1.astype(dtype)

    w00 = (x1w - x) * (y1w - y) * valid
    w10 = (x1w - x) * (y - y0w) * valid
    w01 = (x - x0w) * (y1w - y) * valid
    w11 = (x - x0w) * (y - y0w) * valid

    out = (
        i00 * w00[..., None]
        + i10 * w10[..., None]
        + i01 * w01[..., None]
        + i11 * w11[..., None]
    )
    return out


def interpolate_bilinear_batch(
    data: jax.Array, x: jax.Array, y: jax.Array
) -> jax.Array:
    """Batched bilinear gather (the reference's `Interpolater` module).

    Args:
      data: [N, H, W, C] or [1, H, W, C] (shared across the batch).
      x, y: [N, ...] coordinates.

    Returns: [N, ..., C]  (reference: network.py:318-337).
    """
    if data.shape[0] == 1:
        return interpolate_bilinear(data[0], x, y)
    return jax.vmap(interpolate_bilinear)(data, x, y)


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True semantics.

    Matches `torch.nn.functional.interpolate(..., mode='bilinear')` only in
    spirit; used for mipmap flattening (reference: network.py:93-99) where the
    exact filter tap placement is a free design choice of the new framework.

    Args: img [H, W, C]; returns [out_h, out_w, C].
    """
    return jax.image.resize(img, (out_hw[0], out_hw[1], img.shape[-1]), "bilinear")


def interpolate_bilinear_np(data, sub_x, sub_y):
    """Host-side NumPy twin of interpolate_bilinear (misc.py:45-73).

    Edge-clamped (no out-of-range masking, matching the reference twin's
    semantics, which differ from the torch version); used by host-side
    stitch/precompute paths.

    Args:
      data: [H, W, C] ndarray.
      sub_x, sub_y: [...] float pixel coordinates.
    Returns [..., C].
    """
    import numpy as np

    x0 = np.floor(sub_x).astype(np.int64)
    x1 = x0 + 1
    y0 = np.floor(sub_y).astype(np.int64)
    y1 = y0 + 1
    x0 = np.clip(x0, 0, data.shape[1] - 1)
    x1 = np.clip(x1, 0, data.shape[1] - 1)
    y0 = np.clip(y0, 0, data.shape[0] - 1)
    y1 = np.clip(y1, 0, data.shape[0] - 1)
    i00 = data[y0, x0, :]
    i10 = data[y1, x0, :]
    i01 = data[y0, x1, :]
    i11 = data[y1, x1, :]
    w00 = (x1 - sub_x) * (y1 - sub_y)
    w10 = (x1 - sub_x) * (sub_y - y0)
    w01 = (sub_x - x0) * (y1 - sub_y)
    w11 = (sub_x - x0) * (sub_y - y0)
    return (i00 * w00[..., None] + i10 * w10[..., None]
            + i01 * w01[..., None] + i11 * w11[..., None])

"""Per-face texture volume <-> 2D texture image conversion.

XLA equivalents of the reference's remaining two CUDA extensions:
  * `load_textures` (load_textures_cuda_kernel.cu:18-114) — fill per-face
    volumetric textures [F, ts, ts, ts, 3] from a 2D texture image via UV
    wrap modes + bilinear/nearest sampling,
  * `create_texture_image` (create_texture_image_cuda_kernel.cu:18-119) —
    bake per-face textures into a tiled 2D atlas for OBJ export.

Both are pure gathers — embarrassingly parallel and differentiable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

REPEAT = 0
MIRRORED_REPEAT = 1
CLAMP_TO_EDGE = 2
CLAMP_TO_BORDER = 3


def _wrap_uv(face_uv: jax.Array, mode: int) -> jax.Array:
    if mode == REPEAT:
        return jnp.mod(face_uv, 1.0)
    if mode == MIRRORED_REPEAT:
        m2 = jnp.mod(face_uv, 2.0)
        return jnp.where(m2 < 1.0, jnp.mod(face_uv, 1.0),
                         1.0 - jnp.mod(face_uv, 1.0))
    if mode in (CLAMP_TO_EDGE, CLAMP_TO_BORDER):
        return jnp.clip(face_uv, 0.0, 1.0)
    raise ValueError(f"unknown wrap mode {mode}")


def load_textures(
    image: jax.Array,
    faces_uv: jax.Array,
    texture_size: int,
    wrap: int = REPEAT,
    use_bilinear: bool = True,
) -> jax.Array:
    """Sample a texture image into per-face texture volumes.

    Args:
      image: [H, W, 3] texture image.
      faces_uv: [F, 3, 2] per-face-corner UVs (v measured from the bottom,
        already flipped by the caller like the reference's load_obj).
      texture_size: ts of the output volume.
      wrap: REPEAT / MIRRORED_REPEAT / CLAMP_TO_EDGE / CLAMP_TO_BORDER.

    Returns textures [F, ts, ts, ts, 3].
    """
    h, w = image.shape[0], image.shape[1]
    ts = texture_size
    f = faces_uv.shape[0]

    uv = _wrap_uv(faces_uv, wrap)  # [F, 3, 2]

    # barycentric grid over the texture volume (CUDA dim0/1/2 normalize)
    d0 = jnp.arange(ts, dtype=image.dtype) / (ts - 1)
    g0, g1, g2 = jnp.meshgrid(d0, d0, d0, indexing="ij")
    gsum = g0 + g1 + g2
    scale = jnp.where(gsum > 0, 1.0 / jnp.maximum(gsum, 1e-20), 1.0)
    w0 = g0 * scale
    w1 = g1 * scale
    w2 = g2 * scale  # each [ts, ts, ts]

    pos_x = (
        uv[:, 0, 0][:, None, None, None] * w0
        + uv[:, 1, 0][:, None, None, None] * w1
        + uv[:, 2, 0][:, None, None, None] * w2
    ) * (w - 1)
    pos_y = (
        uv[:, 0, 1][:, None, None, None] * w0
        + uv[:, 1, 1][:, None, None, None] * w1
        + uv[:, 2, 1][:, None, None, None] * w2
    ) * (h - 1)

    flat = image.reshape(h * w, 3)
    if use_bilinear:
        x0 = jnp.floor(pos_x).astype(jnp.int32)
        y0 = jnp.floor(pos_y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wx1 = pos_x - x0
        wx0 = 1.0 - wx1
        wy1 = pos_y - y0
        wy0 = 1.0 - wy1
        out = (
            flat[y0 * w + x0] * (wx0 * wy0)[..., None]
            + flat[y1 * w + x0] * (wx0 * wy1)[..., None]
            + flat[y0 * w + x1] * (wx1 * wy0)[..., None]
            + flat[y1 * w + x1] * (wx1 * wy1)[..., None]
        )
    else:
        xi = jnp.round(pos_x).astype(jnp.int32)
        yi = jnp.round(pos_y).astype(jnp.int32)
        out = flat[yi * w + xi]

    if wrap == CLAMP_TO_BORDER:
        out = jnp.zeros_like(out)
    return out


def create_texture_image(
    textures: jax.Array,
    texture_size_out: int = 16,
    eps: float = 1e-5,
):
    """Bake per-face texture volumes into a tiled 2D atlas.

    Args:
      textures: [F, tsi, tsi, tsi, 3] per-face volumes.
      texture_size_out: side length of each face tile in the atlas.

    Returns (image [H, W, 3], faces_uv [F, 3, 2]) — the atlas plus the UV
    coordinates to reference it from an OBJ (save_obj counterpart).
    """
    f = textures.shape[0]
    tsi = textures.shape[1]
    tso = texture_size_out
    tile_width = int(math.ceil(math.sqrt(f)))
    tile_height = int(math.ceil(f / tile_width))
    h = tile_height * tso
    w = tile_width * tso

    # per-pixel face id + in-tile coords
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    row = xs // tso
    col = ys // tso
    fn = jnp.clip(row + col * tile_width, 0, f - 1)

    # in-tile triangle: p0=(0,0), p1=(tso-1, 0) ... the CUDA kernel uses
    # precomputed per-face tile vertices; here the canonical right
    # triangle per tile (vertices_all equivalent)
    x_in = (xs % tso).astype(textures.dtype)
    y_in = (ys % tso).astype(textures.dtype)
    denom = float(tso - 1)
    w1 = x_in / denom - y_in / denom  # along p1
    w2 = y_in / denom                 # along p2
    w0 = 1.0 - w1 - w2
    wts = jnp.stack([w0, w1, w2], axis=-1)
    wts = wts / (jnp.sum(wts, axis=-1, keepdims=True) + eps)

    ti = jnp.clip(wts * (tsi - 1), 0.0, tsi - 1 - eps)
    t0 = jnp.floor(ti).astype(jnp.int32)
    frac = ti - t0

    tex_flat = textures.reshape(f * tsi * tsi * tsi, 3)
    out = jnp.zeros((h, w, 3), textures.dtype)
    for corner in range(8):
        cw = jnp.ones_like(frac[..., 0])
        idx3 = []
        for k in range(3):
            if (corner >> k) % 2 == 0:
                cw = cw * (1.0 - frac[..., k])
                idx3.append(t0[..., k])
            else:
                cw = cw * frac[..., k]
                idx3.append(jnp.minimum(t0[..., k] + 1, tsi - 1))
        lin = (
            fn * (tsi * tsi * tsi)
            + idx3[0] * (tsi * tsi)
            + idx3[1] * tsi
            + idx3[2]
        )
        out = out + cw[..., None] * tex_flat[lin]

    # per-face atlas UVs (normalized, v from the top like the image)
    fid = jnp.arange(f)
    r = fid % tile_width
    c = fid // tile_width
    x0f = (r * tso).astype(textures.dtype)
    y0f = (c * tso).astype(textures.dtype)
    p0 = jnp.stack([x0f, y0f], -1)
    p1 = jnp.stack([x0f + tso - 1, y0f], -1)
    p2 = jnp.stack([x0f, y0f + tso - 1], -1)
    uv = jnp.stack([p0, p1, p2], axis=1)
    uv = uv / jnp.asarray([w - 1, h - 1], textures.dtype)
    return out, uv

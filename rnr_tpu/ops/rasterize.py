"""Differentiable triangle rasterization — XLA reference implementation.

This reproduces the semantics of the reference CUDA rasterizer
(neural_renderer/cuda/rasterize_cuda_kernel.cu:24-169 — per-face inverse
barycentric matrices, per-pixel z-buffer over all faces, clamped barycentric
weights, perspective depth 1/zp = sum(w_k / z_k)) as a TPU-friendly design:

  * The z-buffer is a `lax.scan` over *face chunks* with a [pixels] carry —
    static shapes, no atomics, the min-reduction fuses with the elementwise
    edge tests so the [pixels, chunk] intermediates never hit HBM.
  * The discrete winner (`face_index_map`) is treated as a non-differentiable
    assignment; weights/depth/attributes are *recomputed* from the vertices
    analytically in `pixel_attrs`, so JAX autodiff yields the exact interior
    gradients that the reference implements by hand in
    `backward_depth_map_cuda` (rasterize_cuda_kernel.cu:542-592).
  * Screen-space silhouette (coverage) gradients are provided separately in
    `rnr_tpu.ops.edge_grad` as a custom VJP.

A Pallas production kernel with image-tile binning lives in
`rnr_tpu.ops.rasterize_pallas`; this module is its correctness oracle and
works on any backend.

All outputs follow the reference's post-rasterize row flip
(neural_renderer/rasterize.py:306-318): row 0 is the *top* image row.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RasterOutput(NamedTuple):
    """Raster buffers, all already vertically flipped to image orientation."""

    face_index_map: jax.Array  # [N, S, S] int32, -1 where empty
    weight_map: jax.Array      # [N, S, S, 3] clamped barycentrics
    depth_map: jax.Array       # [N, S, S] zp, `far` where empty
    alpha_map: jax.Array       # [N, S, S] float 0/1
    # [N] int32 count of candidate faces dropped by tile binning
    # (rasterize_pallas only; the XLA scan path visits every face and
    # always reports 0).  Non-zero means max_faces_per_tile must be
    # raised for this mesh — check it, the render is incomplete.
    overflow: jax.Array | None = None


def _ndc_to_pixel(xy: jax.Array, image_size: int) -> jax.Array:
    """Map NDC [-1, 1] to pixel coords [0, S-1] (rasterize_cuda_kernel.cu:47)."""
    return 0.5 * (xy * image_size + image_size - 1)


def face_inv_matrix(p: jax.Array) -> jax.Array:
    """Inverse of [[x0,y0,1],[x1,y1,1],[x2,y2,1]] via the adjugate.

    p: [..., 3, 2] pixel-space vertices -> [..., 3, 3].
    Matches rasterize_cuda_kernel.cu:52-62 including the unguarded division
    (degenerate faces produce inf/nan and are rejected by the edge tests).
    """
    x0, y0 = p[..., 0, 0], p[..., 0, 1]
    x1, y1 = p[..., 1, 0], p[..., 1, 1]
    x2, y2 = p[..., 2, 0], p[..., 2, 1]
    adj = jnp.stack(
        [
            y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
            y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
            y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
        ],
        axis=-1,
    ).reshape(p.shape[:-2] + (3, 3))
    den = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    den = jnp.where(den == 0.0, 1e-30, den)
    return adj / den[..., None, None]


def _is_backface(f: jax.Array) -> jax.Array:
    """Backface predicate in NDC (rasterize_cuda_kernel.cu:40)."""
    x0, y0 = f[..., 0, 0], f[..., 0, 1]
    x1, y1 = f[..., 1, 0], f[..., 1, 1]
    x2, y2 = f[..., 2, 0], f[..., 2, 1]
    return (y2 - y0) * (x1 - x0) < (y1 - y0) * (x2 - x0)


def _inside(f: jax.Array, xp: jax.Array, yp: jax.Array) -> jax.Array:
    """Inside-triangle test via three edge half-planes in NDC.

    f: [..., 3, 3] faces; xp, yp: pixel-center NDC coords broadcastable
    against f's batch dims.  Matches rasterize_cuda_kernel.cu:115-118 —
    pixels exactly on an edge count as inside.
    """
    x0, y0 = f[..., 0, 0], f[..., 0, 1]
    x1, y1 = f[..., 1, 0], f[..., 1, 1]
    x2, y2 = f[..., 2, 0], f[..., 2, 1]
    in0 = (yp - y0) * (x1 - x0) >= (xp - x0) * (y1 - y0)
    in1 = (yp - y1) * (x2 - x1) >= (xp - x1) * (y2 - y1)
    in2 = (yp - y2) * (x0 - x2) >= (xp - x2) * (y0 - y2)
    return in0 & in1 & in2


def _clamped_weights(face_inv: jax.Array, xi: jax.Array, yi: jax.Array):
    """Barycentric weights at integer pixel coords, clamped + renormalized.

    face_inv: [..., 3, 3]; xi, yi broadcastable.  Returns [..., 3].
    Matches rasterize_cuda_kernel.cu:120-134.
    """
    w = (
        face_inv[..., :, 0] * xi[..., None]
        + face_inv[..., :, 1] * yi[..., None]
        + face_inv[..., :, 2]
    )
    w = jnp.clip(w, 0.0, 1.0)
    s = jnp.sum(w, axis=-1, keepdims=True)
    return w / jnp.where(s == 0.0, 1e-30, s)


def _zp_from_weights(w: jax.Array, fz: jax.Array) -> jax.Array:
    """Perspective depth 1 / sum(w_k / z_k)  (rasterize_cuda_kernel.cu:136)."""
    denom = jnp.sum(w / fz, axis=-1)
    return 1.0 / jnp.where(denom == 0.0, 1e-30, denom)


@partial(jax.jit, static_argnames=("image_size", "face_chunk"))
def rasterize_face_index(
    faces: jax.Array,
    image_size: int,
    near: float = 0.0,
    far: float = 1e5,
    face_chunk: int = 128,
) -> RasterOutput:
    """Z-buffer rasterization: per-pixel winning face + weights + depth.

    Args:
      faces: [N, F, 3, 3] projected faces; xy in NDC [-1, 1], z camera depth.
      image_size: output side length S (static).
      near, far: depth clip planes.
      face_chunk: faces per scan step (VPU working-set knob).

    Returns RasterOutput with [N, S, S, ...] buffers in *image* orientation
    (row 0 = top), matching the reference wrapper's flip
    (neural_renderer/rasterize.py:306-318).
    """
    n, f = faces.shape[0], faces.shape[1]
    s = image_size
    pad = (-f) % face_chunk
    valid0 = jnp.ones((f,), dtype=bool)
    if pad:
        filler = jnp.broadcast_to(
            jnp.array(
                [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]],
                faces.dtype,
            ),
            (n, pad, 3, 3),
        )
        faces = jnp.concatenate([faces, filler], axis=1)
        valid0 = jnp.concatenate([valid0, jnp.zeros((pad,), dtype=bool)])
    num_chunks = faces.shape[1] // face_chunk

    # Pixel-center coordinates (integer and NDC).
    xi = jnp.arange(s, dtype=faces.dtype)
    yi = jnp.arange(s, dtype=faces.dtype)
    xig, yig = jnp.meshgrid(xi, yi, indexing="xy")   # [S, S] row = yi
    xig = xig.reshape(-1)
    yig = yig.reshape(-1)
    xp = (2.0 * xig + 1.0 - s) / s
    yp = (2.0 * yig + 1.0 - s) / s

    def raster_one(faces_b: jax.Array) -> tuple[jax.Array, jax.Array]:
        front = ~_is_backface(faces_b) & valid0              # [F]
        p = _ndc_to_pixel(faces_b[..., :2], s)               # [F, 3, 2]
        finv = face_inv_matrix(p)                            # [F, 3, 3]

        chunks_f = faces_b.reshape(num_chunks, face_chunk, 3, 3)
        chunks_inv = finv.reshape(num_chunks, face_chunk, 3, 3)
        chunks_front = front.reshape(num_chunks, face_chunk)
        chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)

        def step(carry, xs):
            best_depth, best_idx = carry
            cf, cinv, cfront, cid = xs
            # [P, C] edge tests and depths — fused, never materialized.
            inside = _inside(
                cf[None, :, :, :], xp[:, None], yp[:, None]
            )
            w = _clamped_weights(
                cinv[None, :, :, :], xig[:, None], yig[:, None]
            )
            zp = _zp_from_weights(w, cf[None, :, :, 2])
            ok = inside & cfront[None, :] & (zp > near) & (zp < far)
            depth_c = jnp.where(ok, zp, jnp.inf)
            cmin = jnp.min(depth_c, axis=1)
            carg = jnp.argmin(depth_c, axis=1).astype(jnp.int32)
            take = cmin < best_depth
            best_depth = jnp.where(take, cmin, best_depth)
            best_idx = jnp.where(take, cid * face_chunk + carg, best_idx)
            return (best_depth, best_idx), None

        init = (
            jnp.full((s * s,), far, faces.dtype),
            jnp.full((s * s,), -1, jnp.int32),
        )
        (depth, idx), _ = jax.lax.scan(
            step, init, (chunks_f, chunks_inv, chunks_front, chunk_ids)
        )
        return depth, idx

    depth, idx = jax.vmap(raster_one)(faces)
    depth = depth.reshape(n, s, s)
    idx = idx.reshape(n, s, s)

    # Recompute the winner's weights (cheap single gather).
    safe_idx = jnp.clip(idx, 0, f - 1)
    finv_all = face_inv_matrix(
        _ndc_to_pixel(faces[..., :2], s)
    )  # [N, F+pad, 3, 3]
    finv_px = jnp.take_along_axis(
        finv_all, safe_idx.reshape(n, -1, 1, 1).astype(jnp.int32), axis=1
    ).reshape(n, s, s, 3, 3)
    w = _clamped_weights(finv_px, xig.reshape(1, s, s), yig.reshape(1, s, s))
    covered = idx >= 0
    w = jnp.where(covered[..., None], w, 0.0)
    depth = jnp.where(covered, depth, far)

    # Flip rows to image orientation.
    out = RasterOutput(
        face_index_map=idx[:, ::-1, :],
        weight_map=w[:, ::-1, :, :],
        depth_map=depth[:, ::-1, :],
        alpha_map=covered[:, ::-1, :].astype(faces.dtype),
    )
    return out


def pixel_attrs(
    faces: jax.Array,
    face_index_map: jax.Array,
    image_size: int,
    return_face_px: bool = False,
):
    """Differentiable per-pixel weights/depth given a fixed face assignment.

    Recomputes clamped barycentric weights and perspective depth from the
    (differentiable) projected faces at the pixels selected by
    `face_index_map` (already in image orientation).  Autodiff through this
    function yields the interior z/weight gradients that the reference codes
    by hand (rasterize_cuda_kernel.cu:542-592).

    Args:
      faces: [N, F, 3, 3] projected faces (xy NDC, z depth) — differentiable.
      face_index_map: [N, S, S] int32 winner map (non-diff), -1 empty.
      image_size: S.

    Returns:
      (weight_map [N, S, S, 3], depth_map [N, S, S], covered [N, S, S] bool)
    """
    n = faces.shape[0]
    s = image_size
    covered = face_index_map >= 0
    safe_idx = jnp.clip(face_index_map, 0, faces.shape[1] - 1)

    f_px = jnp.take_along_axis(
        faces, safe_idx.reshape(n, -1, 1, 1).astype(jnp.int32), axis=1
    ).reshape(n, s, s, 3, 3)

    # Integer pixel coords in raster (pre-flip) orientation: the maps are
    # already flipped, so row r corresponds to raster yi = S - 1 - r.
    xi = jnp.arange(s, dtype=faces.dtype)
    yi = (s - 1) - jnp.arange(s, dtype=faces.dtype)
    xig = jnp.broadcast_to(xi[None, None, :], (1, s, s))
    yig = jnp.broadcast_to(yi[None, :, None], (1, s, s))

    p = _ndc_to_pixel(f_px[..., :2], s)
    finv = face_inv_matrix(p)
    w = _clamped_weights(finv, xig, yig)
    zp = _zp_from_weights(w, f_px[..., 2])
    w = jnp.where(covered[..., None], w, 0.0)
    zp = jnp.where(covered, zp, 0.0)
    if return_face_px:
        # hand the gathered per-pixel faces to the caller so downstream
        # consumers (sample_textures' fz) need no second gather
        return w, zp, covered, f_px
    return w, zp, covered

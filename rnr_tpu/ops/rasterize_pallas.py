"""Pallas tile-binned triangle rasterizer — the production TPU kernel.

The reference's CUDA rasterizer is a brute-force per-pixel loop over ALL
faces (rasterize_cuda_kernel.cu:70-169, O(pixels x faces)).  The TPU
re-design splits the problem:

  1. *Binning* (XLA): per-face screen bounding boxes are intersected with
     the image tile grid; each tile gets a padded, static-size list of
     candidate faces (`jnp.nonzero(..., size=K)` per tile).
  2. *Per-tile z-buffer* (Pallas): one grid cell per image tile; the
     tile's candidate face data lives in VMEM and a `fori_loop` walks it,
     updating [TH, TW] depth/index accumulators entirely on-chip.  HBM
     traffic is one face-list read + one tile write — the z-buffer never
     round-trips.

Work drops from S^2 * F to sum-over-tiles(K_tile * TH * TW), a ~50-100x
reduction for real meshes where faces are small relative to the image.

Semantics match `rnr_tpu.ops.rasterize.rasterize_face_index` (which is the
correctness oracle and is itself validated against a NumPy port of the
CUDA kernel): same backface cull, inside tests, clamped barycentrics,
perspective depth, strict z-test with first-face tie breaking, and the
final vertical flip to image orientation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnr_tpu.ops.rasterize import (
    RasterOutput,
    _is_backface,
    _ndc_to_pixel,
    face_inv_matrix,
    _clamped_weights,
)


def _bin_faces(
    faces_b: jax.Array,
    image_size: int,
    tile_h: int,
    tile_w: int,
    max_faces_per_tile: int,
):
    """Assign faces to image tiles by screen bbox overlap.

    faces_b: [F, 3, 3] NDC faces (single batch element).
    Returns (face_data [T, K, 18], face_ids [T, K] int32 with -1 padding),
    where T = (S/tile_h) * (S/tile_w) in row-major raster order and the 18
    floats pack xyz of the 3 vertices plus the 3x3 face_inv.
    """
    s = image_size
    f = faces_b.shape[0]
    front = ~_is_backface(faces_b)
    p = _ndc_to_pixel(faces_b[..., :2], s)  # [F, 3, 2] pixel coords
    finv = face_inv_matrix(p)

    xmin = jnp.min(p[..., 0], axis=1)
    xmax = jnp.max(p[..., 0], axis=1)
    ymin = jnp.min(p[..., 1], axis=1)
    ymax = jnp.max(p[..., 1], axis=1)
    # pixel-center sample positions are integers 0..S-1
    tx0 = jnp.clip(jnp.floor(xmin).astype(jnp.int32) // tile_w, 0, s // tile_w - 1)
    tx1 = jnp.clip(jnp.ceil(xmax).astype(jnp.int32) // tile_w, 0, s // tile_w - 1)
    ty0 = jnp.clip(jnp.floor(ymin).astype(jnp.int32) // tile_h, 0, s // tile_h - 1)
    ty1 = jnp.clip(jnp.ceil(ymax).astype(jnp.int32) // tile_h, 0, s // tile_h - 1)
    offscreen = (xmax < 0) | (xmin > s - 1) | (ymax < 0) | (ymin > s - 1)
    ok = front & ~offscreen

    n_ty = s // tile_h
    n_tx = s // tile_w
    t_ids_y = jnp.arange(n_ty)[None, :]  # [1, n_ty]
    t_ids_x = jnp.arange(n_tx)[None, :]
    in_y = (ty0[:, None] <= t_ids_y) & (t_ids_y <= ty1[:, None])  # [F, n_ty]
    in_x = (tx0[:, None] <= t_ids_x) & (t_ids_x <= tx1[:, None])  # [F, n_tx]
    overlap = (
        in_y[:, :, None] & in_x[:, None, :] & ok[:, None, None]
    ).reshape(f, n_ty * n_tx)

    def per_tile(col):
        idx = jnp.nonzero(col, size=max_faces_per_tile, fill_value=f)[0]
        return idx.astype(jnp.int32)

    tile_faces = jax.vmap(per_tile, in_axes=1)(overlap)  # [T, K]
    valid = tile_faces < f
    safe = jnp.where(valid, tile_faces, 0)

    flat = jnp.concatenate(
        [faces_b.reshape(f, 9), finv.reshape(f, 9)], axis=1
    )  # [F, 18]
    face_data = flat[safe]  # [T, K, 18]
    face_ids = jnp.where(valid, tile_faces, -1)
    counts = jnp.sum(valid.astype(jnp.int32), axis=1)  # [T]
    # candidates beyond the static cap are silently absent from
    # tile_faces — count them so callers can detect an incomplete render
    true_counts = jnp.sum(overlap.astype(jnp.int32), axis=0)  # [T]
    overflow = jnp.sum(jnp.maximum(true_counts - max_faces_per_tile, 0))
    return face_data, face_ids, counts, overflow


def _raster_kernel(s, tile_h, tile_w, near, far):
    def kernel(count_ref, data_ref, ids_ref, depth_ref, idx_ref):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        # integer iota (Mosaic requires int iota), then cast
        yi = (
            ty * tile_h
            + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        ).astype(jnp.float32)
        xi = (
            tx * tile_w
            + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        ).astype(jnp.float32)
        yp = (2.0 * yi + 1.0 - s) / s
        xp = (2.0 * xi + 1.0 - s) / s

        # dynamic trip count: only walk the tile's real candidates, not
        # the static padding
        k = count_ref[0, 0, 0, 0]

        def body(i, carry):
            depth, idx = carry
            d = data_ref[0, 0, pl.ds(i, 1), :][0]
            fid = ids_ref[0, 0, pl.ds(i, 1), 0][0]
            x0, y0, z0 = d[0], d[1], d[2]
            x1, y1, z1 = d[3], d[4], d[5]
            x2, y2, z2 = d[6], d[7], d[8]
            # inside tests (strict parity with rasterize.py::_inside)
            in0 = (yp - y0) * (x1 - x0) >= (xp - x0) * (y1 - y0)
            in1 = (yp - y1) * (x2 - x1) >= (xp - x1) * (y2 - y1)
            in2 = (yp - y2) * (x0 - x2) >= (xp - x2) * (y0 - y2)
            inside = in0 & in1 & in2
            # clamped barycentrics from face_inv rows
            w0 = jnp.clip(d[9] * xi + d[10] * yi + d[11], 0.0, 1.0)
            w1 = jnp.clip(d[12] * xi + d[13] * yi + d[14], 0.0, 1.0)
            w2 = jnp.clip(d[15] * xi + d[16] * yi + d[17], 0.0, 1.0)
            wsum = w0 + w1 + w2
            wsum = jnp.where(wsum == 0.0, 1e-30, wsum)
            inv_zp = (w0 / z0 + w1 / z1 + w2 / z2) / wsum
            zp = 1.0 / jnp.where(inv_zp == 0.0, 1e-30, inv_zp)
            ok = (
                inside
                & (fid >= 0)
                & (zp > near)
                & (zp < far)
                & (zp < depth)
            )
            depth = jnp.where(ok, zp, depth)
            idx = jnp.where(ok, fid, idx)
            return depth, idx

        depth0 = jnp.full((tile_h, tile_w), far, jnp.float32)
        idx0 = jnp.full((tile_h, tile_w), -1, jnp.int32)
        depth, idx = jax.lax.fori_loop(0, k, body, (depth0, idx0))
        depth_ref[:, :] = depth
        idx_ref[:, :] = idx

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "image_size", "near", "far", "tile_h", "tile_w",
        "max_faces_per_tile", "interpret",
    ),
)
def rasterize_pallas(
    faces: jax.Array,
    image_size: int,
    near: float = 0.0,
    far: float = 1e5,
    tile_h: int = 32,
    tile_w: int = 128,
    max_faces_per_tile: int = 2048,
    interpret: bool = False,
) -> RasterOutput:
    """Tile-binned Pallas rasterization, drop-in for rasterize_face_index.

    faces: [N, F, 3, 3] NDC faces.  Faces beyond `max_faces_per_tile`
    candidates in one tile are dropped; the returned
    `RasterOutput.overflow` ([N] int32) counts the drops — non-zero
    means the render is incomplete and the knob must be raised (the
    default covers >2k overlapping candidates per 32x128 px).
    """
    s = image_size
    if s % tile_h or s % tile_w:
        raise ValueError(f"image_size {s} not divisible by tile {tile_h}x{tile_w}")
    n, f = faces.shape[0], faces.shape[1]
    n_ty = s // tile_h
    n_tx = s // tile_w

    kernel = _raster_kernel(s, tile_h, tile_w, near, far)

    def raster_one(faces_b):
        face_data, face_ids, counts, overflow = _bin_faces(
            faces_b, s, tile_h, tile_w, max_faces_per_tile
        )
        face_data = face_data.reshape(n_ty, n_tx, -1, 18)
        # ids carry a trailing singleton so the block's last two dims equal
        # the array dims (Mosaic block-shape constraint)
        face_ids = face_ids.reshape(n_ty, n_tx, -1, 1)
        counts = counts.reshape(n_ty, n_tx, 1, 1)
        depth, idx = pl.pallas_call(
            kernel,
            grid=(n_ty, n_tx),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 1),
                    lambda ty, tx: (ty, tx, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, max_faces_per_tile, 18),
                    lambda ty, tx: (ty, tx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, max_faces_per_tile, 1),
                    lambda ty, tx: (ty, tx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile_h, tile_w),
                    lambda ty, tx: (ty, tx),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_h, tile_w),
                    lambda ty, tx: (ty, tx),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s, s), jnp.float32),
                jax.ShapeDtypeStruct((s, s), jnp.int32),
            ],
            interpret=interpret,
        )(counts, face_data, face_ids)
        return depth, idx, overflow

    depth, idx, overflow = jax.vmap(raster_one)(faces)

    # winner weights, exactly like the oracle path
    safe_idx = jnp.clip(idx, 0, f - 1)
    finv_all = face_inv_matrix(_ndc_to_pixel(faces[..., :2], s))
    finv_px = jnp.take_along_axis(
        finv_all, safe_idx.reshape(n, -1, 1, 1).astype(jnp.int32), axis=1
    ).reshape(n, s, s, 3, 3)
    xi = jnp.arange(s, dtype=faces.dtype)
    xig = jnp.broadcast_to(xi[None, None, :], (1, s, s))
    yig = jnp.broadcast_to(xi[None, :, None], (1, s, s))
    w = _clamped_weights(finv_px, xig, yig)
    covered = idx >= 0
    w = jnp.where(covered[..., None], w, 0.0)
    depth = jnp.where(covered, depth, far)

    return RasterOutput(
        face_index_map=idx[:, ::-1, :],
        weight_map=w[:, ::-1, :, :],
        depth_map=depth[:, ::-1, :],
        alpha_map=covered[:, ::-1, :].astype(faces.dtype),
        overflow=overflow,
    )

"""Pallas mipmap texture-gradient kernel — scatter-add as MXU matmuls.

The reference's texture backward is an atomicAdd scatter of `w * grad_rgb`
into the texture at the 4 bilinear tap indices per covered pixel
(reference: cuda/rasterize_cuda_kernel.cu:505-540).  The TPU re-design of
that scatter (and of the autodiff VJP of `models/texture.py`'s mipmap
sampler, which XLA lowers to a slow serialized scatter) exploits that
bilinear weights factorize as an outer product:

    w00 = wx0*wy0, w10 = wx0*wy1, w01 = wx1*wy0, w11 = wx1*wy1

so the scatter of a whole pixel chunk into one texture tile is a single
matmul between one-hot-weighted matrices built in VMEM:

    dT_tile[c*Ch+ch, r] = sum_p B[c*Ch+ch, p] * A[p, r]
      A[p, r]        = wy0[p]*(r==y0[p]) + wy1[p]*(r==y1[p])
      B[c*Ch+ch, p]  = (wx0[p]*(c==x0[p]) + wx1[p]*(c==x1[p])) * g[p, ch]

Pixel chunks (spatially-blocked 1024-pixel patches, so uv footprints are
compact) are binned to texture tiles by uv bounding box — the same
bin-then-walk structure as the Pallas rasterizer (rasterize_pallas.py) —
and the kernel walks each tile's chunk list with a dynamic trip count.
Chunks beyond the per-tile cap are *counted and reported*, never silently
dropped: `scatter_taps` returns an overflow scalar the caller can check
(and fall back to the XLA scatter path on).

Tap semantics match `ops/interpolate.py::interpolate_bilinear` exactly
(clamped corners, edge weight-anchor fix-up, zero outside the valid
range), which is itself parity-tested against the reference misc.py:5-42.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(x: jax.Array, y: jax.Array, h: int, w: int):
    """Bilinear tap indices/weights, matching interpolate_bilinear."""
    valid = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)).astype(
        x.dtype
    )
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0w = (x0 - (x0 == x1)).astype(x.dtype)
    y0w = (y0 - (y0 == y1)).astype(x.dtype)
    wx0 = x1.astype(x.dtype) - x
    wx1 = x - x0w
    wy0 = (y1.astype(x.dtype) - y) * valid
    wy1 = (y - y0w) * valid
    return x0, x1, y0, y1, wx0, wx1, wy0, wy1


def _tap_overlap(x, y, h, w, tile_r, tile_c):
    """Exact (chunk, tile) overlap matrix from per-tap tile membership.

    A bbox test sprays boundary chunks across every tile between their
    real footprint and the corner texel that invalid/uncovered pixels
    clamp to (G-buffer uv is 0 outside coverage); testing the 4 actual
    tap texels per pixel bins each chunk into only the tiles it truly
    writes/reads.  Returns [n_chunks, T] bool.
    """
    n_chunks = x.shape[0]
    valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    n_tr = h // tile_r
    n_tc = w // tile_c
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    overlap = jnp.zeros((n_chunks, n_tr * n_tc), bool)
    for yy, xx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1)):
        t = (yy // tile_r) * n_tc + xx // tile_c  # [n_chunks, CP]
        onehot = (
            t[:, :, None] == jnp.arange(n_tr * n_tc)[None, None, :]
        ) & valid[:, :, None]
        overlap |= jnp.any(onehot, axis=1)
    return overlap


def _bin_chunks(
    x: jax.Array,
    y: jax.Array,
    h: int,
    w: int,
    tile_r: int,
    tile_c: int,
    max_chunks_per_tile: int,
):
    """Assign pixel chunks to texture tiles by exact tap membership.

    x, y: [n_chunks, CP] texel coordinates.
    Returns (ids [T, M] int32 chunk indices 0-padded, counts [T] int32,
    overflow int32 = number of (tile, chunk) pairs beyond the cap).
    """
    overlap = _tap_overlap(x, y, h, w, tile_r, tile_c)

    def per_tile(col):
        idx = jnp.nonzero(col, size=max_chunks_per_tile, fill_value=0)[0]
        return idx.astype(jnp.int32)

    ids = jax.vmap(per_tile, in_axes=1)(overlap)  # [T, M]
    true_counts = jnp.sum(overlap.astype(jnp.int32), axis=0)  # [T]
    counts = jnp.minimum(true_counts, max_chunks_per_tile)
    overflow = jnp.sum(true_counts - counts)
    return ids, counts, overflow


def _scatter_kernel(tile_r, tile_c, ch, chunk_px, h, w, acc_dtype,
                    sub_px=256):
    n_tc = w // tile_c
    sub_px = min(sub_px, chunk_px)

    def kernel(ids_ref, counts_ref, xy_ref, g_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        m = pl.program_id(1)
        n_m = pl.num_programs(1)

        @pl.when(m == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

        @pl.when(m < counts_ref[t])
        def _():
            row0 = (t // n_tc) * tile_r
            col0 = (t % n_tc) * tile_c
            # Walk the chunk in sub-slices so the one-hot operand
            # matrices stay small in VMEM (b_t is [TC*Ch, sub_px]).
            for s in range(chunk_px // sub_px):
                sl = slice(s * sub_px, (s + 1) * sub_px)
                xk = xy_ref[0, 0, sl]  # [sub_px]
                yk = xy_ref[0, 1, sl]
                x0, x1, y0, y1, wx0, wx1, wy0, wy1 = _taps(xk, yk, h, w)
                # A_T [sub_px, TR]: row one-hots weighted by wy
                r_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (sub_px, tile_r), 1
                ) + row0
                a_t = (
                    jnp.where(r_ids == y0[:, None], wy0[:, None], 0.0)
                    + jnp.where(r_ids == y1[:, None], wy1[:, None], 0.0)
                ).astype(jnp.bfloat16)
                # B_T [TC*Ch, sub_px]: col one-hots weighted by wx,
                # times grads.  Row j covers texel column j // Ch,
                # channel j % Ch; g arrives as [Ch, CP] and is repeated
                # so row j holds channel j % Ch.
                c_ids = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (tile_c * ch, sub_px), 0
                    )
                    // ch
                    + col0
                )
                colw = jnp.where(
                    c_ids == x0[None, :], wx0[None, :], 0.0
                ) + jnp.where(c_ids == x1[None, :], wx1[None, :], 0.0)
                g_rep = pltpu.repeat(g_ref[0, :, sl], tile_c, axis=0)
                b_t = (colw * g_rep.astype(colw.dtype)).astype(
                    jnp.bfloat16
                )
                acc_ref[:, :] += jax.lax.dot(
                    b_t, a_t, preferred_element_type=acc_dtype
                )

        @pl.when(m == n_m - 1)
        def _():
            out_ref[0] = acc_ref[:, :]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "h", "w", "tile_r", "tile_c", "max_chunks_per_tile", "interpret"
    ),
)
def scatter_taps(
    x: jax.Array,
    y: jax.Array,
    g: jax.Array,
    h: int,
    w: int,
    tile_r: int = 128,
    tile_c: int = 128,
    max_chunks_per_tile: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Bilinear scatter-add of per-pixel gradients into a [h, w, Ch] grid.

    Args:
      x, y: [n_chunks, CP] texel coordinates (CP pixels per chunk; chunk
        membership should be spatially coherent for binning to pay off).
      g: [n_chunks, CP, Ch] per-pixel gradient vectors.
      max_chunks_per_tile: static cap on the per-tile chunk list.  The
        default (None = n_chunks) can never overflow — essential because
        real G-buffers clamp every uncovered pixel's uv to one corner
        texel, concentrating half the chunks on one tile; a small cap
        silently demoted every level to the slow XLA scatter fallback.
        Grid cells beyond a tile's true count are skipped via the
        dynamic count, so the large cap costs only block prefetches.

    Returns:
      (dT [h, w, Ch] float32, overflow int32).  `overflow` counts
      (tile, chunk) pairs beyond `max_chunks_per_tile`; when nonzero the
      result is missing those chunks' contributions — callers must check
      (see `mipmap_sample`'s XLA fallback).
    """
    n_chunks, chunk_px = x.shape
    ch = g.shape[-1]
    tile_r = min(tile_r, h)
    tile_c = min(tile_c, w)
    if h % tile_r or w % tile_c:
        raise ValueError(f"texture {h}x{w} not divisible by tile")
    n_tiles = (h // tile_r) * (w // tile_c)
    m_cap = min(max_chunks_per_tile or n_chunks, n_chunks)

    ids, counts, overflow = _bin_chunks(
        x, y, h, w, tile_r, tile_c, m_cap
    )
    xy = jnp.stack([x, y], axis=1)  # [n_chunks, 2, CP]
    g_t = jnp.transpose(g, (0, 2, 1))  # [n_chunks, Ch, CP]

    kernel = _scatter_kernel(
        tile_r, tile_c, ch, chunk_px, h, w, jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, counts
        grid=(n_tiles, m_cap),
        in_specs=[
            pl.BlockSpec(
                (1, 2, chunk_px),
                # clamp padding cells to the last real chunk — equal
                # consecutive block indices skip the HBM copy
                lambda t, m, ids, counts: (
                    ids[t, jnp.minimum(m, jnp.maximum(counts[t] - 1, 0))],
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ch, chunk_px),
                lambda t, m, ids, counts: (
                    ids[t, jnp.minimum(m, jnp.maximum(counts[t] - 1, 0))],
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_c * ch, tile_r),
            lambda t, m, ids, counts: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((tile_c * ch, tile_r), jnp.float32)],
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, tile_c * ch, tile_r), jnp.float32
        ),
        interpret=interpret,
    )(ids, counts, xy, g_t)

    # [T, TC*Ch, TR] -> [h, w, Ch]
    n_tr = h // tile_r
    n_tc = w // tile_c
    dt = out_t.reshape(n_tr, n_tc, tile_c, ch, tile_r)
    dt = jnp.transpose(dt, (0, 4, 1, 2, 3)).reshape(h, w, ch)
    return dt, overflow


def _gather_kernel(tile_r, tile_c, ch, chunk_px, h, w, sub_px=256):
    n_tc = w // tile_c
    sub_px = min(sub_px, chunk_px)

    def kernel(tids_ref, counts_ref, xy_ref, tex_ref, out_ref, acc_ref):
        cnk = pl.program_id(0)
        k = pl.program_id(1)
        n_k = pl.num_programs(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

        @pl.when(k < counts_ref[cnk])
        def _():
            t = tids_ref[cnk, k]
            row0 = (t // n_tc) * tile_r
            col0 = (t % n_tc) * tile_c
            for s in range(chunk_px // sub_px):
                sl = slice(s * sub_px, (s + 1) * sub_px)
                xk = xy_ref[0, 0, sl]  # [sub_px]
                yk = xy_ref[0, 1, sl]
                x0, x1, y0, y1, wx0, wx1, wy0, wy1 = _taps(xk, yk, h, w)
                # A [TR, sub_px]: row one-hots weighted by wy — taps whose
                # row falls outside this tile simply never match the iota
                r_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_r, sub_px), 0
                ) + row0
                a = (
                    jnp.where(r_ids == y0[None, :], wy0[None, :], 0.0)
                    + jnp.where(r_ids == y1[None, :], wy1[None, :], 0.0)
                ).astype(jnp.bfloat16)
                # tmp[c*Ch+ch, p] = sum_r T_tile[c*Ch+ch, r] A[r, p]
                tmp = jax.lax.dot(
                    tex_ref[0], a, preferred_element_type=jnp.float32
                )  # [TC*Ch, sub_px]
                c_ids = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (tile_c * ch, sub_px), 0
                    )
                    // ch
                    + col0
                )
                colw = jnp.where(
                    c_ids == x0[None, :], wx0[None, :], 0.0
                ) + jnp.where(c_ids == x1[None, :], wx1[None, :], 0.0)
                prod = (tmp * colw).reshape(tile_c, ch, sub_px)
                acc_ref[:, sl] += jnp.sum(prod, axis=0)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[0] = acc_ref[:, :]

    return kernel


def _bin_tiles_per_chunk(
    x: jax.Array,
    y: jax.Array,
    h: int,
    w: int,
    tile_r: int,
    tile_c: int,
    max_tiles_per_chunk: int,
):
    """Inverse binning of `_bin_chunks`: per pixel chunk, the list of
    texture tiles its valid-tap bbox overlaps.

    Returns (tile_ids [n_chunks, K] int32 0-padded, counts [n_chunks],
    overflow int32).
    """
    overlap = _tap_overlap(x, y, h, w, tile_r, tile_c)

    def per_chunk(row):
        return jnp.nonzero(row, size=max_tiles_per_chunk, fill_value=0)[
            0
        ].astype(jnp.int32)

    tids = jax.vmap(per_chunk)(overlap)  # [n_chunks, K]
    true_counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
    counts = jnp.minimum(true_counts, max_tiles_per_chunk)
    overflow = jnp.sum(true_counts - counts)
    return tids, counts, overflow


@partial(
    jax.jit,
    static_argnames=(
        "tile_r", "tile_c", "max_tiles_per_chunk", "interpret"
    ),
)
def gather_taps(
    x: jax.Array,
    y: jax.Array,
    tex: jax.Array,
    tile_r: int = 128,
    tile_c: int = 128,
    max_tiles_per_chunk: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Bilinear gather from a [h, w, Ch] grid — the forward mirror of
    `scatter_taps`, replacing TPU element gathers (which crawl at a few
    GB/s on scattered index patterns) with per-tile MXU matmuls.

    out[p, ch] = sum_{r, c} wy[p, r] wx[p, c] tex[r, c, ch], identical tap
    semantics to `interpolate_bilinear`.

    Args:
      x, y: [n_chunks, CP] texel coordinates (spatially-blocked chunks).
      tex: [h, w, Ch].

    Returns (out [n_chunks, Ch, CP] float32, overflow int32 — chunks
    whose tile list exceeded `max_tiles_per_chunk`; when nonzero the
    caller must fall back to the XLA gather).
    """
    n_chunks, chunk_px = x.shape
    h, w, ch = tex.shape
    tile_r = min(tile_r, h)
    tile_c = min(tile_c, w)
    if h % tile_r or w % tile_c:
        raise ValueError(f"texture {h}x{w} not divisible by tile")
    n_tr, n_tc = h // tile_r, w // tile_c
    k_cap = min(max_tiles_per_chunk, n_tr * n_tc)

    tids, counts, overflow = _bin_tiles_per_chunk(
        x, y, h, w, tile_r, tile_c, k_cap
    )
    xy = jnp.stack([x, y], axis=1)  # [n_chunks, 2, CP]
    # tile layout [T, TC*Ch, TR] — the transpose of the texel grid that
    # makes the row contraction a plain matmul (same layout the scatter
    # kernel accumulates into)
    t_tiles = (
        tex.reshape(n_tr, tile_r, n_tc, tile_c, ch)
        .transpose(0, 2, 3, 4, 1)
        .reshape(n_tr * n_tc, tile_c * ch, tile_r)
        .astype(jnp.bfloat16)
    )

    kernel = _gather_kernel(tile_r, tile_c, ch, chunk_px, h, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tids, counts
        grid=(n_chunks, k_cap),
        in_specs=[
            pl.BlockSpec(
                (1, 2, chunk_px),
                lambda c, k, tids, counts: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_c * ch, tile_r),
                # clamp padding cells (k >= count) to the chunk's last
                # real tile: Pallas skips the HBM copy when consecutive
                # block indices are equal, so skipped cells cost nothing
                # instead of prefetching a fresh ~786 KB tile each
                lambda c, k, tids, counts: (
                    tids[c, jnp.minimum(k, jnp.maximum(counts[c] - 1, 0))],
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ch, chunk_px),
            lambda c, k, tids, counts: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((ch, chunk_px), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, ch, chunk_px), jnp.float32
        ),
        interpret=interpret,
    )(tids, counts, xy, t_tiles)
    return out, overflow


def _xla_gather_taps(x, y, tex):
    """XLA fallback with identical semantics/shape to `gather_taps`."""
    from rnr_tpu.ops.interpolate import interpolate_bilinear

    out = interpolate_bilinear(tex, x, y)  # [n_chunks, CP, Ch]
    return jnp.transpose(out, (0, 2, 1)).astype(jnp.float32)


def _chunk_coords(x: jax.Array, y: jax.Array, block: int = 32):
    """Rearrange [N, H, W] pixel grids into spatially-blocked chunks.

    Returns [n_chunks, block*block] arrays; H and W must be multiples of
    `block` (all pipeline image sizes are powers of two >= 32).
    """
    n, h, w = x.shape
    if h % block or w % block:
        raise ValueError(f"image {h}x{w} not divisible by block {block}")

    def blockify(a):
        a = a.reshape(n, h // block, block, w // block, block)
        a = jnp.transpose(a, (0, 1, 3, 2, 4))
        return a.reshape(-1, block * block)

    return blockify(x), blockify(y)


def _chunk_values(v: jax.Array, block: int = 32):
    """[N, H, W, C] -> [n_chunks, block*block, C] with the same ordering."""
    n, h, w, c = v.shape
    v = v.reshape(n, h // block, block, w // block, block, c)
    v = jnp.transpose(v, (0, 1, 3, 2, 4, 5))
    return v.reshape(-1, block * block, c)


def _unchunk_values(v: jax.Array, n: int, h: int, w: int, block: int = 32):
    """Inverse of `_chunk_values`."""
    c = v.shape[-1]
    v = v.reshape(n, h // block, w // block, block, block, c)
    v = jnp.transpose(v, (0, 1, 3, 2, 4, 5))
    return v.reshape(n, h, w, c)


def _xla_scatter_taps(x, y, g, h, w):
    """Plain XLA scatter-add fallback (identical tap semantics)."""
    x0, x1, y0, y1, wx0, wx1, wy0, wy1 = _taps(
        x.reshape(-1), y.reshape(-1), h, w
    )
    gf = g.reshape(-1, g.shape[-1])
    dt = jnp.zeros((h * w, g.shape[-1]), jnp.float32)
    for yy, xx, wy, wx in (
        (y0, x0, wy0, wx0),
        (y0, x1, wy0, wx1),
        (y1, x0, wy1, wx0),
        (y1, x1, wy1, wx1),
    ):
        dt = dt.at[yy * w + xx].add((wy * wx)[:, None] * gf)
    return dt.reshape(h, w, -1)


def _level_coords(uv_map: jax.Array, size: int):
    """uv in [0,1] -> texel coordinates at a mipmap level (v flipped),
    matching models/texture.py (reference: network.py:78-79)."""
    x = uv_map[..., 0] * (size - 1)
    y = (size - 1) - uv_map[..., 1] * (size - 1)
    return x, y


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def mipmap_sample(textures, uv_map, interpret=False):
    """Sum of bilinear samples of every mipmap level at uv.

    Forward semantics match `models/texture.py::TextureMapper`'s level
    loop, computed by the Pallas `gather_taps` matmul-gather (TPU element
    gathers run at single-digit GB/s on scattered uv patterns; the
    per-tile MXU formulation is pattern-robust), falling back to the XLA
    gather for any level whose tile binning overflowed.  The backward
    texture gradient runs through the Pallas scatter kernel
    (`scatter_taps`) with the same fallback.  uv_map receives zero
    gradient — the G-buffer uv is data in every training path
    (SURVEY §3.2: gradients flow to textures, never to uv).

    Args:
      textures: tuple of [S_l, S_l, Ch] level arrays (level 0 largest).
      uv_map: [N, H, W, 2] in [0, 1].

    Returns: [N, H, W, Ch].
    """
    n, hh, ww = uv_map.shape[:3]
    out = None
    for tex in textures:
        xl, yl = _level_coords(uv_map, tex.shape[0])
        xc, yc = _chunk_coords(xl, yl, block=32)
        g_out, ovf = gather_taps(xc, yc, tex, interpret=interpret)
        s_c = jax.lax.cond(
            ovf > 0,
            lambda: _xla_gather_taps(xc, yc, tex),
            lambda: g_out,
        )
        s = _unchunk_values(
            jnp.transpose(s_c, (0, 2, 1)), n, hh, ww
        ).astype(tex.dtype)
        out = s if out is None else out + s
    return out


def _mipmap_sample_fwd(textures, uv_map, interpret=False):
    # `textures` as residuals costs no memory — they are live parameters;
    # bwd only reads their static shape/dtype.
    return mipmap_sample(textures, uv_map, interpret), (textures, uv_map)


def _mipmap_sample_bwd(interpret, res, g):
    textures, uv_map = res
    gc = _chunk_values(g, block=32)
    grads = []
    for tex in textures:
        s, dtype = tex.shape[0], tex.dtype
        xl, yl = _level_coords(uv_map, s)
        xc, yc = _chunk_coords(xl, yl, block=32)
        dt, overflow = scatter_taps(
            xc, yc, gc, s, s, interpret=interpret
        )
        dt_fallback = jax.lax.cond(
            overflow > 0,
            lambda: _xla_scatter_taps(xc, yc, gc, s, s),
            lambda: dt,
        )
        grads.append(dt_fallback.astype(dtype))
    return tuple(grads), jnp.zeros_like(uv_map)


mipmap_sample.defvjp(_mipmap_sample_fwd, _mipmap_sample_bwd)

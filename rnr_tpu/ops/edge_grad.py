"""Screen-space coverage (silhouette/edge) gradients for rasterization.

The reference implements these in `backward_pixel_map_cuda`
(rasterize_cuda_kernel.cu:244-503): for every face it walks the pixels
crossed by each of its three edges and accumulates
(neighbor_pixel - edge_pixel) * grad_out / distance into the edge
vertices' screen x/y — a finite-difference approximation of how coverage
changes when an edge sweeps across pixel centers.  That edge-walk is a
data-dependent scatter loop, hostile to SPMD hardware.

The TPU-native reformulation inverts the direction of the computation:
instead of faces scattering to pixels, every *boundary pixel* gathers its
own contribution and a `segment_sum` over vertex ids accumulates
gradients — static shapes, no atomics:

  * A pixel p contributes where its alpha/rgb differs from a 4-neighbor q.
  * The edge that separates p from q belongs to the covering face (of p or
    q, whichever is covered); its crossing edge is identified as the one
    whose clamped barycentric is smallest at the uncovered side.
  * d(pixel value)/d(edge shift along the p->q axis) ~
    (value_q - value_p) / dist, with dist >= 1 px (the CUDA kernel's
    eps-regularized divisor) and the shift distributed to the edge's two
    vertices by their barycentric split at the crossing point.

Gradients match the reference's in direction and 1/dist magnitude law;
they are validated against finite differences of the rendered coverage in
tests (bit-parity with the CUDA walk is neither required nor meaningful
for an approximation of a discontinuous function).

`rasterize_opt` packages this with the analytic interior gradients
(pixel_attrs) into a custom-VJP rasterization usable for silhouette- or
photometric-based mesh optimization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rnr_tpu.ops.rasterize import (
    RasterOutput,
    rasterize_face_index,
)


def _rasterize_winner(
    faces: jax.Array,
    image_size: int,
    near: float,
    far: float,
    backend: str = "auto",
) -> RasterOutput:
    """Winner-map rasterization for the differentiable paths.

    The reference differentiates through its *fast* CUDA kernel on every
    rasterize call (neural_renderer/rasterize.py:103-158); the TPU analog
    is the tile-binned Pallas kernel (rasterize_pallas), which produces
    winner maps parity-identical to the XLA scan oracle.  Backend
    selection mirrors gbuffer.render_gbuffer: "auto" picks Pallas on
    TPU-class backends and the oracle on CPU; "pallas_interpret" runs the
    Pallas kernel in interpreter mode (CPU-testable).

    Overflow honesty: if the static per-tile candidate cap dropped faces,
    the winner maps are recomputed by the exact scan oracle inside a
    lax.cond — runtime cost only when taken (same pattern as the texture
    kernels' XLA fallback, ops/texture_pallas.py::mipmap_sample).
    """
    from rnr_tpu.ops.backend import use_pallas as _up

    use_pallas = _up(backend)
    tile_h, tile_w = min(32, image_size), min(128, image_size)
    if image_size % tile_h or image_size % tile_w:
        use_pallas = False  # non-tileable size: oracle handles any S
    if not use_pallas:
        return rasterize_face_index(faces, image_size, near=near, far=far)
    from rnr_tpu.ops.rasterize_pallas import rasterize_pallas

    out = rasterize_pallas(
        faces, image_size, near=near, far=far,
        tile_h=tile_h, tile_w=tile_w,
        interpret=backend == "pallas_interpret",
    )

    def oracle():
        o = rasterize_face_index(faces, image_size, near=near, far=far)
        return o.face_index_map, o.weight_map, o.depth_map, o.alpha_map

    fim, w, d, a = jax.lax.cond(
        jnp.sum(out.overflow) > 0,
        oracle,
        lambda: (out.face_index_map, out.weight_map, out.depth_map,
                 out.alpha_map),
    )
    return RasterOutput(fim, w, d, a, overflow=out.overflow)


def _neighbor_shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift [N, S, S, ...] image by (dy, dx), filling exposed pixels."""
    out = jnp.roll(x, shift=(-dy, -dx), axis=(1, 2))
    s = x.shape[1]
    if dy == 1:
        out = out.at[:, s - 1].set(fill)
    elif dy == -1:
        out = out.at[:, 0].set(fill)
    if dx == 1:
        out = out.at[:, :, s - 1].set(fill)
    elif dx == -1:
        out = out.at[:, :, 0].set(fill)
    return out


def edge_gradients(
    faces: jax.Array,
    face_index_map: jax.Array,
    weight_map: jax.Array,
    alpha_map: jax.Array,
    grad_alpha: jax.Array | None = None,
    rgb_map: jax.Array | None = None,
    grad_rgb: jax.Array | None = None,
    eps: float = 1e-3,
) -> jax.Array:
    """Accumulate coverage gradients into projected face vertices.

    Args:
      faces: [N, F, 3, 3] NDC faces (xy used).
      face_index_map / weight_map / alpha_map: raster outputs (image
        orientation, [N,S,S] / [N,S,S,3] / [N,S,S]).
      grad_alpha: [N, S, S] upstream gradient on the alpha map (or None).
      rgb_map / grad_rgb: [N, S, S, C] rendered colors + upstream grads
        (or None) — the photometric edge term.

    Returns grad_faces [N, F, 3, 3] (z column zero).
    """
    n, f = faces.shape[0], faces.shape[1]
    s = face_index_map.shape[1]
    dtype = faces.dtype

    covered = face_index_map >= 0
    safe_idx = jnp.clip(face_index_map, 0, f - 1)

    # value maps for the photometric term default to alpha-only
    def value_diff(dy, dx):
        """(value_q - value_p) . grad_p summed over channels, per pixel."""
        total = jnp.zeros((n, s, s), dtype)
        if grad_alpha is not None:
            a_q = _neighbor_shift(alpha_map, dy, dx, 0.0)
            total = total + (a_q - alpha_map) * grad_alpha
        if grad_rgb is not None and rgb_map is not None:
            r_q = _neighbor_shift(rgb_map, dy, dx, 0.0)
            total = total + jnp.sum((r_q - rgb_map) * grad_rgb, axis=-1)
        return total

    # Pixel-center integer coordinates in raster orientation (the maps are
    # image-oriented: raster yi = S-1-row).
    xi = jnp.broadcast_to(
        jnp.arange(s, dtype=dtype)[None, None, :], (n, s, s)
    )
    yi = jnp.broadcast_to(
        ((s - 1) - jnp.arange(s, dtype=dtype))[None, :, None], (n, s, s)
    )

    # the covering face on the p side owns the edge in every direction
    fidx = safe_idx
    w_p = weight_map                                     # [N, S, S, 3]

    # Barycentric weights are affine in screen space, so their
    # directional rate dw/d(step toward q) is a finite difference
    # between SAME-FACE neighbor pixels — read from the maps we already
    # have instead of gathering face_inv per pixel (a [S^2]<-[F,9]
    # random gather measured at 56 ms of the r3 89 ms backward,
    # prim_probe_r4).  When the forward neighbor belongs to another
    # face (exactly the boundary pixels), the backward neighbor of the
    # same face gives the identical rate; only 1-px-thin coverage has
    # neither, and its rate 0 drops that corner's contribution (the
    # CUDA walk's eps-regularized divisor makes those terms ~0 too).
    shifts = {}
    for (sy, sx) in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        shifts[(sy, sx)] = (
            # raw map: uncovered neighbors must read -1, never face 0
            _neighbor_shift(face_index_map, sy, sx, -1),
            _neighbor_shift(w_p, sy, sx, 0.0),
        )

    # For each neighbor direction, boundary pixels contribute.  Every one
    # of a pixel's 8 contributions (4 directions x 2 edge corners)
    # targets its OWN covering face, so they are pre-accumulated into a
    # per-pixel [6] slot vector (corner x axis) with elementwise selects,
    # and ONE segment_sum of S^2 six-wide rows keyed by face_index does
    # the scatter — 8x fewer scatter updates than the per-contribution
    # formulation (the 2M-element segment_sum was 21.5 ms of the 44 ms
    # backward, tools/out/prim_probe_r4.json seg_2M_72k).
    slot_acc = jnp.zeros((n, s, s, 6), dtype)
    for (dy, dx) in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        vdiff = value_diff(dy, dx)                      # [N, S, S]
        boundary = covered & (vdiff != 0.0)

        # direction of travel in raster coords: +x is +xi; +y neighbor in
        # image rows means -yi in raster orientation.
        ax = 0 if dx != 0 else 1
        step = dx if dx != 0 else -dy

        # crossing edge = barycentric that hits zero first when moving
        # toward q: rate of each w along the step direction, via
        # same-face finite differences (fwd: w(p+q_dir) - w(p); bwd:
        # w(p) - w(p-q_dir))
        fim_f, w_f = shifts[(dy, dx)]
        fim_b, w_b = shifts[(-dy, -dx)]
        same_f = (fim_f == face_index_map)[..., None]
        same_b = (fim_b == face_index_map)[..., None]
        rate = jnp.where(
            same_f, w_f - w_p, jnp.where(same_b, w_p - w_b, 0.0)
        )                                                # [N, S, S, 3]
        # distance (in pixels) until w_k reaches 0 moving toward q
        dist_k = jnp.where(
            rate < -eps, w_p / jnp.maximum(-rate, eps), jnp.inf
        )
        k_min = jnp.argmin(dist_k, axis=-1)              # [N, S, S]
        dist = jnp.min(dist_k, axis=-1)
        dist = jnp.clip(dist, 1.0, None)                 # CUDA's >=1px guard

        # 1-px-thin coverage along this axis (neither neighbor shares the
        # face): the FD rate is unreadable, but the edge is by definition
        # within one pixel, so the CUDA walk's eps-regularized divisor
        # saturates at its >=1px floor — use dist=1 and attribute the
        # crossing to the smallest barycentric (its opposite edge is the
        # nearest).  Without this, slivers contribute zero (ADVICE r4).
        sliver = ~(same_f[..., 0] | same_b[..., 0])      # [N, S, S]
        k_min = jnp.where(sliver, jnp.argmin(w_p, axis=-1), k_min)
        dist = jnp.where(sliver, 1.0, dist)

        # gradient magnitude on the edge position (toward q is +):
        # moving the edge one pixel toward q changes pixel p's value by
        # (v_q - v_p) when dist<=1; scale by 1/dist otherwise.
        g_edge = jnp.where(boundary, -vdiff / dist, 0.0)  # [N, S, S]

        # distribute to the two edge vertices (the corners != k_min) by
        # their barycentric split at the pixel; 3-way selects instead of
        # a per-pixel take_along_axis (TPU gathers are element-rate-
        # bound even along the last axis)
        k1 = (k_min + 1) % 3
        k2 = (k_min + 2) % 3

        def pick(idx):
            return jnp.where(
                idx == 0, w_p[..., 0],
                jnp.where(idx == 1, w_p[..., 1], w_p[..., 2]))

        w1, w2 = pick(k1), pick(k2)
        w_sum = jnp.maximum(w1 + w2, eps)
        # screen-space axis: gradient applies to vertex coordinate `ax`
        # with sign `step` (toward q positive)
        g_step = g_edge * step / w_sum
        c1 = g_step * w1                                 # corner k1
        c2 = g_step * w2                                 # corner k2

        # accumulate into the per-pixel (corner, axis) slots: corner j
        # gets c1 when j == k1 and c2 when j == k2
        for j in range(3):
            cj = (jnp.where(k_min == (j + 2) % 3, c1, 0.0)
                  + jnp.where(k_min == (j + 1) % 3, c2, 0.0))
            slot_acc = slot_acc.at[..., j * 2 + ax].add(cj)

    grad_faces = jax.vmap(
        lambda ids, vals: jax.ops.segment_sum(vals, ids, num_segments=f)
    )(fidx.reshape(n, -1), slot_acc.reshape(n, -1, 6)).reshape(n, f, 3, 2)

    # pixel-coord gradients -> NDC gradients: p = (x_ndc * S + S - 1) / 2
    grad_ndc = grad_faces * (s / 2.0)
    return jnp.concatenate(
        [grad_ndc, jnp.zeros((n, f, 3, 1), dtype)], axis=-1
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def silhouette(faces, image_size: int, near: float = 0.0, far: float = 1e5,
               backend: str = "auto"):
    """Differentiable silhouette: alpha map with coverage gradients.

    Forward identical to `rasterize_face_index(...).alpha_map`, computed
    by the Pallas tile-binned kernel on TPU (`_rasterize_winner`);
    backward routes the upstream alpha gradient through `edge_gradients`.
    """
    return _rasterize_winner(faces, image_size, near, far, backend).alpha_map


def _sil_fwd(faces, image_size, near, far, backend):
    out = _rasterize_winner(faces, image_size, near, far, backend)
    return out.alpha_map, (faces, out)


def _sil_bwd(image_size, near, far, backend, res, g):
    faces, out = res
    grad = edge_gradients(
        faces,
        out.face_index_map,
        out.weight_map,
        out.alpha_map,
        grad_alpha=g,
    )
    return (grad,)


silhouette.defvjp(_sil_fwd, _sil_bwd)


# ---------------------------------------------------------------------------
# rasterize_opt — textured rasterization with coverage gradients
# ---------------------------------------------------------------------------
#
# The reference dispatches `backward_pixel_map` for BOTH rgb and alpha on
# every rasterize call (neural_renderer/rasterize.py:103-158, kernel
# rasterize_cuda_kernel.cu:244-503), so photometric mesh optimization works
# out of the box.  `rasterize_opt` is that packaging for the TPU build:
# interior gradients (textures, weights, depth) via autodiff of the
# analytic recompute, PLUS the screen-space coverage terms for alpha and
# rgb via `edge_gradients`, all under one custom VJP.


def _interior(faces, textures, fim, image_size, near, far, eps, bg):
    """Differentiable rgb/alpha/depth given a fixed winner map."""
    from rnr_tpu.ops.rasterize import pixel_attrs
    from rnr_tpu.ops.render_api import sample_textures

    w, zp, covered, f_px = pixel_attrs(faces, fim, image_size,
                                       return_face_px=True)
    depth = jnp.where(covered, zp, far)
    alpha = covered.astype(faces.dtype)
    rgb = sample_textures(faces, textures, fim, w, zp, eps,
                          faces_px=f_px)
    bgc = jnp.asarray(bg, rgb.dtype)
    mask = covered[..., None].astype(rgb.dtype)
    rgb = rgb * mask + (1.0 - mask) * bgc
    return rgb, alpha, depth, w


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _raster_opt_core(faces, textures, image_size, near, far, eps, bg,
                     backend="auto"):
    out = _rasterize_winner(faces, image_size, near, far, backend)
    rgb, alpha, depth, _ = _interior(
        faces, textures, out.face_index_map, image_size, near, far, eps, bg
    )
    return rgb, alpha, depth


def _raster_opt_fwd(faces, textures, image_size, near, far, eps, bg, backend):
    out = _rasterize_winner(faces, image_size, near, far, backend)
    fim = out.face_index_map

    def interior_fn(f, t):
        rgb_i, alpha_i, depth_i, w_i = _interior(
            f, t, fim, image_size, near, far, eps, bg
        )
        return (rgb_i, alpha_i, depth_i), w_i

    # linearize the interior HERE: the backward then replays only the
    # transpose (coherent scatters) instead of re-running the interior
    # forward — whose per-pixel face/texture gathers run at ~40M
    # elements/s on TPU and dominated the backward (gather_probe_r4).
    # jax.vjp's closure is a tree-flattenable Partial, a valid residual.
    ((rgb, alpha, depth), w), vjp_fn = jax.vjp(
        interior_fn, faces, textures, has_aux=False
    )
    return (rgb, alpha, depth), (faces, fim, w, alpha, rgb, vjp_fn)


def _raster_opt_bwd(image_size, near, far, eps, bg, backend, res, g):
    faces, fim, w, alpha, rgb, vjp_fn = res
    g_rgb, g_alpha, g_depth = g

    df_int, dt = vjp_fn(((g_rgb, g_alpha, g_depth), jnp.zeros_like(w)))

    df_edge = edge_gradients(
        faces, fim, w, alpha,
        grad_alpha=g_alpha,
        rgb_map=rgb,
        grad_rgb=g_rgb,
    )
    return df_int + df_edge, dt


_raster_opt_core.defvjp(_raster_opt_fwd, _raster_opt_bwd)


def rasterize_opt(
    faces: jax.Array,
    textures: jax.Array,
    image_size: int = 256,
    anti_aliasing: bool = False,
    near: float = 0.1,
    far: float = 100.0,
    eps: float = 1e-4,
    background_color=(0.0, 0.0, 0.0),
    backend: str = "auto",
) -> dict[str, jax.Array]:
    """Textured rasterization whose gradients move mesh vertices.

    Drop-in for `render_api.rasterize_rgbad` when the caller optimizes
    geometry from a photometric (rgb) or coverage (alpha) loss: the
    backward pass adds the screen-space edge terms of
    `backward_pixel_map_cuda` (rasterize_cuda_kernel.cu:244-503) for both
    channels on top of the interior texture/depth gradients.  The forward
    winner maps come from the Pallas tile-binned kernel on TPU
    ("auto"; see `_rasterize_winner` for the overflow-honest fallback),
    matching the reference where every differentiable rasterize call runs
    the fast kernel (neural_renderer/rasterize.py:103-158).

    Args:
      faces: [N, F, 3, 3] projected faces (xy NDC, z depth) —
        differentiable, including through coverage changes.
      textures: [N, F, ts, ts, ts, C] per-face volumetric textures.

    Returns dict(rgb [N,C,S,S], alpha [N,S,S], depth [N,S,S]); with
    anti_aliasing the 2x-supersampled render is average-pooled, matching
    rasterize.py:296-318.
    """
    s_render = image_size * 2 if anti_aliasing else image_size
    rgb, alpha, depth = _raster_opt_core(
        faces, textures, s_render, near, far, eps,
        tuple(background_color), backend,
    )
    if anti_aliasing:
        def pool(x):
            return (
                x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
                + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
            ) * 0.25

        n, c = rgb.shape[0], rgb.shape[-1]
        rgb = jnp.moveaxis(
            pool(
                jnp.moveaxis(rgb, -1, 1).reshape(n * c, s_render, s_render)
            ).reshape(n, c, image_size, image_size),
            1, -1,
        )
        alpha = pool(alpha)
        depth = pool(depth)
    return {
        "rgb": jnp.moveaxis(rgb, -1, 1),
        "alpha": alpha,
        "depth": depth,
    }

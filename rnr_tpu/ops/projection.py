"""Camera projection and per-face attribute gathers.

Full OpenCV-style pinhole projection with radial/tangential distortion and
the crop-offset / resize-scale extension of the reference's fork
(reference: neural_renderer/projection.py:6-53).  Batched, jit-friendly,
differentiable w.r.t. vertices and camera parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection(
    vertices: jax.Array,
    K: jax.Array,
    R: jax.Array,
    t: jax.Array,
    dist_coeffs: jax.Array,
    orig_size: int,
    offset: jax.Array | None = None,
    scale: jax.Array | None = None,
    eps: float = 1e-9,
) -> jax.Array:
    """Project world-space vertices into screen NDC.

    Args:
      vertices: [N, V, 3] world positions.
      K: [N, 3, 3] intrinsics.
      R: [N, 3, 3], t: [N, 1, 3] extrinsics (camera-from-world).
      dist_coeffs: [N, 5] (k1, k2, p1, p2, k3).
      orig_size: image side length the intrinsics refer to.
      offset: [N, 2] (y, x) crop offsets or None.
      scale: [N, 2] (y, x) resize scales or None.

    Returns:
      [N, V, 3] = (u, v, z): u, v in [-1, 1] NDC with v pointing *up*
      (y-axis inverted relative to pixel rows), z the camera-space depth.
      Matches reference projection.py:20-53 term for term.
    """
    cam = jnp.einsum("nvj,nkj->nvk", vertices, R) + t
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    x_ = x / (z + eps)
    y_ = y / (z + eps)

    k1 = dist_coeffs[:, None, 0]
    k2 = dist_coeffs[:, None, 1]
    p1 = dist_coeffs[:, None, 2]
    p2 = dist_coeffs[:, None, 3]
    k3 = dist_coeffs[:, None, 4]

    r2 = x_ * x_ + y_ * y_
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x__ = x_ * radial + 2.0 * p1 * x_ * y_ + p2 * (r2 + 2.0 * x_ * x_)
    y__ = y_ * radial + p1 * (r2 + 2.0 * y_ * y_) + 2.0 * p2 * x_ * y_

    h = jnp.stack([x__, y__, jnp.ones_like(z)], axis=-1)
    pix = jnp.einsum("nvj,nkj->nvk", h, K)
    u, v = pix[..., 0], pix[..., 1]

    if offset is not None and scale is not None:
        # offset/scale carry (y, x) pairs (reference: projection.py:42-46).
        u = (u + offset[:, None, 1]) * scale[:, None, 1]
        v = (v + offset[:, None, 0]) * scale[:, None, 0]

    v = orig_size - v
    u = 2.0 * (u - orig_size / 2.0) / orig_size
    v = 2.0 * (v - orig_size / 2.0) / orig_size
    return jnp.stack([u, v, z], axis=-1)


def vertices_to_faces(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Gather per-vertex positions into per-face layout.

    vertices: [N, V, 3]; faces: [1 or N, F, 3] int -> [N, F, 3, 3].
    Reference: neural_renderer/vertices_to_faces.py:4-26.
    """
    if faces.shape[0] == 1 and vertices.shape[0] != 1:
        faces = jnp.broadcast_to(faces, (vertices.shape[0],) + faces.shape[1:])
    return jax.vmap(lambda v, f: v[f])(vertices, faces)


def vertex_attrs_to_faces(vertex_attrs: jax.Array, faces: jax.Array) -> jax.Array:
    """Gather per-vertex attributes into per-face layout.

    vertex_attrs: [N, V, A]; faces: [N, F, 3] int -> [N, F, 3, A].
    Reference: neural_renderer/vertex_attrs_to_faces.py:4-21.
    """
    return jax.vmap(lambda v, f: v[f])(vertex_attrs, faces)


def interp_vertex_attr(
    v_attr: jax.Array,
    faces_v_idx: jax.Array,
    face_index_map: jax.Array,
    weight_map: jax.Array,
) -> jax.Array:
    """Barycentric interpolation of vertex attributes over a raster.

    v_attr: [V, A] or [N, V, A]; faces_v_idx: [N, F, 3];
    face_index_map: [N, H, W]; weight_map: [N, H, W, 3, 1].
    Returns [N, H, W, A]  (reference: render.py:11-28, vectorized — no
    per-batch Python loop).
    """
    n = faces_v_idx.shape[0]
    if v_attr.ndim == 2:
        v_attr = jnp.broadcast_to(v_attr[None], (n,) + v_attr.shape)
    faces_attr = vertex_attrs_to_faces(v_attr, faces_v_idx)  # [N, F, 3, A]
    f = faces_attr.shape[1]
    idx = jnp.clip(face_index_map, 0, f - 1)
    px = jax.vmap(lambda fa, i: fa[i])(faces_attr, idx)  # [N, H, W, 3, A]
    return jnp.sum(px * weight_map, axis=-2)

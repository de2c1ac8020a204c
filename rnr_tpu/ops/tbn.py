"""Per-pixel tangent/bitangent/normal (TBN) frames.

Reference: render.py:124-168.  The reference loops over the batch in Python
to gather per-pixel tangents; here everything is a single vectorized gather
so the whole G-buffer assembly stays inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def face_tangents(faces_v: jax.Array, faces_texcoord: jax.Array) -> jax.Array:
    """Per-face tangent vector from UV deltas.

    faces_v: [F, 3, 3] world positions; faces_texcoord: [F, 3, 2] UVs.
    Returns [F, 3] unnormalized tangents (reference: render.py:138-144).
    """
    e1 = faces_v[:, 1] - faces_v[:, 0]
    e2 = faces_v[:, 2] - faces_v[:, 0]
    duv1 = faces_texcoord[:, 1] - faces_texcoord[:, 0]
    duv2 = faces_texcoord[:, 2] - faces_texcoord[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    f = 1.0 / jnp.maximum(det, 1e-8)
    return f[:, None] * (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2)


def get_tbn_map(
    normal_map: jax.Array,
    face_index_map: jax.Array,
    faces_v: jax.Array | None = None,
    faces_texcoord: jax.Array | None = None,
    tangent: jax.Array | None = None,
) -> jax.Array:
    """Per-pixel tangent-space-to-world matrix.

    Args:
      normal_map: [N, H, W, 3].
      face_index_map: [N, H, W] int32 (-1 for empty pixels; gathers clamp).
      faces_v / faces_texcoord: [F, 3, 3] / [F, 3, 2] (used when `tangent`
        is None).
      tangent: optional precomputed [F, 3] face tangents.

    Returns:
      [N, H, W, 3, 3] with columns (tangent, bitangent, normal), i.e.
      TBN @ v_tangent = v_world  (reference: render.py:124-168).
    """
    if tangent is None:
        if faces_v is None or faces_texcoord is None:
            raise ValueError("need faces_v/faces_texcoord when tangent is None")
        tangent = face_tangents(faces_v, faces_texcoord)
    tangent = _normalize(tangent)

    idx = jnp.clip(face_index_map, 0, tangent.shape[0] - 1)
    tangent_map = tangent[idx]  # [N, H, W, 3]

    normal_map = _normalize(normal_map)
    bitangent_map = _normalize(jnp.cross(normal_map, tangent_map))
    # Re-orthogonalize the tangent against the interpolated normal.
    tangent_map = _normalize(jnp.cross(bitangent_map, normal_map))
    return jnp.stack((tangent_map, bitangent_map, normal_map), axis=-1)


def get_tbn_map_perpixel(
    normal_map: jax.Array,
    position_map: jax.Array,
    uv_map: jax.Array,
    alpha_map: jax.Array,
) -> jax.Array:
    """Screen-space TBN from finite differences of position/uv maps.

    Per-pixel variant that needs no face data: tangents come from the
    image-space derivatives of world position vs uv (reference:
    render.py:171-219, unused by the shipped drivers but part of the API).

    Args: normal_map/position_map [N,H,W,3], uv_map [N,H,W,2],
    alpha_map [N,H,W,1].  Returns [N,H,W,3,3].
    """
    data = jnp.concatenate([position_map, uv_map], axis=-1)  # [N,H,W,5]

    def fwd_diff(x, axis):
        d = jnp.diff(x, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, 1)
        return jnp.pad(d, pad)

    def bwd_diff(x, axis):
        d = jnp.diff(x, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 0)
        return jnp.pad(d, pad)

    a = alpha_map
    a_x0 = (fwd_diff(a, 2) + a * 2 > 1.5) & (a > 0)  # next-pixel valid
    a_y0 = (fwd_diff(a, 1) + a * 2 > 1.5) & (a > 0)

    ex = jnp.where(a_x0, fwd_diff(data, 2), bwd_diff(data, 2))
    ey = jnp.where(a_y0, fwd_diff(data, 1), bwd_diff(data, 1))

    dpos1, duv1 = ex[..., :3], ex[..., 3:]
    dpos2, duv2 = ey[..., :3], ey[..., 3:]
    det = duv1[..., 0] * duv2[..., 1] - duv2[..., 0] * duv1[..., 1]
    f = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tangent = f[..., None] * (
        duv2[..., 1:2] * dpos1 - duv1[..., 1:2] * dpos2
    )
    tangent = _normalize(tangent)
    bitangent = f[..., None] * (
        -duv2[..., 0:1] * dpos1 + duv1[..., 0:1] * dpos2
    )
    bitangent = _normalize(bitangent)
    normal = _normalize(normal_map)
    return jnp.stack((tangent, bitangent, normal), axis=-1)

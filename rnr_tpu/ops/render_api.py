"""Full differentiable-renderer API surface (neural_renderer parity).

Everything the vendored `neural_renderer` package exposes, re-built on the
XLA/Pallas rasterization core: alternative camera modes (look / look_at /
perspective), per-face Lambert lighting, per-face volumetric texture
sampling with autodiff gradients (replacing forward_texture_sampling_cuda
+ backward_textures_cuda), fill_back, optional 2x supersampling
anti-aliasing, and a `Renderer` facade matching
neural_renderer/renderer.py's `render()` contract.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from rnr_tpu.ops.projection import projection, vertices_to_faces
from rnr_tpu.ops.rasterize import rasterize_face_index, RasterOutput


def _normalize(v, axis=-1, eps=1e-5):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


# ---------------------------------------------------------------------------
# Camera modes (look.py / look_at.py / perspective.py /
# get_points_from_angles.py)
# ---------------------------------------------------------------------------

def look(vertices, eye, direction=(0, 1, 0), up=(0, 1, 0)):
    """Camera at `eye` facing `direction` (reference look.py:6-57)."""
    eye = jnp.atleast_2d(jnp.asarray(eye, jnp.float32))
    direction = jnp.atleast_2d(jnp.asarray(direction, jnp.float32))
    up = jnp.atleast_2d(jnp.asarray(up, jnp.float32))
    z_axis = _normalize(direction)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    r = jnp.stack((x_axis, y_axis, z_axis), axis=1)  # [bs, 3, 3]
    return jnp.einsum("nvj,nkj->nvk", vertices - eye[:, None, :], r)


def look_at(vertices, eye, at=(0, 0, 0), up=(0, 1, 0)):
    """Camera at `eye` looking at `at` (reference look_at.py:6-63)."""
    eye = jnp.atleast_2d(jnp.asarray(eye, jnp.float32))
    at = jnp.atleast_2d(jnp.asarray(at, jnp.float32))
    up = jnp.atleast_2d(jnp.asarray(up, jnp.float32))
    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    r = jnp.stack((x_axis, y_axis, z_axis), axis=1)
    return jnp.einsum("nvj,nkj->nvk", vertices - eye[:, None, :], r)


def perspective(vertices, angle: float = 30.0):
    """Perspective divide by tan(fov) (reference perspective.py:6-22)."""
    width = math.tan(math.radians(angle))
    z = vertices[..., 2]
    x = vertices[..., 0] / z / width
    y = vertices[..., 1] / z / width
    return jnp.stack((x, y, z), axis=-1)


def get_points_from_angles(distance, elevation, azimuth, degrees=True):
    """Spherical camera position (reference get_points_from_angles.py)."""
    if degrees:
        elevation = jnp.radians(jnp.asarray(elevation, jnp.float32))
        azimuth = jnp.radians(jnp.asarray(azimuth, jnp.float32))
    return jnp.stack(
        [
            distance * jnp.cos(elevation) * jnp.sin(azimuth),
            distance * jnp.sin(elevation),
            -distance * jnp.cos(elevation) * jnp.cos(azimuth),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Per-face Lambert lighting (lighting.py:5-57)
# ---------------------------------------------------------------------------

def lighting(
    faces,
    textures,
    intensity_ambient: float = 0.5,
    intensity_directional: float = 0.5,
    color_ambient=(1, 1, 1),
    color_directional=(1, 1, 1),
    direction=(0, 1, 0),
):
    """Multiply ambient + directional Lambert light into face textures.

    faces: [N, F, 3, 3]; textures: [N, F, ts, ts, ts, 3].
    """
    bs, nf = faces.shape[:2]
    color_ambient = jnp.asarray(color_ambient, jnp.float32).reshape(1, 3)
    color_directional = jnp.asarray(color_directional, jnp.float32).reshape(1, 3)
    direction = jnp.asarray(direction, jnp.float32).reshape(1, 3)

    light = jnp.zeros((bs, nf, 3), jnp.float32)
    if intensity_ambient != 0:
        light = light + intensity_ambient * color_ambient[:, None, :]
    if intensity_directional != 0:
        v10 = faces[:, :, 0] - faces[:, :, 1]
        v12 = faces[:, :, 2] - faces[:, :, 1]
        normals = _normalize(jnp.cross(v10, v12))
        cos = jax.nn.relu(jnp.sum(normals * direction[:, None, :], axis=-1))
        light = light + intensity_directional * (
            color_directional[:, None, :] * cos[:, :, None]
        )
    return textures * light[:, :, None, None, None, :]


# ---------------------------------------------------------------------------
# Per-face volumetric texture sampling
# (forward_texture_sampling_cuda, rasterize_cuda_kernel.cu:171-242;
#  backward via autodiff, replacing backward_textures_cuda :505-540)
# ---------------------------------------------------------------------------

def sample_textures(
    faces: jax.Array,
    textures: jax.Array,
    face_index_map: jax.Array,
    weight_map: jax.Array,
    depth_map: jax.Array,
    eps: float = 1e-4,
    faces_px: jax.Array | None = None,
) -> jax.Array:
    """Trilinear sampling from per-face [ts,ts,ts,3] texture volumes.

    The texture coordinate along each simplex axis is the perspective-
    corrected barycentric weight w_k * (ts-1) * depth / z_k, blended over
    the 2^3 integer corners (CUDA parity).  Autodiff provides exactly the
    scatter-add texture gradient the reference hand-codes.

    Args:
      faces: [N, F, 3, 3] projected faces (z in col 2).
      textures: [N, F, ts, ts, ts, C].
      face_index_map: [N, S, S] winner map (image orientation).
      weight_map: [N, S, S, 3]; depth_map: [N, S, S].

    Returns rgb_map [N, S, S, C] (0 where empty).
    """
    n, f = faces.shape[0], faces.shape[1]
    ts = textures.shape[2]
    c = textures.shape[-1]
    s = face_index_map.shape[1]

    covered = face_index_map >= 0
    safe_idx = jnp.clip(face_index_map, 0, f - 1)

    if faces_px is not None:
        # pre-gathered per-pixel faces (pixel_attrs return_face_px=True):
        # saves a second per-pixel gather + its VJP scatter
        fz = faces_px[..., :, 2]
    else:
        fz = jnp.take_along_axis(
            faces[..., 2][:, :, None, :],  # [N, F, 1, 3]
            safe_idx.reshape(n, -1, 1, 1).astype(jnp.int32), axis=1,
        ).reshape(n, s, s, 3)

    ti = weight_map * (ts - 1) * (depth_map[..., None] / fz)
    ti = jnp.clip(ti, 0.0, ts - 1 - eps)  # [N, S, S, 3]

    t0 = jnp.floor(ti).astype(jnp.int32)
    frac = ti - t0

    if ts == 2:
        # ts=2 specialization: floor(ti in [0,1)) == 0, so the 8 corners
        # are the face's whole [2,2,2] volume at STATIC offsets — one
        # 8C-wide row gather per pixel instead of 8 index-dependent
        # gathers (and one scatter instead of 8 in the VJP; TPU
        # gathers/scatters are per-element-rate-bound, gather_probe_r4)
        tex_rows = textures.reshape(n, f, 8 * c)
        bundle = jnp.take_along_axis(
            tex_rows, safe_idx.reshape(n, -1, 1).astype(jnp.int32),
            axis=1,
        ).reshape(n, s, s, 8, c)
        w8 = []
        for corner in range(8):
            w = jnp.ones_like(frac[..., 0])
            for k in range(3):
                w = w * ((1.0 - frac[..., k])
                         if (corner >> k) % 2 == 0 else frac[..., k])
            # volume linearization: corner bit k indexes axis k with
            # stride ts^(2-k); for ts=2 that is exactly the bit value
            w8.append(w)
        # corner order of tex_rows' last dim: idx = b0*4 + b1*2 + b2,
        # where bk = bit k of the corner id
        order = [((cc >> 0) % 2) * 4 + ((cc >> 1) % 2) * 2 + (cc >> 2) % 2
                 for cc in range(8)]
        wstack = jnp.stack([w8[order.index(i)] for i in range(8)], -1)
        out = jnp.sum(wstack[..., None] * bundle, axis=-2)
        return jnp.where(covered[..., None], out, 0.0)

    tex_flat = textures.reshape(n, f * ts * ts * ts, c)
    out = jnp.zeros((n, s, s, c), textures.dtype)
    for corner in range(8):
        w = jnp.ones_like(frac[..., 0])
        idx3 = []
        for k in range(3):
            if (corner >> k) % 2 == 0:
                w = w * (1.0 - frac[..., k])
                idx3.append(t0[..., k])
            else:
                w = w * frac[..., k]
                idx3.append(t0[..., k] + 1)
        lin = (
            safe_idx * (ts * ts * ts)
            + idx3[0] * (ts * ts)
            + idx3[1] * ts
            + idx3[2]
        )
        vals = jnp.take_along_axis(
            tex_flat, lin.reshape(n, -1, 1).astype(jnp.int32), axis=1
        ).reshape(n, s, s, c)
        out = out + w[..., None] * vals
    return jnp.where(covered[..., None], out, 0.0)


def fill_back_faces(faces_idx: jax.Array) -> jax.Array:
    """Duplicate faces with reversed winding (renderer.py:209)."""
    return jnp.concatenate([faces_idx, faces_idx[:, :, ::-1]], axis=1)


# ---------------------------------------------------------------------------
# rasterize_rgbad — full raster with RGB/alpha/depth, AA option
# (neural_renderer/rasterize.py:255-340)
# ---------------------------------------------------------------------------

def rasterize_rgbad(
    faces: jax.Array,
    textures: jax.Array | None = None,
    image_size: int = 256,
    anti_aliasing: bool = True,
    near: float = 0.1,
    far: float = 100.0,
    eps: float = 1e-4,
    background_color=(0.0, 0.0, 0.0),
    face_chunk: int = 128,
) -> dict[str, Any]:
    """Rasterize faces (+ optional per-face textures) to rgb/alpha/depth.

    Returns dict(rgb [N,C,S,S] or None, alpha [N,S,S], depth [N,S,S],
    face_index_map [N,S,S], weight_map [N,S,S,3]) matching the reference
    wrapper including the 2x supersample + avg-pool AA path.
    """
    s_render = image_size * 2 if anti_aliasing else image_size
    out: RasterOutput = rasterize_face_index(
        faces, s_render, near=near, far=far, face_chunk=face_chunk
    )

    rgb = None
    if textures is not None:
        rgb = sample_textures(
            faces, textures, out.face_index_map, out.weight_map,
            out.depth_map, eps,
        )
        bg = jnp.asarray(background_color, rgb.dtype)
        mask = (out.face_index_map >= 0)[..., None].astype(rgb.dtype)
        rgb = rgb * mask + (1.0 - mask) * bg
        rgb = jnp.moveaxis(rgb, -1, 1)  # NCHW like the reference

    alpha = out.alpha_map
    depth = out.depth_map
    fim = out.face_index_map
    wmap = out.weight_map

    if anti_aliasing:
        def pool(x):
            return (
                x[:, 0::2, 0::2] + x[:, 0::2, 1::2]
                + x[:, 1::2, 0::2] + x[:, 1::2, 1::2]
            ) * 0.25

        if rgb is not None:
            n, c = rgb.shape[0], rgb.shape[1]
            rgb = pool(rgb.reshape(n * c, s_render, s_render)).reshape(
                n, c, image_size, image_size
            )
        alpha = pool(alpha)
        depth = pool(depth)
        # discrete maps keep the top-left supersample
        fim = fim[:, 0::2, 0::2]
        wmap = wmap[:, 0::2, 0::2]

    return {
        "rgb": rgb,
        "alpha": alpha,
        "depth": depth,
        "face_index_map": fim,
        "weight_map": wmap,
    }


def rasterize_silhouettes(faces, image_size=256, anti_aliasing=True,
                          near=0.1, far=100.0):
    """Alpha-only rasterization (rasterize.py:343+ equivalent)."""
    return rasterize_rgbad(
        faces, None, image_size, anti_aliasing, near, far
    )["alpha"]


def rasterize_depth(faces, image_size=256, anti_aliasing=True,
                    near=0.1, far=100.0):
    return rasterize_rgbad(
        faces, None, image_size, anti_aliasing, near, far
    )["depth"]


# ---------------------------------------------------------------------------
# Renderer facade (renderer.py:11-257)
# ---------------------------------------------------------------------------

class Renderer:
    """Drop-in counterpart of `nr.Renderer` (projection/look/look_at modes).

    `render()` returns the fork's extended 8-tuple
    (rgb, depth, alpha, face_index_map, weight_map, vertices, faces_v,
    faces) — renderer.py:257.
    """

    def __init__(
        self,
        image_size: int = 256,
        anti_aliasing: bool = True,
        background_color=(0, 0, 0),
        fill_back: bool = True,
        camera_mode: str = "projection",
        K=None, R=None, t=None, dist_coeffs=None, orig_size: int = 1024,
        perspective_flag: bool = True,
        viewing_angle: float = 30.0,
        camera_direction=(0, 0, 1),
        near: float = 0.1,
        far: float = 100.0,
        light_intensity_ambient: float = 0.5,
        light_intensity_directional: float = 0.5,
        light_color_ambient=(1, 1, 1),
        light_color_directional=(1, 1, 1),
        light_direction=(0, 1, 0),
    ):
        self.image_size = image_size
        self.anti_aliasing = anti_aliasing
        self.background_color = background_color
        self.fill_back = fill_back
        self.camera_mode = camera_mode
        self.K, self.R, self.t = K, R, t
        self.dist_coeffs = dist_coeffs
        self.orig_size = orig_size
        self.perspective = perspective_flag
        self.viewing_angle = viewing_angle
        self.camera_direction = camera_direction
        self.eye = None
        self.near = near
        self.far = far
        self.rasterizer_eps = 1e-3
        self.light_intensity_ambient = light_intensity_ambient
        self.light_intensity_directional = light_intensity_directional
        self.light_color_ambient = light_color_ambient
        self.light_color_directional = light_color_directional
        self.light_direction = light_direction

    def _transform(self, vertices, K, R, t, dist_coeffs, orig_size,
                   offset, scale):
        if self.camera_mode == "look_at":
            v = look_at(vertices, self.eye)
            return perspective(v, self.viewing_angle) if self.perspective else v
        if self.camera_mode == "look":
            v = look(vertices, self.eye, self.camera_direction)
            return perspective(v, self.viewing_angle) if self.perspective else v
        if self.camera_mode == "projection":
            K = K if K is not None else self.K
            R = R if R is not None else self.R
            t = t if t is not None else self.t
            dist_coeffs = (
                dist_coeffs if dist_coeffs is not None else self.dist_coeffs
            )
            if dist_coeffs is None:
                dist_coeffs = jnp.zeros((vertices.shape[0], 5))
            orig_size = orig_size if orig_size is not None else self.orig_size
            return projection(
                vertices, K, R, t, dist_coeffs, orig_size, offset, scale
            )
        raise ValueError(f"unknown camera mode {self.camera_mode}")

    def render(self, vertices, faces, textures, K=None, R=None, t=None,
               dist_coeffs=None, orig_size=None, offset=None, scale=None):
        if self.fill_back:
            faces = fill_back_faces(faces)
            if textures is not None:
                textures = jnp.concatenate(
                    [textures, jnp.transpose(textures, (0, 1, 4, 3, 2, 5))],
                    axis=1,
                )

        if textures is not None:
            faces_lighting = vertices_to_faces(vertices, faces)
            textures = lighting(
                faces_lighting,
                textures,
                self.light_intensity_ambient,
                self.light_intensity_directional,
                self.light_color_ambient,
                self.light_color_directional,
                self.light_direction,
            )

        vertices = self._transform(
            vertices, K, R, t, dist_coeffs, orig_size, offset, scale
        )
        faces_v = vertices_to_faces(vertices, faces)
        out = rasterize_rgbad(
            faces_v, textures, self.image_size, self.anti_aliasing,
            self.near, self.far, self.rasterizer_eps, self.background_color,
        )
        return (
            out["rgb"], out["depth"], out["alpha"], out["face_index_map"],
            out["weight_map"], vertices, faces_v, faces,
        )

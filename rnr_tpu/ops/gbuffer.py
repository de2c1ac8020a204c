"""Fused G-buffer rendering: rasterize + interpolate all per-pixel maps.

This collapses the reference's multi-stage, multi-device G-buffer pipeline
(network.py:156-216 `Rasterizer.forward` + render.py:124 `get_TBN_map` +
precompute.py:217-245 view/SH/reflect maps, which round-trip through host
NumPy and pyshtools) into ONE jit-compiled XLA program: a z-buffer
rasterization followed by per-pixel gathers and fused VPU arithmetic.
No host sync, no per-batch Python loops, SH evaluated in closed form.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.interpolate import interpolate_bilinear
from rnr_tpu.ops.projection import projection, vertices_to_faces
from rnr_tpu.ops.rasterize import rasterize_face_index, pixel_attrs
from rnr_tpu.ops.cameras import get_view_dir_map, get_reflect_dir
from rnr_tpu.ops.sh import evaluate_sh_basis
from rnr_tpu.ops.tbn import face_tangents, get_tbn_map


class MeshBuffers(NamedTuple):
    """Device-resident mesh arrays (replicated across the device mesh)."""

    vertices: jax.Array   # [V, 3]
    faces: jax.Array      # [F, 3] int32
    vt: jax.Array         # [Vt, 2]
    f_vt_idx: jax.Array   # [F, 3] int32
    vn: jax.Array         # [Vn, 3]
    f_vn_idx: jax.Array   # [F, 3] int32
    span_max: jax.Array   # [] mesh bounding-box max span


def make_mesh_buffers(mesh) -> MeshBuffers:
    """Upload a host `rnr_tpu.data.Mesh` to device buffers."""
    span = np.float32(mesh.span_max)
    return MeshBuffers(
        vertices=jnp.asarray(mesh.v),
        faces=jnp.asarray(mesh.f_v_idx, jnp.int32),
        vt=jnp.asarray(mesh.vt),
        f_vt_idx=jnp.asarray(mesh.f_vt_idx, jnp.int32),
        vn=jnp.asarray(mesh.vn),
        f_vn_idx=jnp.asarray(mesh.f_vn_idx, jnp.int32),
        span_max=jnp.asarray(span),
    )


def _gather_face_attr(per_face: jax.Array, face_index_map: jax.Array):
    """Gather [F, 3, A] per-face-corner attributes by [N, S, S] face ids."""
    idx = jnp.clip(face_index_map, 0, per_face.shape[0] - 1)
    return per_face[idx]  # [N, S, S, 3, A]


def _project_and_raster(
    mesh: MeshBuffers,
    proj: jax.Array,
    pose: jax.Array,
    dist_coeffs: jax.Array,
    offset: jax.Array | None,
    scale: jax.Array | None,
    image_size: int,
    near: float,
    far: float,
    face_chunk: int,
    backend: str,
):
    """Projection + z-buffer rasterization (the t_raster stage)."""
    R = pose[:, :3, :3]
    t = pose[:, :3, 3][:, None, :]
    s = image_size
    n = proj.shape[0]

    v_ndc = projection(
        mesh.vertices[None], proj, R, t, dist_coeffs, s, offset, scale
    )  # [N, V, 3]
    faces_ndc = vertices_to_faces(
        v_ndc, jnp.broadcast_to(mesh.faces[None], (n,) + mesh.faces.shape)
    )  # [N, F, 3, 3]

    # "pallas" = tile-binned production kernel (TPU); "xla" = scan oracle;
    # "auto" picks pallas on TPU-class backends.
    from rnr_tpu.ops.backend import pallas_interpret, use_pallas

    if use_pallas(backend):
        from rnr_tpu.ops.rasterize_pallas import rasterize_pallas

        raster = rasterize_pallas(
            faces_ndc, s, near=near, far=far,
            tile_h=min(32, s), tile_w=min(128, s),
            interpret=pallas_interpret(backend),
        )
    else:
        raster = rasterize_face_index(
            faces_ndc, s, near=near, far=far, face_chunk=face_chunk
        )
    return v_ndc, faces_ndc, raster


@partial(
    jax.jit,
    static_argnames=("image_size", "face_chunk", "backend"),
)
def render_raster(
    mesh: MeshBuffers,
    proj: jax.Array,
    pose: jax.Array,
    dist_coeffs: jax.Array,
    offset: jax.Array | None,
    scale: jax.Array | None,
    image_size: int,
    near: float = 0.0,
    far: float = 1e5,
    face_chunk: int = 128,
    backend: str = "auto",
):
    """Raster stage alone (for the reference's t_raster timing bucket,
    test_rnr.py:280-374): projection + winner-map z-buffer, no maps."""
    _, _, raster = _project_and_raster(
        mesh, proj, pose, dist_coeffs, offset, scale, image_size,
        near, far, face_chunk, backend,
    )
    return raster


@partial(
    jax.jit,
    static_argnames=(
        "image_size", "face_chunk", "with_high_maps", "with_sh", "sh_lmax",
        "backend",
    ),
)
def render_gbuffer(
    mesh: MeshBuffers,
    proj: jax.Array,
    pose: jax.Array,
    dist_coeffs: jax.Array,
    offset: jax.Array | None,
    scale: jax.Array | None,
    image_size: int,
    near: float = 0.0,
    far: float = 1e5,
    face_chunk: int = 128,
    with_high_maps: bool = True,
    with_sh: bool = True,
    sh_lmax: int = 2,
    backend: str = "auto",
) -> dict[str, Any]:
    """Render the full per-view G-buffer in one XLA program.

    Args:
      mesh: MeshBuffers.
      proj: [N, 3, 3] intrinsics.
      pose: [N, 4, 4] extrinsics (camera-from-world, already global_RT'd).
      dist_coeffs: [N, 5].
      offset, scale: [N, 2] crop/resize adjustments or None.
      image_size: output side length S.
      with_high_maps: also emit TBN / view-dir / tangent view-dir /
        SH-basis / reflect-dir maps (the "high mesh" products of
        precompute.py:167-253).

    Returns a dict of maps in image orientation (row 0 = top):
      uv_map [N,S,S,2], alpha_map [N,S,S], face_index_map [N,S,S],
      weight_map [N,S,S,3,1] (perspective-corrected),
      normal_map / normal_map_cam / position_map / position_map_cam
      [N,S,S,3], depth_map [N,S,S], v_uvz [N,V,3], v_front_mask [N,V],
      and with_high_maps: TBN_map [N,S,S,3,3], view_dir_map[_cam],
      view_dir_map_tangent, sh_basis_map [N,S,S,(lmax+1)^2],
      reflect_dir_map.
    """
    R = pose[:, :3, :3]
    t = pose[:, :3, 3][:, None, :]
    s = image_size

    v_ndc, faces_ndc, raster = _project_and_raster(
        mesh, proj, pose, dist_coeffs, offset, scale, s,
        near, far, face_chunk, backend,
    )
    fim = raster.face_index_map
    depth = raster.depth_map
    alpha = raster.alpha_map
    covered = fim >= 0

    # Screen-space vertex positions in pixel units + front-visibility mask
    # (reference: network.py:169-173).
    v_uvz = jnp.stack(
        [
            (v_ndc[..., 0] * 0.5 + 0.5) * s,
            (1.0 - (v_ndc[..., 1] * 0.5 + 0.5)) * s,
            v_ndc[..., 2],
        ],
        axis=-1,
    )
    v_depth = jax.vmap(
        lambda d, xy: interpolate_bilinear(d[..., None], xy[..., 0], xy[..., 1])
    )(depth, v_uvz[..., :2])[..., 0]
    v_front_mask = (v_uvz[..., 2] - v_depth) < mesh.span_max * 5e-3

    # Differentiable clamped barycentrics at the winning faces, then
    # perspective correction w <- w * (1/z_k) * zp (network.py:176-180).
    w, zp, _ = pixel_attrs(faces_ndc, fim, s)
    faces_z = faces_ndc[..., 2]                      # [N, F, 3]
    z_k = jax.vmap(_gather_face_attr)(faces_z[..., None], fim)[..., 0]
    w = w / jnp.where(z_k == 0.0, 1e30, z_k) * zp[..., None]
    w = jnp.where(covered[..., None], w, 0.0)

    # uv map (wrap to [0, 1), network.py:183-190).
    faces_vt = mesh.vt[mesh.f_vt_idx]                # [F, 3, 2]
    uv_px = jax.vmap(lambda f: _gather_face_attr(faces_vt, f))(fim)
    uv_map = jnp.einsum("nhwk,nhwkc->nhwc", w, uv_px)
    uv_map = uv_map - jnp.floor(uv_map)

    # normals, world + camera (network.py:192-205).
    faces_vn = mesh.vn[mesh.f_vn_idx]                # [F, 3, 3]
    n_px = jax.vmap(lambda f: _gather_face_attr(faces_vn, f))(fim)
    normal_map = jnp.einsum("nhwk,nhwkc->nhwc", w, n_px)
    normal_map = normal_map / jnp.maximum(
        jnp.linalg.norm(normal_map, axis=-1, keepdims=True), 1e-12
    )
    normal_map_cam = jnp.einsum("nij,nhwj->nhwi", R, normal_map)
    normal_map_cam = normal_map_cam / jnp.maximum(
        jnp.linalg.norm(normal_map_cam, axis=-1, keepdims=True), 1e-12
    )

    # positions, world + camera (network.py:206-214).
    faces_v = mesh.vertices[mesh.faces]              # [F, 3, 3]
    p_px = jax.vmap(lambda f: _gather_face_attr(faces_v, f))(fim)
    position_map = jnp.einsum("nhwk,nhwkc->nhwc", w, p_px)
    position_map_cam = (
        jnp.einsum("nij,nhwj->nhwi", R, position_map) + t[:, None]
    )

    out: dict[str, Any] = {
        "uv_map": uv_map,
        "alpha_map": alpha,
        "face_index_map": fim,
        "weight_map": w[..., None],
        "normal_map": normal_map,
        "normal_map_cam": normal_map_cam,
        "position_map": position_map,
        "position_map_cam": position_map_cam,
        "depth_map": depth,
        "v_uvz": v_uvz,
        "v_front_mask": v_front_mask,
    }
    if raster.overflow is not None:
        # [N] dropped-candidate count from the Pallas tile binning —
        # non-zero means the raster is incomplete (raise
        # max_faces_per_tile); drivers should surface this
        out["raster_overflow"] = raster.overflow

    if with_high_maps:
        tangents = face_tangents(faces_v, faces_vt)
        tbn = get_tbn_map(normal_map, fim, tangent=tangents)
        proj_inv = jnp.linalg.inv(proj)
        R_inv = jnp.swapaxes(R, 1, 2)
        view_dir_map, view_dir_map_cam = get_view_dir_map((s, s), proj_inv, R_inv)
        vdt = jnp.einsum("nhwji,nhwj->nhwi", tbn, view_dir_map)
        vdt = vdt / jnp.maximum(
            jnp.linalg.norm(vdt, axis=-1, keepdims=True), 1e-12
        )
        reflect_dir_map = (
            get_reflect_dir(view_dir_map, normal_map) * alpha[..., None]
        )
        out.update(
            TBN_map=tbn,
            view_dir_map=view_dir_map,
            view_dir_map_cam=view_dir_map_cam,
            view_dir_map_tangent=vdt,
            reflect_dir_map=reflect_dir_map,
        )
        if with_sh:
            # the reference's t_sh stage (test_rnr.py:321-329): per-pixel
            # SH basis at the view directions; separable so staged timing
            # can difference it out
            out["sh_basis_map"] = evaluate_sh_basis(sh_lmax, view_dir_map)
    return out

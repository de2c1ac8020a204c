"""Golden tests for the rasterizer against a NumPy brute-force oracle
that mirrors the reference CUDA kernel semantics
(rasterize_cuda_kernel.cu:24-169) literally."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.projection import projection, vertices_to_faces
from rnr_tpu.ops.rasterize import rasterize_face_index, pixel_attrs
from rnr_tpu.ops.gbuffer import MeshBuffers, render_gbuffer


def oracle_rasterize(faces, image_size, near=0.0, far=1e5):
    """Per-pixel loop over all faces, as in the CUDA kernel (pre-flip)."""
    s = image_size
    f = faces.shape[0]
    fim = np.full((s, s), -1, np.int32)
    dep = np.full((s, s), far, np.float64)
    wmap = np.zeros((s, s, 3), np.float64)

    p = 0.5 * (faces[..., :2] * s + s - 1)  # [F, 3, 2] pixel coords
    finv = np.zeros((f, 3, 3))
    front = np.zeros(f, bool)
    for i in range(f):
        fc = faces[i]
        front[i] = not (
            (fc[2, 1] - fc[0, 1]) * (fc[1, 0] - fc[0, 0])
            < (fc[1, 1] - fc[0, 1]) * (fc[2, 0] - fc[0, 0])
        )
        M = np.array([[p[i, k, 0], p[i, k, 1], 1.0] for k in range(3)])
        try:
            finv[i] = np.linalg.inv(M)
        except np.linalg.LinAlgError:
            front[i] = False

    for yi in range(s):
        for xi in range(s):
            yp = (2.0 * yi + 1 - s) / s
            xp = (2.0 * xi + 1 - s) / s
            for fi in range(f):
                if not front[fi]:
                    continue
                fc = faces[fi]
                if (yp - fc[0, 1]) * (fc[1, 0] - fc[0, 0]) < (xp - fc[0, 0]) * (
                    fc[1, 1] - fc[0, 1]
                ):
                    continue
                if (yp - fc[1, 1]) * (fc[2, 0] - fc[1, 0]) < (xp - fc[1, 0]) * (
                    fc[2, 1] - fc[1, 1]
                ):
                    continue
                if (yp - fc[2, 1]) * (fc[0, 0] - fc[2, 0]) < (xp - fc[2, 0]) * (
                    fc[0, 1] - fc[2, 1]
                ):
                    continue
                # CUDA's face_inv is inv(M)^T (see rasterize_cuda_kernel.cu:52-55)
                w = finv[fi].T @ np.array([xi, yi, 1.0])
                w = np.clip(w, 0.0, 1.0)
                w = w / w.sum()
                zp = 1.0 / (w[0] / fc[0, 2] + w[1] / fc[1, 2] + w[2] / fc[2, 2])
                if zp <= near or zp >= far:
                    continue
                if zp < dep[yi, xi]:
                    dep[yi, xi] = zp
                    fim[yi, xi] = fi
                    wmap[yi, xi] = w
    # flip to image orientation
    return fim[::-1], wmap[::-1], dep[::-1]


def _random_faces(rng, num_faces):
    """Random front-facing triangles inside the NDC box with z in [1, 3]."""
    faces = []
    while len(faces) < num_faces:
        tri = rng.uniform(-0.9, 0.9, (3, 2))
        area2 = (tri[1, 0] - tri[0, 0]) * (tri[2, 1] - tri[0, 1]) - (
            tri[2, 0] - tri[0, 0]
        ) * (tri[1, 1] - tri[0, 1])
        if abs(area2) < 0.05:
            continue
        if area2 < 0:
            tri = tri[[0, 2, 1]]
        z = rng.uniform(1.0, 3.0, (3, 1))
        faces.append(np.concatenate([tri, z], axis=1))
    return np.asarray(faces, np.float32)


def test_rasterize_matches_oracle(rng):
    s = 32
    faces = _random_faces(rng, 7)
    got = rasterize_face_index(jnp.asarray(faces[None]), s, far=100.0, face_chunk=4)
    fim_o, w_o, d_o = oracle_rasterize(faces.astype(np.float64), s, far=100.0)
    fim = np.asarray(got.face_index_map[0])
    # Allow disagreement only where depths are nearly tied or on shared edges
    agree = fim == fim_o
    assert agree.mean() > 0.99, f"face index mismatch rate {1 - agree.mean():.4f}"
    d = np.asarray(got.depth_map[0])
    np.testing.assert_allclose(d[agree], d_o[agree], rtol=1e-4)
    w = np.asarray(got.weight_map[0])
    np.testing.assert_allclose(w[agree], w_o[agree], atol=1e-4)
    # weights: sum to 1 on covered pixels, 0 elsewhere
    cov = fim >= 0
    np.testing.assert_allclose(w[cov].sum(-1), 1.0, atol=1e-5)
    assert (w[~cov] == 0).all()


def test_rasterize_backface_and_clip(rng):
    s = 16
    # one backfacing triangle (CW) and one in front of near plane
    tri = np.array(
        [
            [[-0.5, -0.5, 2.0], [0.5, 0.5, 2.0], [0.5, -0.5, 2.0]],  # CW -> culled
            [[-0.5, -0.5, 0.05], [0.5, -0.5, 0.05], [0.0, 0.5, 0.05]],  # near-clipped
        ],
        np.float32,
    )
    out = rasterize_face_index(jnp.asarray(tri[None]), s, near=0.1, far=100.0, face_chunk=2)
    assert float(out.alpha_map.sum()) == 0.0


def test_rasterize_depth_order(rng):
    s = 16
    tri_far = np.array([[[-0.8, -0.8, 3.0], [0.8, -0.8, 3.0], [0.0, 0.8, 3.0]]])
    tri_near = np.array([[[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.4, 1.0]]])
    faces = np.concatenate([tri_far, tri_near], 0).astype(np.float32)
    out = rasterize_face_index(jnp.asarray(faces[None]), s, far=10.0, face_chunk=2)
    fim = np.asarray(out.face_index_map[0])
    # near triangle (index 1) must win wherever it is covered
    d = np.asarray(out.depth_map[0])
    np.testing.assert_allclose(d[fim == 1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(d[fim == 0], 3.0, rtol=1e-5)
    assert (fim == 1).sum() > 0 and (fim == 0).sum() > 0


def test_pixel_attrs_gradients_match_finite_difference(rng):
    s = 12
    faces = _random_faces(rng, 2).astype(np.float32)
    fim = rasterize_face_index(jnp.asarray(faces[None]), s, far=100.0, face_chunk=2).face_index_map

    def loss(f):
        w, zp, cov = pixel_attrs(f, fim, s)
        return jnp.sum(zp * zp) + jnp.sum(w * w)

    g = jax.grad(loss)(jnp.asarray(faces[None]))
    eps = 1e-3
    rngl = np.random.default_rng(1)
    for _ in range(5):
        fi = rngl.integers(0, 2)
        ci = rngl.integers(0, 3)
        di = rngl.integers(0, 3)
        fp = faces.copy()
        fp[fi, ci, di] += eps
        fm = faces.copy()
        fm[fi, ci, di] -= eps
        fd = (float(loss(jnp.asarray(fp[None]))) - float(loss(jnp.asarray(fm[None])))) / (2 * eps)
        an = float(g[0, fi, ci, di])
        np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-2)


def _quad_mesh():
    """A unit textured quad facing the camera at z = 2."""
    v = np.array(
        [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.5, 0.5, 2.0], [-0.5, 0.5, 2.0]],
        np.float32,
    )
    # front-facing winding under the projection y-flip
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    vt = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    vn = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (4, 1))
    return v, f, vt, vn


def test_render_gbuffer_quad(rng):
    s = 32
    v, f, vt, vn = _quad_mesh()
    mesh = MeshBuffers(
        vertices=jnp.asarray(v),
        faces=jnp.asarray(f),
        vt=jnp.asarray(vt),
        f_vt_idx=jnp.asarray(f),
        vn=jnp.asarray(vn),
        f_vn_idx=jnp.asarray(f),
        span_max=jnp.asarray(1.0, jnp.float32),
    )
    proj = jnp.asarray([[[s / 2, 0, s / 2], [0, s / 2, s / 2], [0, 0, 1.0]]])
    pose = jnp.eye(4)[None]
    dist = jnp.zeros((1, 5))
    gb = render_gbuffer(mesh, proj, pose, dist, None, None, s, far=100.0, face_chunk=2)

    alpha = np.asarray(gb["alpha_map"][0])
    assert alpha.sum() > 0
    # depth constant on the quad
    d = np.asarray(gb["depth_map"][0])
    np.testing.assert_allclose(d[alpha > 0], 2.0, rtol=1e-4)
    # normals point back at the camera, world == what we set
    nm = np.asarray(gb["normal_map"][0])[alpha > 0]
    np.testing.assert_allclose(nm, np.tile([[0, 0, -1.0]], (nm.shape[0], 1)), atol=1e-4)
    # uv interpolation: u increases with +x (image column).  With the
    # OpenCV camera convention (+y_cam points down in the image) and an
    # identity pose, world +y appears at the image *bottom*, so v also
    # increases with row index.
    uv = np.asarray(gb["uv_map"][0])
    ys, xs = np.nonzero(alpha > 0)
    u_vals = uv[ys, xs, 0]
    assert np.corrcoef(xs, u_vals)[0, 1] > 0.99
    v_vals = uv[ys, xs, 1]
    assert np.corrcoef(ys, v_vals)[0, 1] > 0.99
    # position map reconstructs world positions on the quad plane
    pos = np.asarray(gb["position_map"][0])[alpha > 0]
    np.testing.assert_allclose(pos[:, 2], 2.0, atol=1e-4)
    # TBN orthonormal on covered pixels
    tbn = np.asarray(gb["TBN_map"][0])[alpha > 0]
    eye = np.einsum("pij,pik->pjk", tbn, tbn)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    # view dirs are unit and point toward camera (negative z)
    vd = np.asarray(gb["view_dir_map"][0])
    np.testing.assert_allclose(np.linalg.norm(vd, axis=-1), 1.0, atol=1e-5)
    assert (vd[..., 2] < 0).all()
    # sh basis l=0 constant
    shm = np.asarray(gb["sh_basis_map"][0])
    np.testing.assert_allclose(shm[..., 0], 0.28209479, atol=1e-5)
    # all four vertices are front-visible
    assert np.asarray(gb["v_front_mask"][0]).all()


def test_render_gbuffer_front_mask_occlusion():
    s = 32
    # quad at z=2 plus a second smaller quad behind it (z=4, fully occluded)
    v1, f1, vt1, vn1 = _quad_mesh()
    v2 = v1.copy() * np.array([0.4, 0.4, 1.0], np.float32) + np.array(
        [0, 0, 2.0], np.float32
    )
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f1 + 4])
    vt = np.concatenate([vt1, vt1])
    vn = np.concatenate([vn1, vn1])
    mesh = MeshBuffers(
        vertices=jnp.asarray(v),
        faces=jnp.asarray(f),
        vt=jnp.asarray(vt),
        f_vt_idx=jnp.asarray(f),
        vn=jnp.asarray(vn),
        f_vn_idx=jnp.asarray(f),
        span_max=jnp.asarray(2.0, jnp.float32),
    )
    proj = jnp.asarray([[[s / 2, 0, s / 2], [0, s / 2, s / 2], [0, 0, 1.0]]])
    pose = jnp.eye(4)[None]
    dist = jnp.zeros((1, 5))
    gb = render_gbuffer(mesh, proj, pose, dist, None, None, s, far=100.0, face_chunk=2)
    mask = np.asarray(gb["v_front_mask"][0])
    assert mask[:4].all(), "front quad vertices must be visible"
    assert not mask[4:].any(), "occluded quad vertices must be masked"

"""Tests for the neural_renderer-parity API (cameras, lighting, textures,
rgbad rendering, Renderer facade)."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.render_api import (
    look, look_at, perspective, get_points_from_angles, lighting,
    sample_textures, rasterize_rgbad, rasterize_silhouettes, Renderer,
    fill_back_faces,
)
from rnr_tpu.ops.rasterize import rasterize_face_index


def test_look_at_centers_target():
    v = jnp.asarray([[[0.0, 0.0, 0.0]]])  # target point
    out = np.asarray(look_at(v, eye=[0, 0, -2.0]))
    # target lands on the +z axis at distance 2
    np.testing.assert_allclose(out[0, 0], [0, 0, 2.0], atol=1e-5)


def test_look_matches_look_at_when_aligned():
    v = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 3))
    a = look_at(v, eye=[0, 0, -3.0], at=[0, 0, 0])
    b = look(v, eye=[0, 0, -3.0], direction=[0, 0, 1.0])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_perspective_divide():
    v = jnp.asarray([[[1.0, 0.5, 2.0]]])
    out = np.asarray(perspective(v, angle=45.0))
    np.testing.assert_allclose(out[0, 0, 0], 1.0 / 2.0 / 1.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2], 2.0, atol=1e-6)


def test_get_points_from_angles():
    p = np.asarray(get_points_from_angles(2.0, 0.0, 0.0))
    np.testing.assert_allclose(p, [0, 0, -2.0], atol=1e-6)
    p = np.asarray(get_points_from_angles(1.0, 90.0, 0.0))
    np.testing.assert_allclose(p, [0, 1.0, 0], atol=1e-6)


def test_lighting_ambient_and_directional():
    faces = jnp.asarray(
        [[[[0, 0, 0], [1, 0, 0], [0, 1, 0]]]], jnp.float32
    )  # normal -z (cross(v0-v1, v2-v1))
    tex = jnp.ones((1, 1, 2, 2, 2, 3))
    # ambient only
    out = lighting(faces, tex, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
    # directional from -z: cos = 1 against the -z normal
    out = lighting(faces, tex, 0.0, 1.0, direction=(0, 0, -1))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
    # directional from +z: back side, relu clamps to 0
    out = lighting(faces, tex, 0.0, 1.0, direction=(0, 0, 1))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _big_triangle(z=2.0):
    return np.asarray(
        [[[[-0.9, -0.9, z], [0.9, -0.9, z], [0.0, 0.9, z]]]], np.float32
    )


def test_sample_textures_constant_volume():
    faces = jnp.asarray(_big_triangle())
    s = 16
    out = rasterize_face_index(faces, s, far=10.0, face_chunk=1)
    tex = jnp.full((1, 1, 4, 4, 4, 3), 0.7)
    rgb = sample_textures(
        faces, tex, out.face_index_map, out.weight_map, out.depth_map
    )
    covered = np.asarray(out.face_index_map) >= 0
    np.testing.assert_allclose(np.asarray(rgb)[covered], 0.7, atol=1e-5)
    assert (np.asarray(rgb)[~covered] == 0).all()


def test_sample_textures_gradients():
    faces = jnp.asarray(_big_triangle())
    s = 8
    out = rasterize_face_index(faces, s, far=10.0, face_chunk=1)

    def loss(tex):
        rgb = sample_textures(
            faces, tex, out.face_index_map, out.weight_map, out.depth_map
        )
        return jnp.sum(rgb)

    g = jax.grad(loss)(jnp.zeros((1, 1, 4, 4, 4, 3)))
    # gradient mass equals covered pixel count per channel (weights sum 1)
    covered = float((np.asarray(out.face_index_map) >= 0).sum())
    np.testing.assert_allclose(float(g.sum()), covered * 3, rtol=1e-5)
    assert float(jnp.abs(g).max()) > 0


def test_rasterize_rgbad_aa_shapes():
    faces = jnp.asarray(_big_triangle())
    tex = jnp.full((1, 1, 2, 2, 2, 3), 0.5)
    out = rasterize_rgbad(faces, tex, image_size=16, anti_aliasing=True,
                          far=10.0)
    assert out["rgb"].shape == (1, 3, 16, 16)
    assert out["alpha"].shape == (1, 16, 16)
    # AA produces fractional alpha on silhouette pixels
    a = np.asarray(out["alpha"])
    assert ((a > 0) & (a < 1)).any()
    sil = rasterize_silhouettes(faces, image_size=16, far=10.0)
    np.testing.assert_allclose(np.asarray(sil), a, atol=1e-6)


def test_fill_back():
    f = jnp.asarray([[[0, 1, 2]]], jnp.int32)
    out = np.asarray(fill_back_faces(f))
    np.testing.assert_array_equal(out, [[[0, 1, 2], [2, 1, 0]]])


def test_renderer_facade_projection_mode():
    s = 32
    verts = jnp.asarray(
        [[[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]]]
    )
    faces = jnp.asarray([[[0, 2, 1]]], jnp.int32)
    tex = jnp.full((1, 1, 2, 2, 2, 3), 1.0)
    K = jnp.asarray([[[s / 2, 0, s / 2], [0, s / 2, s / 2], [0, 0, 1.0]]])
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 1, 3))
    dist = jnp.zeros((1, 5))
    r = Renderer(
        image_size=s, camera_mode="projection", orig_size=s,
        anti_aliasing=False, fill_back=False, near=0.0, far=100.0,
        light_intensity_ambient=1.0, light_intensity_directional=0.0,
    )
    rgb, depth, alpha, fim, wmap, v_ndc, faces_v, faces_out = r.render(
        verts, faces, tex, K=K, R=R, t=t, dist_coeffs=dist
    )
    assert float(jnp.asarray(alpha).sum()) > 0
    d = np.asarray(depth)
    np.testing.assert_allclose(d[np.asarray(alpha) > 0], 2.0, rtol=1e-4)
    # ambient-only light, white texture -> rgb == 1 on coverage
    rgb_np = np.asarray(rgb)
    cov = np.asarray(alpha) > 0
    np.testing.assert_allclose(
        rgb_np[0, :, cov[0]], 1.0, atol=1e-4
    )


def test_renderer_facade_look_at_mode():
    s = 32
    verts = jnp.asarray(
        [[[-0.3, -0.3, 0.0], [0.3, -0.3, 0.0], [0.0, 0.4, 0.0]]]
    )
    faces = jnp.asarray([[[0, 1, 2]]], jnp.int32)
    r = Renderer(image_size=s, camera_mode="look_at", anti_aliasing=False,
                 fill_back=True, near=0.1, far=100.0)
    r.eye = jnp.asarray(get_points_from_angles(2.0, 15.0, 30.0))
    rgb, depth, alpha, *_ = r.render(verts, faces, None)
    assert float(jnp.asarray(alpha).sum()) > 0


def test_sample_textures_ts2_matches_general(rng):
    """The ts=2 bundled-gather specialization must match a NumPy oracle
    of the general 8-corner loop."""
    import jax.numpy as jnp

    from rnr_tpu.ops.render_api import sample_textures

    n, f, s, c, ts = 1, 7, 8, 3, 2
    faces = rng.standard_normal((n, f, 3, 3)).astype(np.float32)
    faces[..., 2] = np.abs(faces[..., 2]) + 1.0
    tex = rng.uniform(0, 1, (n, f, ts, ts, ts, c)).astype(np.float32)
    fim = rng.integers(-1, f, (n, s, s)).astype(np.int32)
    w = rng.uniform(0, 1, (n, s, s, 3)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    depth = rng.uniform(1, 2, (n, s, s)).astype(np.float32)

    out = np.asarray(sample_textures(
        jnp.asarray(faces), jnp.asarray(tex), jnp.asarray(fim),
        jnp.asarray(w), jnp.asarray(depth)))

    # oracle: direct port of the general corner loop
    eps = 1e-4
    safe = np.clip(fim, 0, f - 1)
    fz = faces[..., 2][np.arange(n)[:, None, None], safe]  # [n,s,s,3]
    ti = np.clip(w * (ts - 1) * (depth[..., None] / fz), 0, ts - 1 - eps)
    t0 = np.floor(ti).astype(np.int64)
    frac = ti - t0
    ref = np.zeros((n, s, s, c), np.float32)
    texf = tex.reshape(n, f * ts ** 3, c)
    for corner in range(8):
        wgt = np.ones((n, s, s), np.float32)
        idx3 = []
        for k in range(3):
            if (corner >> k) % 2 == 0:
                wgt *= 1.0 - frac[..., k]
                idx3.append(t0[..., k])
            else:
                wgt *= frac[..., k]
                idx3.append(t0[..., k] + 1)
        lin = safe * ts ** 3 + idx3[0] * ts ** 2 + idx3[1] * ts + idx3[2]
        ref += wgt[..., None] * texf[np.arange(n)[:, None, None], lin]
    ref = np.where((fim >= 0)[..., None], ref, 0.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)

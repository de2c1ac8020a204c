"""Unit tests for the pure-math core against NumPy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnr_tpu.ops import (
    interpolate_bilinear,
    interpolate_bilinear_batch,
    spherical_mapping,
    spherical_mapping_batch,
    spherical_mapping_inv,
    evaluate_sh_basis,
    fit_sh_coeff,
    reconstruct_sh,
    projection,
    vertices_to_faces,
    vertex_attrs_to_faces,
    get_view_dir_map,
    get_reflect_dir,
    get_tbn_map,
    face_tangents,
    euler_to_rot,
    masked_err_metrics,
    psnr,
    ssim,
)


# --------------------------------------------------------------------------
# interpolate_bilinear — oracle mirrors reference misc.py:5-42 exactly.
# --------------------------------------------------------------------------

def _interp_oracle(data, sub_x, sub_y):
    mask = (
        (sub_x >= 0) & (sub_x <= data.shape[1] - 1)
        & (sub_y >= 0) & (sub_y <= data.shape[0] - 1)
    ).astype(data.dtype)
    x0 = np.floor(sub_x).astype(np.int64)
    x1 = x0 + 1
    y0 = np.floor(sub_y).astype(np.int64)
    y1 = y0 + 1
    x0 = np.clip(x0, 0, data.shape[1] - 1)
    x1 = np.clip(x1, 0, data.shape[1] - 1)
    y0 = np.clip(y0, 0, data.shape[0] - 1)
    y1 = np.clip(y1, 0, data.shape[0] - 1)
    i00 = data[y0, x0, :]
    i10 = data[y1, x0, :]
    i01 = data[y0, x1, :]
    i11 = data[y1, x1, :]
    x0 = x0 - (x0 == x1)
    y0 = y0 - (y0 == y1)
    w00 = (x1 - sub_x) * (y1 - sub_y) * mask
    w10 = (x1 - sub_x) * (sub_y - y0) * mask
    w01 = (sub_x - x0) * (y1 - sub_y) * mask
    w11 = (sub_x - x0) * (sub_y - y0) * mask
    return (
        i00 * w00[..., None] + i10 * w10[..., None]
        + i01 * w01[..., None] + i11 * w11[..., None]
    )


def test_interpolate_bilinear_matches_reference_semantics(rng):
    data = rng.standard_normal((7, 9, 4)).astype(np.float32)
    x = rng.uniform(-2, 10, size=(3, 50)).astype(np.float32)
    y = rng.uniform(-2, 9, size=(3, 50)).astype(np.float32)
    # include exact boundary and integer positions
    x[0, :6] = [0.0, 8.0, 7.9999, -1.0, 3.0, 8.0001]
    y[0, :6] = [0.0, 6.0, 5.5, 2.0, -0.5, 6.0]
    got = np.asarray(interpolate_bilinear(jnp.asarray(data), jnp.asarray(x), jnp.asarray(y)))
    want = _interp_oracle(data, x, y)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interpolate_bilinear_batch_shared_and_per_batch(rng):
    data1 = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    datab = rng.standard_normal((3, 5, 5, 2)).astype(np.float32)
    x = rng.uniform(0, 4, size=(3, 10)).astype(np.float32)
    y = rng.uniform(0, 4, size=(3, 10)).astype(np.float32)
    got1 = np.asarray(interpolate_bilinear_batch(jnp.asarray(data1), jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got1, _interp_oracle(data1[0], x, y), rtol=1e-5)
    gotb = np.asarray(interpolate_bilinear_batch(jnp.asarray(datab), jnp.asarray(x), jnp.asarray(y)))
    for i in range(3):
        np.testing.assert_allclose(gotb[i], _interp_oracle(datab[i], x[i], y[i]), rtol=1e-5)


# --------------------------------------------------------------------------
# spherical mappings
# --------------------------------------------------------------------------

def test_spherical_roundtrip(rng):
    d = rng.standard_normal((3, 200)).astype(np.float64)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    uv = spherical_mapping(jnp.asarray(d))
    d2 = spherical_mapping_inv(uv)
    np.testing.assert_allclose(np.asarray(d2), d, atol=1e-6)


def test_spherical_mapping_formula(rng):
    d = rng.standard_normal((3, 50))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    uv = np.asarray(spherical_mapping(jnp.asarray(d)))
    u_ref = np.arctan2(d[2], d[0]) * 0.5 / np.pi + 0.5
    v_ref = np.arccos(d[1]) / np.pi
    np.testing.assert_allclose(uv[0], u_ref, atol=1e-6)
    np.testing.assert_allclose(uv[1], v_ref, atol=1e-6)


def test_spherical_mapping_batch_consistent(rng):
    d = rng.standard_normal((4, 3, 17))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(spherical_mapping_batch(jnp.asarray(d)))
    for i in range(4):
        np.testing.assert_allclose(
            got[i], np.asarray(spherical_mapping(jnp.asarray(d[i]))), atol=1e-6
        )


# --------------------------------------------------------------------------
# spherical harmonics — closed-form vs scipy complex-SH conversion
# --------------------------------------------------------------------------

def _scipy_real_sh(lmax, dirs):
    """Real orthonormal SH without Condon-Shortley phase, via scipy."""
    from scipy.special import sph_harm_y  # scipy >= 1.15: (l, m, theta, phi)

    theta = np.arccos(np.clip(dirs[:, 2], -1, 1))  # colatitude
    phi = np.arctan2(dirs[:, 1], dirs[:, 0])
    out = np.zeros((dirs.shape[0], (lmax + 1) ** 2))
    i = 0
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            if m == 0:
                out[:, i] = np.real(sph_harm_y(l, 0, theta, phi))
            elif m > 0:
                y = sph_harm_y(l, m, theta, phi)
                out[:, i] = np.sqrt(2) * ((-1) ** m) * np.real(y)
            else:
                y = sph_harm_y(l, -m, theta, phi)
                out[:, i] = np.sqrt(2) * ((-1) ** (-m)) * np.imag(y)
            i += 1
    return out


def test_sh_basis_low_order_closed_forms(rng):
    d = rng.standard_normal((100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    b = np.asarray(evaluate_sh_basis(2, jnp.asarray(d)))
    c0 = 0.5 / np.sqrt(np.pi)
    np.testing.assert_allclose(b[:, 0], c0 * np.ones_like(x), atol=1e-6)
    # l=1 (ordering m=-1,0,1): sin-phi term, z term, cos-phi term
    c1 = np.sqrt(3 / (4 * np.pi))
    np.testing.assert_allclose(b[:, 1], c1 * y, atol=1e-6)
    np.testing.assert_allclose(b[:, 2], c1 * z, atol=1e-6)
    np.testing.assert_allclose(b[:, 3], c1 * x, atol=1e-6)
    # a couple of l=2 entries
    np.testing.assert_allclose(
        b[:, 6], 0.25 * np.sqrt(5 / np.pi) * (3 * z * z - 1), atol=1e-6
    )
    np.testing.assert_allclose(
        b[:, 8], 0.25 * np.sqrt(15 / np.pi) * (x * x - y * y), atol=1e-6
    )


def test_sh_basis_matches_scipy_high_order(rng):
    pytest.importorskip("scipy.special")
    d = rng.standard_normal((64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(evaluate_sh_basis(10, jnp.asarray(d)))
    want = _scipy_real_sh(10, d)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sh_fit_reconstruct_roundtrip(rng):
    # A band-limited function should be exactly recovered by MC projection
    # in the limit; use many uniform samples for a tight tolerance.
    n = 200_000
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    basis = evaluate_sh_basis(3, jnp.asarray(v, dtype=jnp.float64))
    coeff_true = jnp.asarray(rng.standard_normal(((3 + 1) ** 2, 2)))
    samples = reconstruct_sh(coeff_true, basis)
    coeff_fit = fit_sh_coeff(samples, basis)
    np.testing.assert_allclose(
        np.asarray(coeff_fit), np.asarray(coeff_true), atol=0.05
    )


# --------------------------------------------------------------------------
# projection
# --------------------------------------------------------------------------

def test_projection_pinhole_no_distortion():
    s = 8
    K = jnp.asarray([[[s / 2, 0, s / 2], [0, s / 2, s / 2], [0, 0, 1.0]]])
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 1, 3))
    dist = jnp.zeros((1, 5))
    verts = jnp.asarray([[[0.0, 0.0, 2.0], [1.0, 0.0, 2.0], [0.0, 1.0, 2.0]]])
    out = np.asarray(projection(verts, K, R, t, dist, s))
    # center vertex -> (u=0, v flips sign: v_pix = s/2 -> ndc v = (s - s/2 - s/2)... )
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0, 2.0], atol=1e-6)
    # x=1, z=2 -> x'=0.5 -> u_pix = 0.5*s/2 + s/2 = 0.75 s -> ndc 0.5
    np.testing.assert_allclose(out[0, 1, 0], 0.5, atol=1e-6)
    # y=1 -> v_pix = 0.75 s -> flipped: s - 0.75 s = 0.25 s -> ndc -0.5
    np.testing.assert_allclose(out[0, 2, 1], -0.5, atol=1e-6)


def test_projection_offset_scale():
    s = 16
    K = jnp.asarray([[[4.0, 0, 8.0], [0, 4.0, 8.0], [0, 0, 1.0]]])
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 1, 3))
    dist = jnp.zeros((1, 5))
    verts = jnp.asarray([[[0.5, -0.25, 1.0]]])
    base = np.asarray(projection(verts, K, R, t, dist, s))
    off = jnp.asarray([[2.0, 3.0]])   # (y, x)
    sc = jnp.asarray([[1.5, 0.5]])    # (y, x)
    out = np.asarray(projection(verts, K, R, t, dist, s, off, sc))
    # manual: u_pix = (4*0.5 + 8 + 3) * 0.5 = 6.5 ; v_pix = (4*-0.25 + 8 + 2)*1.5 = 13.5
    u_ndc = 2 * (6.5 - 8) / 16
    v_ndc = 2 * ((16 - 13.5) - 8) / 16
    np.testing.assert_allclose(out[0, 0, 0], u_ndc, atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 1], v_ndc, atol=1e-6)
    assert not np.allclose(out, base)


def test_vertices_to_faces(rng):
    v = rng.standard_normal((2, 6, 3)).astype(np.float32)
    f = np.array([[[0, 1, 2], [3, 4, 5]]], dtype=np.int32)
    got = np.asarray(vertices_to_faces(jnp.asarray(v), jnp.asarray(f)))
    assert got.shape == (2, 2, 3, 3)
    np.testing.assert_allclose(got[1, 0], v[1, [0, 1, 2]])
    a = rng.standard_normal((2, 6, 5)).astype(np.float32)
    got2 = np.asarray(
        vertex_attrs_to_faces(jnp.asarray(a), jnp.asarray(np.repeat(f, 2, 0)))
    )
    np.testing.assert_allclose(got2[0, 1], a[0, [3, 4, 5]])


# --------------------------------------------------------------------------
# cameras / tbn
# --------------------------------------------------------------------------

def test_view_dir_map_points_to_camera():
    # Identity camera at origin looking down +z: rays (world == cam space)
    # should be unit and have negative z (pointing back toward the camera).
    proj = np.array([[[4.0, 0, 4.0], [0, 4.0, 4.0], [0, 0, 1.0]]], np.float32)
    proj_inv = jnp.asarray(np.linalg.inv(proj))
    R_inv = jnp.eye(3)[None]
    world, cam = get_view_dir_map((8, 8), proj_inv, R_inv)
    world = np.asarray(world)
    np.testing.assert_allclose(np.linalg.norm(world, axis=-1), 1.0, atol=1e-5)
    assert (world[..., 2] < 0).all()
    np.testing.assert_allclose(world, np.asarray(cam), atol=1e-6)


def test_reflect_dir_involution(rng):
    o = rng.standard_normal((10, 3))
    o /= np.linalg.norm(o, axis=-1, keepdims=True)
    p = rng.standard_normal((10, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    r = get_reflect_dir(jnp.asarray(o), jnp.asarray(p))
    r2 = get_reflect_dir(r, jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(r2), o, atol=1e-5)
    # reflecting around itself returns the direction
    r3 = get_reflect_dir(jnp.asarray(o), jnp.asarray(o))
    np.testing.assert_allclose(np.asarray(r3), o, atol=1e-5)


def test_tbn_map_orthonormal(rng):
    f = 5
    faces_v = rng.standard_normal((f, 3, 3)).astype(np.float32)
    faces_uv = rng.uniform(0, 1, (f, 3, 2)).astype(np.float32)
    normal = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    fim = rng.integers(0, f, (1, 4, 4)).astype(np.int32)
    tbn = np.asarray(
        get_tbn_map(jnp.asarray(normal), jnp.asarray(fim),
                    jnp.asarray(faces_v), jnp.asarray(faces_uv))
    )
    eye = np.einsum("nhwij,nhwik->nhwjk", tbn, tbn)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    # third column is the (normalized) input normal
    nn = normal / np.linalg.norm(normal, axis=-1, keepdims=True)
    np.testing.assert_allclose(tbn[..., 2], nn, atol=1e-5)


def test_euler_to_rot_orthonormal(rng):
    R = euler_to_rot(rng.uniform(-np.pi, np.pi, 3))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------

def test_psnr_and_masked_metrics(rng):
    est = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    gt = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    mask = (rng.uniform(size=(2, 16, 16, 1)) > 0.3).astype(np.float32)
    m = masked_err_metrics(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask))
    est_m = est * mask
    gt_m = gt * mask
    mae_ref = np.abs(est_m - gt_m).mean()
    np.testing.assert_allclose(float(m["mae"]), mae_ref, rtol=1e-5)
    nv = (mask * np.ones((1, 1, 1, 3))).sum((1, 2, 3))
    mae_valid_ref = (np.abs(est_m - gt_m).sum((1, 2, 3)) / nv).mean()
    np.testing.assert_allclose(float(m["mae_valid"]), mae_valid_ref, rtol=1e-5)
    p = float(psnr(jnp.asarray(est), jnp.asarray(gt)))
    mse = np.mean(((est - gt) / 255.0) ** 2)
    np.testing.assert_allclose(p, 20 * np.log10(1 / np.sqrt(mse)), rtol=1e-4)


def test_ssim_identity_and_range(rng):
    img = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    s_same = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    noise = np.clip(img + rng.normal(0, 60, img.shape), 0, 255).astype(np.float32)
    s_noise = float(ssim(jnp.asarray(img), jnp.asarray(noise)))
    assert 0.0 < s_noise < 0.95


def test_ssim_bounded_for_unclipped_magnitudes(rng):
    """SSIM map must stay in [-1, 1] for inputs far outside [0, 255].

    Early-training relight renders are unclipped network outputs; x255
    their magnitude reaches 1e4-1e5.  The f32 Gaussian window's ~5e-8
    normalization error then puts -eps*mu^2 ~ -O(100) into the variance
    terms, swamping c2=58.5 — the denominator crossed zero and an
    actual driver run printed "Val relight ... ssim 16.6062" (an
    impossible SSIM).  The sigma>=0 / Cauchy-Schwarz clamps restore the
    exact-arithmetic bound at any magnitude."""
    import scipy.ndimage as ndi

    from rnr_tpu.ops.metrics import _gaussian_kernel

    def ssim64(i1, i2, data_range=255.0, win=11):
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        k = np.asarray(_gaussian_kernel(win, 1.5), np.float64)
        k /= k.sum()  # exact normalization

        def blur(x):
            y = ndi.convolve1d(x, k, axis=1, mode="constant")
            y = ndi.convolve1d(y, k, axis=2, mode="constant")
            h = win // 2
            return y[:, h:-h, h:-h, :]

        i1, i2 = i1.astype(np.float64), i2.astype(np.float64)
        mu1, mu2 = blur(i1), blur(i2)
        s1 = np.maximum(blur(i1 * i1) - mu1 * mu1, 0)
        s2 = np.maximum(blur(i2 * i2) - mu2 * mu2, 0)
        s12 = blur(i1 * i2) - mu1 * mu2
        bd = np.sqrt(s1 * s2)
        s12 = np.clip(s12, -bd, bd)
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        return float(m.mean())

    for scale in (1e4, 1e5, 1e6):
        blocks_a = rng.standard_normal((1, 6, 6, 3)) * scale
        blocks_b = rng.standard_normal((1, 6, 6, 3)) * scale
        # piecewise-constant: zero true variance inside blocks, so the
        # denominator is c2-dominated and maximally cancellation-prone
        a = np.repeat(np.repeat(blocks_a, 16, 1), 16, 2).astype(np.float32)
        b = np.repeat(np.repeat(blocks_b, 16, 1), 16, 2).astype(np.float32)
        s = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert -1.0001 <= s <= 1.0001, (scale, s)
        # pre-fix the f32 value drifted ~0.2-0.3 from the oracle here
        assert abs(s - ssim64(a, b)) < 0.05, (scale, s, ssim64(a, b))
    # near-identical constant images at high magnitude: pre-fix this
    # read 0.727; the true value is ~1 (sigma terms are exactly zero)
    const = np.full((1, 64, 64, 3), 9000.0, np.float32)
    s_const = float(ssim(jnp.asarray(const), jnp.asarray(const * 1.0001)))
    assert s_const > 0.9, s_const

"""Tests for interp_vertex_attr, per-pixel TBN, prefetch, make_spiral."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rnr_tpu.ops import interp_vertex_attr, get_tbn_map_perpixel
from rnr_tpu.data.prefetch import prefetch


def test_interp_vertex_attr_constant_field(rng):
    v_attr = jnp.ones((6, 4)) * 2.5
    faces = jnp.asarray([[[0, 1, 2], [3, 4, 5]]], jnp.int32)
    fim = jnp.asarray(rng.integers(-1, 2, (1, 8, 8)).astype(np.int32))
    w = jnp.full((1, 8, 8, 3, 1), 1.0 / 3.0)
    out = np.asarray(interp_vertex_attr(v_attr, faces, fim, w))
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_interp_vertex_attr_selects_face(rng):
    v_attr = jnp.asarray(np.arange(6, dtype=np.float32)[:, None])
    faces = jnp.asarray([[[0, 0, 0], [5, 5, 5]]], jnp.int32)
    fim = jnp.asarray([[[0, 1]]], jnp.int32)  # [1,1,2]
    w = jnp.full((1, 1, 2, 3, 1), 1.0 / 3.0)
    out = np.asarray(interp_vertex_attr(v_attr, faces, fim, w))
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 1, 0], 5.0, atol=1e-5)


def test_tbn_perpixel_plane():
    # a flat plane in xy with uv == xy: tangent ~ +x, bitangent ~ +y
    s = 8
    ys, xs = np.mgrid[0:s, 0:s].astype(np.float32) / s
    pos = np.stack([xs, ys, np.zeros_like(xs)], -1)[None]
    uv = np.stack([xs, ys], -1)[None]
    normal = np.broadcast_to(
        np.asarray([0, 0, 1], np.float32), (1, s, s, 3)
    ).copy()
    alpha = np.ones((1, s, s, 1), np.float32)
    tbn = np.asarray(
        get_tbn_map_perpixel(
            jnp.asarray(normal), jnp.asarray(pos), jnp.asarray(uv),
            jnp.asarray(alpha),
        )
    )
    inner = tbn[0, 2:-2, 2:-2]
    np.testing.assert_allclose(
        inner[..., 0], np.broadcast_to([1, 0, 0], inner[..., 0].shape),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        inner[..., 1], np.broadcast_to([0, 1, 0], inner[..., 1].shape),
        atol=1e-4,
    )


def test_prefetch_order_and_transform():
    out = list(prefetch(range(10), depth=3, transform=lambda x: x * 2))
    assert out == [2 * i for i in range(10)]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(prefetch(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_make_spiral(tmp_path):
    import scipy.io
    from rnr_tpu.drivers import make_spiral
    from test_pipeline_e2e import make_scene

    root = make_scene(str(tmp_path))
    make_spiral.main(
        ["--data_root", root, "--num_step", "24", "--step_azi", "-15"]
    )
    calib = scipy.io.loadmat(
        os.path.join(root, "test_seq", "spiral_step720", "calib.mat")
    )
    assert calib["poses"].shape == (24, 4, 4)
    # all cameras at equal distance from the origin-centered sphere
    d = []
    gRT_inv = np.linalg.inv(calib["global_RT"])
    for i in range(24):
        pose = calib["poses"][i] @ gRT_inv
        d.append(np.linalg.norm(-pose[:3, :3].T @ pose[:3, 3]))
    # constant distance from the mesh center (which sits slightly off the
    # origin for a seam-duplicated UV sphere), hence loose origin-distance
    np.testing.assert_allclose(d, d[0], rtol=5e-2)
    np.testing.assert_allclose(d[0], 2.0 + 0.25, atol=0.4)


def test_unet3d_and_sampling_nets():
    import jax
    from rnr_tpu.models.unet3d import Unet3d, DownsamplingNet, UpsamplingNet

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 8, 2))
    net = Unet3d(in_channels=2, out_channels=3, nf0=4, num_down=2,
                 max_channels=16)
    params = net.init(key, x)
    y = net.apply(params, x)
    assert y.shape == (1, 8, 8, 8, 3)

    img = jax.random.normal(key, (1, 16, 16, 4))
    down = DownsamplingNet([8, 16])
    p2 = down.init(key, img)
    d = down.apply(p2, img)
    assert d.shape == (1, 4, 4, 16)
    up = UpsamplingNet([8, 4])
    p3 = up.init(key, d)
    u = up.apply(p3, d)
    assert u.shape == (1, 16, 16, 4)


def test_reconcile_sh_bands():
    """--sh_lmax override vs checkpoint basis: pad low-order projections
    with zeros, truncate higher ones (drivers/test_rnr.py)."""
    import jax.numpy as jnp
    import numpy as np

    from rnr_tpu.drivers.test_rnr import _reconcile_sh_bands

    c = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    up = np.asarray(_reconcile_sh_bands(c, 9))
    assert up.shape == (2, 9, 3)
    np.testing.assert_array_equal(up[:, :4], np.asarray(c))
    assert np.all(up[:, 4:] == 0)
    down = np.asarray(_reconcile_sh_bands(c, 1))
    np.testing.assert_array_equal(down, np.asarray(c[:, :1]))
    same = np.asarray(_reconcile_sh_bands(c, 4))
    np.testing.assert_array_equal(same, np.asarray(c))


def test_quat_rot_roundtrip():
    """quat2rot/rot2quat (reference data_util.py:123-172)."""
    from rnr_tpu.ops.cameras import euler_to_rot, quat2rot, rot2quat

    rng = np.random.default_rng(3)
    for _ in range(20):
        R = euler_to_rot(rng.uniform(-np.pi, np.pi, 3))
        q = rot2quat(R)
        R2 = quat2rot(q)
        np.testing.assert_allclose(R2, R, atol=1e-8)
        assert abs(np.linalg.norm(q) - 1.0) < 1e-8
    # degenerate quaternion -> identity (reference eps guard)
    np.testing.assert_allclose(quat2rot(np.zeros(4)), np.eye(3), atol=0)


def test_interpolate_bilinear_np_matches_jax_interior():
    """NumPy twin (misc.py:45-73) agrees with the jax op on interior
    coords (edge semantics differ by design: the torch/jax op masks
    out-of-range, the np twin clamps)."""
    import jax.numpy as jnp

    from rnr_tpu.ops.interpolate import (
        interpolate_bilinear, interpolate_bilinear_np,
    )

    rng = np.random.default_rng(5)
    data = rng.standard_normal((9, 7, 4)).astype(np.float32)
    x = rng.uniform(0.0, 5.9, (11,)).astype(np.float32)
    y = rng.uniform(0.0, 7.9, (11,)).astype(np.float32)
    out_np = interpolate_bilinear_np(data, x, y)
    out_j = np.asarray(
        interpolate_bilinear(jnp.asarray(data), jnp.asarray(x),
                             jnp.asarray(y)))
    np.testing.assert_allclose(out_np, out_j, atol=1e-5)


def test_pose_helpers_data_util_parity():
    """The six pipeline-dead data_util helpers (data_util.py:64-229):
    spiral, view interpolation, nn ranking, az/el rotation, random Euler,
    rotation magnitude."""
    from rnr_tpu.ops.cameras import (
        az_el_to_rot, euler_to_rot, get_archimedean_spiral,
        get_nn_ranking, interpolate_views, rand_euler_rotation_matrix,
        rot_mag,
    )

    # Archimedean spiral: num_step points on the sphere of given radius.
    pts = get_archimedean_spiral(2.0, origin=np.array([1.0, 0.0, 0.0]),
                                 num_step=50)
    assert len(pts) == 50
    radii = [np.linalg.norm(p - np.array([1.0, 0.0, 0.0])) for p in pts]
    np.testing.assert_allclose(radii, 2.0, atol=1e-9)
    # first point (i = a/2) is at elevation 0 => z == origin z
    np.testing.assert_allclose(pts[0][2], 0.0, atol=1e-9)

    # interpolate_views: endpoints match inputs (up to column renorm),
    # rotation columns stay unit norm throughout.
    p1, p2 = np.eye(4), np.eye(4)
    p2[:3, :3] = euler_to_rot(np.array([0.3, -0.2, 0.5]))
    p2[:3, 3] = [1.0, 2.0, 3.0]
    poses = interpolate_views(p1, p2, num_steps=7)
    assert len(poses) == 7
    np.testing.assert_allclose(poses[0], p1, atol=1e-12)
    np.testing.assert_allclose(poses[-1], p2, atol=1e-12)
    for p in poses:
        np.testing.assert_allclose(
            np.linalg.norm(p[:3, :3], axis=0), 1.0, atol=1e-12)

    # get_nn_ranking: nearest neighbor of view 0 is the view with the
    # closest optical axis; diagonal removed; rows sorted ascending.
    def pose_with_axis(v):
        P = np.eye(4)
        P[:3, 2] = v / np.linalg.norm(v)
        return P

    axes = [np.array([0.0, 0.0, 1.0]), np.array([0.05, 0.0, 1.0]),
            np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.2])]
    nn_idcs, sims = get_nn_ranking([pose_with_axis(a) for a in axes])
    assert nn_idcs.shape == (4, 4) and sims.shape == (4, 4)
    assert nn_idcs[0, -1] == 1  # most similar last (ascending order)
    assert np.all(np.diff(sims, axis=1) >= 0)
    assert np.all(sims[:, 0] == -1.0)  # self-similarity forced to -1

    # az_el_to_rot: orthonormal, det +1, and az=el=0 gives the inverse
    # correction matrix exactly.
    corr = np.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    np.testing.assert_allclose(az_el_to_rot(0.0, 0.0),
                               np.linalg.inv(corr), atol=1e-12)
    R = az_el_to_rot(33.0, -12.0)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    # rand_euler_rotation_matrix: angles bounded by nmax degrees,
    # matrix reproducible from the returned angles.
    rng = np.random.default_rng(7)
    R, euler_deg = rand_euler_rotation_matrix(nmax=10, rng=rng)
    assert np.all(np.abs(euler_deg) <= 10.0)
    np.testing.assert_allclose(
        R, euler_to_rot(np.radians(euler_deg)), atol=1e-12)

    # rot_mag: closed form equals ||logm(R)||_F/sqrt(2)*180/pi (the
    # reference formula) on proper rotations.
    from scipy.linalg import logm

    for ang in [0.0, 0.3, 1.2, 2.9]:
        R = euler_to_rot(np.array([0.0, 0.0, ang]))
        ref = np.linalg.norm(logm(R), 'fro') / np.sqrt(2) * 180 / np.pi
        np.testing.assert_allclose(rot_mag(R), ref, atol=1e-6)
    np.testing.assert_allclose(rot_mag(np.eye(3)), 0.0, atol=0)

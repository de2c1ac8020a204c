"""Interpret-mode parity of the fused SH-shading kernel vs the XLA math."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.sh import evaluate_sh_basis
from rnr_tpu.ops.sh_pallas import sh_shade

LMAX = 4
R_SPEC = 3
R_TOTAL = 5
C = 3


def _ref(rays_dir, rays_lt, alpha, coeff):
    # [N,H,W,3,R] -> per-ray radiance via the closed-form basis
    d = jnp.moveaxis(rays_dir, -1, 0)                      # [R,N,H,W,3]
    basis = evaluate_sh_basis(LMAX, d)                     # [R,N,H,W,B]
    rc = jnp.einsum("rnhwb,bc->rnhwc", basis, coeff)
    rc = rc * alpha[None]
    lt = jnp.moveaxis(rays_lt, -2, 0)                      # [R,N,H,W,C]
    spec = jnp.mean(lt[:R_SPEC] * rc[:R_SPEC], axis=0)
    diff = jnp.mean(lt[R_SPEC:] * rc[R_SPEC:], axis=0)
    return spec, diff


def _data(n=1, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, h, w, 3, R_TOTAL)).astype(np.float32)
    d /= np.linalg.norm(d, axis=3, keepdims=True)
    lt = rng.uniform(0, 2, (n, h, w, R_TOTAL, C)).astype(np.float32)
    alpha = (rng.uniform(size=(n, h, w, 1)) > 0.3).astype(np.float32)
    coeff = rng.standard_normal(((LMAX + 1) ** 2, C)).astype(np.float32)
    return (jnp.asarray(d), jnp.asarray(lt), jnp.asarray(alpha),
            jnp.asarray(coeff))


def test_forward_parity():
    d, lt, alpha, coeff = _data()
    spec, diff = sh_shade(d, lt, alpha, coeff, LMAX, R_SPEC, True)
    spec_r, diff_r = _ref(d, lt, alpha, coeff)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(spec_r),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(diff), np.asarray(diff_r),
                               rtol=0, atol=1e-4)


def test_gradient_parity():
    d, lt, alpha, coeff = _data(seed=1)
    rng = np.random.default_rng(9)
    cs = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    cd = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))

    def loss_pallas(lt, coeff):
        s, f = sh_shade(d, lt, alpha, coeff, LMAX, R_SPEC, True)
        return jnp.sum(s * cs) + jnp.sum(f * cd)

    def loss_ref(lt, coeff):
        s, f = _ref(d, lt, alpha, coeff)
        return jnp.sum(s * cs) + jnp.sum(f * cd)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(lt, coeff)
    gr = jax.grad(loss_ref, argnums=(0, 1))(lt, coeff)
    for a, e, name in zip(gp, gr, ("d_rays_lt", "d_coeff")):
        scale = np.abs(np.asarray(e)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale,
            rtol=0, atol=1e-4, err_msg=name,
        )


def test_bf16_rays_lt():
    d, lt, alpha, coeff = _data(seed=2)
    s16, f16 = sh_shade(
        d.astype(jnp.bfloat16), lt.astype(jnp.bfloat16), alpha, coeff,
        LMAX, R_SPEC, True,
    )
    s32, f32_ = _ref(d, lt, alpha, coeff)
    scale = np.abs(np.asarray(s32)).max() + 1e-6
    assert np.abs(np.asarray(s16) - np.asarray(s32)).max() / scale < 0.05


def test_ray_render_sh_backend_parity():
    """ray_render_sh pallas_interpret vs xla: full output-dict parity."""
    from rnr_tpu.models.rays import ray_render_sh

    d, lt, alpha, coeff = _data(seed=3)
    alb = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (1, 16, 16, 3))
        .astype(np.float32)
    )
    kw = dict(num_ray_diffuse=R_TOTAL - R_SPEC, albedo_diffuse=alb,
              separate_albedo=True)
    a = ray_render_sh(alb, d, alpha, lt, coeff, LMAX,
                      backend="pallas_interpret", **kw)
    b = ray_render_sh(alb, d, alpha, lt, coeff, LMAX, backend="xla", **kw)
    for k in ("out", "out_specular", "out_diffuse", "ltt_specular_map",
              "ltt_diffuse_map"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-4,
            err_msg=k,
        )


def test_vmem_budget_tile_picks():
    """Scoped-VMEM budget regression guard (v5e limit: 16 MB).

    Round 3 on-device: the SH backward at f32/512^2 compiled a tile
    needing 22.8 MB of scoped VMEM and failed (tools/out KERNELS gate).
    Pin the picker's choices for every shipped (dtype, size) so a
    budget regression is caught on CPU before it reaches the chip.
    """
    from rnr_tpu.ops.sh_pallas import _pick_th_sh, _round8, num_sh_basis

    def worst_case_bytes(th, w, ray_bytes, bwd):
        r_total, c = 26, 3
        io = r_total * 3 * ray_bytes + r_total * c * ray_bytes + 4
        io += (2 * c * 4 + r_total * c * ray_bytes) if bwd else 2 * c * 4
        return 2 * io * th * w + _round8(num_sh_basis(10)) * th * w * 4

    for ray_bytes in (2, 4):
        for w in (128, 512, 1024):
            for bwd in (False, True):
                th = _pick_th_sh(w, w, 26, 3, 10, ray_bytes, bwd)
                assert w % th == 0
                used = worst_case_bytes(th, w, ray_bytes, bwd)
                assert used <= 14 * 1024 * 1024, (
                    ray_bytes, w, bwd, th, used)
    # the f32 512^2 backward that failed on-device must now tile at <= 8
    assert _pick_th_sh(512, 512, 26, 3, 10, 4, True) <= 8
    # bf16 at 512^2 keeps the round-3-measured tile (perf comparability)
    assert _pick_th_sh(512, 512, 26, 3, 10, 2, True) == 16


def _fan_data(n=1, h=16, w=16, seed=5, num_azi=2, num_polar=1):
    """Random tangent frames + view dirs + the exact model fan
    composition (models/rnr.py): spec fan then diffuse fan."""
    from rnr_tpu.models.rays import RaySampler

    rng = np.random.default_rng(seed)
    # random orthonormal TBN frames (QR of random 3x3, det fixed +1)
    m = rng.standard_normal((n, h, w, 3, 3))
    q, _ = np.linalg.qr(m)
    tbn = q.astype(np.float32)
    vdt = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    vdt /= np.linalg.norm(vdt, axis=-1, keepdims=True)
    alpha = (rng.uniform(size=(n, h, w, 1)) > 0.3).astype(np.float32)
    coeff = rng.standard_normal(((LMAX + 1) ** 2, C)).astype(np.float32)

    spec = RaySampler(num_azi=num_azi, num_polar=num_polar,
                      interval_polar=5.0, mode="reflect")
    diff = RaySampler(num_azi=num_azi, num_polar=num_polar,
                      interval_polar=10.0, mode="diffuse")
    tbn_j, vdt_j, alpha_j = (jnp.asarray(tbn), jnp.asarray(vdt),
                             jnp.asarray(alpha))
    rd_s, _, _ = spec(tbn_j, vdt_j, alpha_j, with_uv=False)
    rd_d, _, _ = diff(tbn_j, vdt_j, alpha_j, with_uv=False)
    rays_dir = jnp.concatenate([rd_s, rd_d], axis=-1)
    r_total = rays_dir.shape[-1]
    lt = rng.uniform(0, 2, (n, h, w, r_total, C)).astype(np.float32)
    pivots = jnp.asarray(
        np.concatenate([spec.pivots_dir.T, diff.pivots_dir.T], axis=0)
        .astype(np.float32))
    return (tbn_j, vdt_j, alpha_j, jnp.asarray(lt),
            jnp.asarray(coeff), pivots, rays_dir, spec.num_ray)


def test_fan_fused_forward_parity():
    """sh_shade_fan (interpret) == sh_shade on the XLA-composed fan:
    the in-kernel reflect/TBN/normalize reproduces models/rays.py."""
    from rnr_tpu.ops.sh_pallas import sh_shade_fan

    (tbn, vdt, alpha, lt, coeff, pivots, rays_dir,
     r_spec) = _fan_data()
    s_f, d_f = sh_shade_fan(tbn, vdt, alpha, lt, coeff, pivots,
                            LMAX, r_spec, True)
    s_r, d_r = sh_shade(rays_dir, lt, alpha, coeff, LMAX, r_spec, True)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_r),
                               rtol=0, atol=1e-4)


def test_fan_fused_gradient_parity():
    from rnr_tpu.ops.sh_pallas import sh_shade_fan

    (tbn, vdt, alpha, lt, coeff, pivots, rays_dir,
     r_spec) = _fan_data(seed=6)
    rng = np.random.default_rng(9)
    cs = jnp.asarray(
        rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    cd = jnp.asarray(
        rng.standard_normal((1, 16, 16, C)).astype(np.float32))

    def loss_fan(lt, coeff):
        s, f = sh_shade_fan(tbn, vdt, alpha, lt, coeff, pivots,
                            LMAX, r_spec, True)
        return jnp.sum(s * cs) + jnp.sum(f * cd)

    def loss_base(lt, coeff):
        s, f = sh_shade(rays_dir, lt, alpha, coeff, LMAX, r_spec, True)
        return jnp.sum(s * cs) + jnp.sum(f * cd)

    gf = jax.grad(loss_fan, argnums=(0, 1))(lt, coeff)
    gb = jax.grad(loss_base, argnums=(0, 1))(lt, coeff)
    for a, e, name in zip(gf, gb, ("d_rays_lt", "d_coeff")):
        scale = np.abs(np.asarray(e)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale,
            rtol=0, atol=1e-4, err_msg=name,
        )


def test_ray_render_sh_fan_inputs_parity():
    """The fan_inputs fast path through ray_render_sh matches the
    rays_dir path output-dict for key."""
    from rnr_tpu.models.rays import ray_render_sh

    (tbn, vdt, alpha, lt, coeff, pivots, rays_dir,
     r_spec) = _fan_data(seed=7)
    alb = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (1, 16, 16, 3))
        .astype(np.float32))
    kw = dict(num_ray_diffuse=rays_dir.shape[-1] - r_spec,
              albedo_diffuse=alb, separate_albedo=True)
    a = ray_render_sh(alb, rays_dir, alpha, lt, coeff, LMAX,
                      backend="pallas_interpret",
                      fan_inputs=(tbn, vdt, pivots), **kw)
    b = ray_render_sh(alb, rays_dir, alpha, lt, coeff, LMAX,
                      backend="xla", **kw)
    for k in ("out", "out_specular", "out_diffuse", "ltt_specular_map",
              "ltt_diffuse_map"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-4,
            err_msg=k,
        )


def test_fan_vmem_budget_tile_picks():
    """Fan-fused kernels' scoped-VMEM budget at shipped shapes."""
    from rnr_tpu.ops.sh_pallas import _pick_th_sh_fan, _round8

    def worst_case_bytes(th, w, lt_bytes, bwd):
        r_total, c = 26, 3
        io = 12 * 4 + r_total * c * lt_bytes + 4
        io += (2 * c * 4 + r_total * c * lt_bytes) if bwd else 2 * c * 4
        return 2 * io * th * w + _round8(num_sh_basis(10)) * th * w * 4

    from rnr_tpu.ops.sh import num_sh_basis

    for lt_bytes in (2, 4):
        for w in (128, 512, 1024):
            for bwd in (False, True):
                th = _pick_th_sh_fan(w, w, 26, 3, 10, lt_bytes, bwd)
                assert w % th == 0
                used = worst_case_bytes(th, w, lt_bytes, bwd)
                assert used <= 14 * 1024 * 1024, (
                    lt_bytes, w, bwd, th, used)


def test_build_fan_channels_matches_sampler_composition():
    """models/rays.py::build_fan_channels == the RaySampler spec+diffuse
    composition (rays_dir AND the U-Net channel layout)."""
    from rnr_tpu.models.rays import RaySampler, build_fan_channels

    (tbn, vdt, alpha, _, _, pivots, rays_dir_ref,
     r_spec) = _fan_data(seed=8)
    net_rays, rays_dir = build_fan_channels(tbn, vdt, alpha, pivots,
                                            r_spec)
    np.testing.assert_allclose(
        np.asarray(rays_dir), np.asarray(rays_dir_ref), atol=2e-6)
    n, h, w = vdt.shape[:3]
    r_total = rays_dir_ref.shape[-1]
    net_ref = jnp.swapaxes(rays_dir_ref, -1, -2).reshape(
        n, h, w, r_total * 3)
    np.testing.assert_allclose(
        np.asarray(net_rays), np.asarray(net_ref), atol=2e-6)

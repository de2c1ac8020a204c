"""Pallas kernels under shard_map on the virtual CPU mesh.

Round-3 sharded programs rebuilt the model with XLA backends because
pallas_call has no GSPMD rule; ops/shmap.py now carries the per-pixel
kernels onto the mesh with `jax.shard_map` (VERDICT r3 item 4).  These
tests run the kernels in interpret mode on 8 virtual CPU devices and pin

  * outputs AND gradients equal to the single-device XLA formulation,
  * dcoeff / texture gradients (reductions over sharded pixels) psummed
    correctly across shards.

Mosaic lowering of the same wrap is exercised on hardware by
tools/tpu_smoke.py (a shard_map'd cell on a 1-device mesh).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.models.rays import ray_render_sh
from rnr_tpu.parallel import make_mesh
from rnr_tpu.parallel.sharding import batch_sharding, replicated

KEY = jax.random.PRNGKey(0)


def _sh_inputs(rng, n=1, s=64, r=6, c=3):
    d = rng.standard_normal((n, s, s, 3, r)).astype(np.float32)
    d /= np.linalg.norm(d, axis=3, keepdims=True)
    lt = rng.uniform(0, 2, (n, s, s, r, c)).astype(np.float32)
    al = (rng.uniform(size=(n, s, s, 1)) > 0.3).astype(np.float32)
    cf = rng.standard_normal((25, c)).astype(np.float32)
    alb = rng.uniform(0, 1, (n, s, s, c)).astype(np.float32)
    return map(jnp.asarray, (d, lt, al, cf, alb))


def _run_sh(backend, mesh, d, lt, al, cf, alb):
    kw = dict(num_ray_diffuse=3, albedo_diffuse=alb, separate_albedo=True)

    def loss(lt_, cf_):
        return jnp.sum(ray_render_sh(
            alb, d, al, lt_, cf_, 4, backend=backend, **kw)["out"] ** 2)

    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    if mesh is None:
        return fn(lt, cf)
    divisible = lt.shape[1] % mesh.devices.shape[1] == 0
    lt_s = jax.device_put(
        lt, batch_sharding(mesh, lt.ndim) if divisible
        else replicated(mesh))
    cf_s = jax.device_put(cf, replicated(mesh))
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        return fn(lt_s, cf_s)


def test_sh_shade_shard_map_matches_xla(rng):
    d, lt, al, cf, alb = _sh_inputs(rng)
    mesh = make_mesh(8, dp=1)
    v_ref, (gl_ref, gc_ref) = _run_sh("xla", None, d, lt, al, cf, alb)
    v_sh, (gl_sh, gc_sh) = _run_sh(
        "pallas_interpret", mesh, d, lt, al, cf, alb)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gl_sh), np.asarray(gl_ref), atol=2e-4,
        rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gc_sh), np.asarray(gc_ref), atol=2e-3, rtol=1e-3)


def test_sh_shade_shard_map_dp_and_sp(rng):
    # batch 2 over dp=2, rows over sp=4
    d, lt, al, cf, alb = _sh_inputs(rng, n=2)
    mesh = make_mesh(8, dp=2)
    v_ref, (gl_ref, gc_ref) = _run_sh("xla", None, d, lt, al, cf, alb)
    v_sh, (gl_sh, gc_sh) = _run_sh(
        "pallas_interpret", mesh, d, lt, al, cf, alb)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gc_sh), np.asarray(gc_ref), atol=2e-3, rtol=1e-3)


def test_sh_shade_indivisible_rows_falls_back(rng):
    # H=60 does not divide over sp=8 — ray_render_sh must fall back to
    # the XLA formulation instead of tracing a broken shard_map
    d, lt, al, cf, alb = _sh_inputs(rng, s=60)
    mesh = make_mesh(8, dp=1)
    v_ref, (gl_ref, _) = _run_sh("xla", None, d, lt, al, cf, alb)
    v_sh, (gl_sh, _) = _run_sh(
        "pallas_interpret", mesh, d, lt, al, cf, alb)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4)


def test_mipmap_sample_shard_map_matches_direct(rng):
    from rnr_tpu.ops.shmap import row_shard_map
    from rnr_tpu.ops.texture_pallas import mipmap_sample

    mesh = make_mesh(8, dp=1)
    n, s = 1, 64
    texs = tuple(
        jnp.asarray(rng.standard_normal((64 >> l, 64 >> l, 4))
                    .astype(np.float32))
        for l in range(2)
    )
    uv = jnp.asarray(rng.uniform(0, 1, (n, 256, 256, 2))
                     .astype(np.float32))

    def loss_direct(ts, uv_):
        return jnp.sum(mipmap_sample(ts, uv_, True) ** 2)

    v_ref, g_ref = jax.jit(jax.value_and_grad(loss_direct))(texs, uv)

    def loss_sharded(ts, uv_):
        out = row_shard_map(
            lambda u, *tt: mipmap_sample(tuple(tt), u, True),
            in_specs=[("dp", "sp", None, None)]
            + [(None,) * t.ndim for t in ts],
            out_specs=[("dp", "sp", None, None)],
        )(uv_, *ts)
        return jnp.sum(out ** 2)

    fn = jax.jit(jax.value_and_grad(loss_sharded))
    uv_s = jax.device_put(uv, batch_sharding(mesh, uv.ndim))
    ts_s = jax.device_put(texs, replicated(mesh))
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        v_sh, g_sh = fn(ts_s, uv_s)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4)
    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_sh_shade_fan_shard_map_matches_xla(rng):
    """The fan-fused kernel (sh_shade_fan) under shard_map on the
    virtual mesh: outputs + gradients equal the single-device XLA
    composition of the same fan."""
    from rnr_tpu.models.rays import RaySampler

    n, s = 1, 64
    m = rng.standard_normal((n, s, s, 3, 3))
    q, _ = np.linalg.qr(m)
    tbn = jnp.asarray(q.astype(np.float32))
    vdt = rng.standard_normal((n, s, s, 3)).astype(np.float32)
    vdt = jnp.asarray(vdt / np.linalg.norm(vdt, axis=-1, keepdims=True))
    al = jnp.asarray(
        (rng.uniform(size=(n, s, s, 1)) > 0.3).astype(np.float32))
    cf = jnp.asarray(rng.standard_normal((25, 3)).astype(np.float32))
    alb = jnp.asarray(
        rng.uniform(0, 1, (n, s, s, 3)).astype(np.float32))
    spec = RaySampler(num_azi=2, num_polar=1, interval_polar=5.0,
                      mode="reflect")
    diff = RaySampler(num_azi=2, num_polar=1, interval_polar=10.0,
                      mode="diffuse")
    rd_s, _, _ = spec(tbn, vdt, al, with_uv=False)
    rd_d, _, _ = diff(tbn, vdt, al, with_uv=False)
    d = jnp.concatenate([rd_s, rd_d], axis=-1)
    r_total = d.shape[-1]
    lt = jnp.asarray(
        rng.uniform(0, 2, (n, s, s, r_total, 3)).astype(np.float32))
    pivots = jnp.asarray(np.concatenate(
        [spec.pivots_dir.T, diff.pivots_dir.T], axis=0
    ).astype(np.float32))
    kw = dict(num_ray_diffuse=diff.num_ray, albedo_diffuse=alb,
              separate_albedo=True)

    def loss(backend, fan, lt_, cf_):
        return jnp.sum(ray_render_sh(
            alb, d, al, lt_, cf_, 4, backend=backend,
            fan_inputs=(tbn, vdt, pivots) if fan else None,
            **kw)["out"] ** 2)

    ref_fn = jax.jit(jax.value_and_grad(
        lambda lt_, cf_: loss("xla", False, lt_, cf_), argnums=(0, 1)))
    v_ref, (gl_ref, gc_ref) = ref_fn(lt, cf)

    mesh = make_mesh(8, dp=1)
    fan_fn = jax.jit(jax.value_and_grad(
        lambda lt_, cf_: loss("pallas_interpret", True, lt_, cf_),
        argnums=(0, 1)))
    lt_s = jax.device_put(lt, batch_sharding(mesh, lt.ndim))
    cf_s = jax.device_put(cf, replicated(mesh))
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        v_sh, (gl_sh, gc_sh) = fan_fn(lt_s, cf_s)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gl_sh), np.asarray(gl_ref), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gc_sh), np.asarray(gc_ref), atol=2e-3, rtol=1e-3)

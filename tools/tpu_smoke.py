"""Consolidated on-TPU validation: run everything in ONE process.

The TPU tunnel serves one client at a time and wedges after kills, so all
hardware checks batch here:
  1. Pallas vs XLA rasterizer parity + timing on a real sphere mesh.
  2. Full G-buffer rendering (Pallas path) timing.
  3. Texture gather/scatter Pallas kernels vs XLA oracles ON DEVICE
     (interpret-mode CPU tests cover semantics; this gate catches
     Mosaic lowering divergence).
  4. Stratified-kNN Pallas kernel vs its XLA oracle on device.
  5. Differentiable rasterization (rasterize_opt) fwd+bwd timing at
     512^2 / 12k faces through the Pallas winner-map forward.

Emits a machine-readable gate record (kernel -> parity pass/fail +
on-device ms) to the path in $KERNELS_JSON (default
tools/out/kernels_gates.json) — the round-over-round regression
tripwire for the Pallas kernels (VERDICT r2 item 6).

Usage: [KERNELS_JSON=KERNELS_r03.json] python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _sync(x):
    """Synchronize by fetching ONE scalar (device-side reduce first).

    np.asarray(leaf) fetches the WHOLE array through the tunnel at
    ~12 MB/s (tools/out/leak_probe_r4.log leg C) — syncing on an 81 MB
    gradient inflated the round-3 SH-backward gate to 528 ms and the
    round-4 shard_map gate to 3069 ms while the actual compute was
    ~20 ms.  block_until_ready can return early on this backend
    (CLAUDE.md), so a scalar fetch is the only sound sync.
    """
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jax.tree.leaves(x)[0]))


def make_sphere(n_lat=64, n_lon=96, radius=0.5):
    vs, vts, vns, faces = [], [], [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon + 1):
            ph = 2 * np.pi * j / n_lon
            vs.append((radius * np.sin(th) * np.cos(ph),
                       radius * np.cos(th),
                       radius * np.sin(th) * np.sin(ph)))
            vns.append((np.sin(th) * np.cos(ph), np.cos(th),
                        np.sin(th) * np.sin(ph)))
            vts.append((j / n_lon, 1 - i / n_lat))

    def vid(i, j):
        return i * (n_lon + 1) + j

    for i in range(n_lat):
        for j in range(n_lon):
            a, b, c, d = vid(i, j), vid(i, j + 1), vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                faces.append((a, b, c))
            if i < n_lat - 1:
                faces.append((a, c, d))
    return (np.asarray(vs, np.float32), np.asarray(vts, np.float32),
            np.asarray(vns, np.float32), np.asarray(faces, np.int32))


def main():
    import atexit
    import json

    import jax
    import jax.numpy as jnp

    def write_record():
        # called after EVERY gate (and atexit) so a mid-gate crash still
        # leaves the gates recorded so far — round-4 lesson: a transient
        # FAILED_PRECONDITION on the very first device fetch left an
        # empty {} record committed as KERNELS_r04.json
        out_path = os.environ.get("KERNELS_JSON") or os.path.join(
            os.path.dirname(__file__), "out", "kernels_gates.json"
        )
        out_dir = os.path.dirname(out_path)
        if out_dir:  # relative paths like KERNELS_r03.json have no dir
            os.makedirs(out_dir, exist_ok=True)
        record = {
            "backend": jax.default_backend(),
            "gates": gates,
            "all_pass": bool(gates) and all(
                g.get("pass") for g in gates.values()
            ),
        }
        with open(out_path, "w") as fh:
            json.dump(record, fh, indent=1)
        print("wrote", out_path, flush=True)

    class _IncrementalGates(dict):
        """Persist the gate record on every assignment."""

        def __setitem__(self, key, value):
            super().__setitem__(key, value)
            write_record()

    gates = _IncrementalGates()
    atexit.register(write_record)

    from rnr_tpu.ops.projection import projection, vertices_to_faces
    from rnr_tpu.ops.rasterize import rasterize_face_index
    from rnr_tpu.ops.rasterize_pallas import rasterize_pallas
    from rnr_tpu.ops.gbuffer import MeshBuffers, render_gbuffer
    from rnr_tpu.ops.cameras import rt_from_pos_lookat

    print("backend:", jax.default_backend())

    # --- SH / conv / shard_map gates run FIRST, in a clean device state.
    # When they ran last (after five raster/texture/kNN gates left
    # several GB of live buffers), the SH fwd+bwd cell reproducibly
    # measured ~550-680 ms for BOTH backends while a fresh process
    # measures 18.8 / 30.1 ms (tools/out/sh_probe_r4.json) — a
    # process-state artifact, not a kernel property.
    try:
        _sh_gate(gates, jax, jnp, _sync)
    except Exception as e:
        gates["sh_shade"] = {"pass": False, "error": repr(e)[:300]}
        print("sh_shade gate FAILED:", repr(e)[:200], flush=True)
    try:
        _sh_fan_gate(gates, jax, jnp, _sync)
    except Exception as e:
        gates["sh_shade_fan"] = {"pass": False, "error": repr(e)[:300]}
        print("sh_shade_fan gate FAILED:", repr(e)[:200], flush=True)
    try:
        _conv_gate(gates, jax, jnp, _sync)
    except Exception as e:
        gates["unet_convs"] = {"pass": False, "error": repr(e)[:300]}
        print("unet_convs gate FAILED:", repr(e)[:200], flush=True)
    try:
        _slab_conv_gate(gates, jax, jnp, _sync)
    except Exception as e:
        gates["conv3x3_slab"] = {"pass": False, "error": repr(e)[:300]}
        print("conv3x3_slab gate FAILED:", repr(e)[:200], flush=True)
    try:
        _shmap_gate(gates, jax, jnp, _sync)
    except Exception as e:
        gates["sh_shade_shard_map"] = {"pass": False,
                                       "error": repr(e)[:300]}
        print("sh_shade_shard_map gate FAILED:", repr(e)[:200],
              flush=True)

    S = 512
    v, vt, vn, f = make_sphere()
    print(f"sphere: {len(v)} verts, {len(f)} faces")

    K = jnp.asarray([[[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1.0]]])
    pose = jnp.asarray(
        rt_from_pos_lookat(np.array([0.3, 0.4, 2.0]))[None].astype(np.float32)
    )
    dist = jnp.zeros((1, 5))
    vndc = projection(jnp.asarray(v[None]), K, pose[:, :3, :3],
                      pose[:, :3, 3][:, None, :], dist, S)
    faces_ndc = vertices_to_faces(vndc, jnp.asarray(f[None]))

    # --- 1. parity + timing -------------------------------------------
    t0 = time.perf_counter()
    out_x = rasterize_face_index(faces_ndc, S, far=100.0)
    _sync(out_x.depth_map)
    print(f"xla raster compile+run  {time.perf_counter() - t0:7.2f} s")
    t0 = time.perf_counter()
    for _ in range(5):
        out_x = rasterize_face_index(faces_ndc, S, far=100.0)
    _sync(out_x.depth_map)
    t_xla = (time.perf_counter() - t0) / 5
    print(f"xla raster steady       {t_xla * 1e3:7.1f} ms")

    t0 = time.perf_counter()
    out_p = rasterize_pallas(faces_ndc, S, far=100.0)
    _sync(out_p.depth_map)
    print(f"pallas raster compile   {time.perf_counter() - t0:7.2f} s")
    t0 = time.perf_counter()
    for _ in range(5):
        out_p = rasterize_pallas(faces_ndc, S, far=100.0)
    _sync(out_p.depth_map)
    t_pal = (time.perf_counter() - t0) / 5
    print(f"pallas raster steady    {t_pal * 1e3:7.1f} ms "
          f"({t_xla / max(t_pal, 1e-9):.1f}x vs xla)")

    fim_x = np.asarray(out_x.face_index_map)
    fim_p = np.asarray(out_p.face_index_map)
    agree = (fim_x == fim_p).mean()
    cov = (fim_p >= 0).mean()
    print(f"parity: face-index agreement {agree:.6f}, coverage {cov:.3f}")
    d_ok = np.allclose(
        np.asarray(out_x.depth_map), np.asarray(out_p.depth_map), rtol=1e-4
    )
    print("depth allclose:", d_ok)
    gates["rasterize_pallas"] = {
        "pass": bool(agree > 0.999 and d_ok),
        "face_index_agreement": round(float(agree), 6),
        "depth_allclose": bool(d_ok),
        "ms": round(t_pal * 1e3, 2),
        "xla_oracle_ms": round(t_xla * 1e3, 2),
    }

    # --- 2. full G-buffer ---------------------------------------------
    mesh = MeshBuffers(
        vertices=jnp.asarray(v), faces=jnp.asarray(f), vt=jnp.asarray(vt),
        f_vt_idx=jnp.asarray(f), vn=jnp.asarray(vn), f_vn_idx=jnp.asarray(f),
        span_max=jnp.asarray(1.0, jnp.float32),
    )
    t0 = time.perf_counter()
    gb = render_gbuffer(mesh, K, pose, dist, None, None, S)
    _sync(gb["uv_map"])
    print(f"gbuffer compile+run     {time.perf_counter() - t0:7.2f} s")
    t0 = time.perf_counter()
    for _ in range(5):
        gb = render_gbuffer(mesh, K, pose, dist, None, None, S)
    _sync(gb["uv_map"])
    t_gb = (time.perf_counter() - t0) / 5
    print(f"gbuffer steady          {t_gb * 1e3:7.1f} ms")
    alpha = np.asarray(gb["alpha_map"])
    gb_finite = all(np.isfinite(np.asarray(x)).all() for x in gb.values())
    print(f"gbuffer alpha coverage  {alpha.mean():7.3f}  finite: {gb_finite}")
    gates["render_gbuffer"] = {
        "pass": bool(gb_finite and alpha.mean() > 0.01),
        "ms": round(t_gb * 1e3, 2),
    }

    # --- 3. texture kernels on device ---------------------------------
    from rnr_tpu.ops.texture_pallas import (
        _chunk_coords, _chunk_values, _level_coords, _xla_gather_taps,
        _xla_scatter_taps, gather_taps, scatter_taps,
    )

    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.standard_normal((512, 512, 24)).astype(np.float32))
    uv = gb["uv_map"]  # real rendered uv — the actual index pattern
    xl, yl = _level_coords(uv, 512)
    xc, yc = _chunk_coords(xl, yl)
    got, ovf = gather_taps(xc, yc, tex)
    want = _xla_gather_taps(xc, yc, tex)
    rel = float(
        jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9)
    )
    print(f"gather_taps on-device rel err {rel:.4f} overflow {int(ovf)} "
          f"({'OK' if rel < 0.01 else 'FAIL'})")
    gates["texture_gather_taps"] = {
        "pass": bool(rel < 0.01 and int(ovf) == 0),
        "rel_err": round(rel, 6), "overflow": int(ovf),
    }
    g = jnp.asarray(rng.standard_normal((1, S, S, 24)).astype(np.float32))
    gc = _chunk_values(g)
    dt, ovf2 = scatter_taps(xc, yc, gc, 512, 512)
    dt_ref = _xla_scatter_taps(xc, yc, gc, 512, 512)
    rel2 = float(
        jnp.max(jnp.abs(dt - dt_ref)) / (jnp.max(jnp.abs(dt_ref)) + 1e-9)
    )
    print(f"scatter_taps on-device rel err {rel2:.4f} overflow {int(ovf2)} "
          f"({'OK' if rel2 < 0.01 else 'FAIL'})")
    gates["texture_scatter_taps"] = {
        "pass": bool(rel2 < 0.01 and int(ovf2) == 0),
        "rel_err": round(rel2, 6), "overflow": int(ovf2),
    }

    # --- 4. stratified kNN on device ----------------------------------
    from rnr_tpu.ops.knn_pallas import stratified_knn, stratified_knn_xla

    x = jnp.asarray(rng.standard_normal((7500, 3)).astype(np.float32))
    idx_p = np.asarray(stratified_knn(x, stratum=16))
    idx_x = np.asarray(stratified_knn_xla(x, stratum=16))
    agree_k = (idx_p == idx_x).mean()
    print(f"stratified_knn on-device agreement {agree_k:.4f} "
          f"({'OK' if agree_k > 0.99 else 'FAIL'})")
    gates["stratified_knn"] = {
        "pass": bool(agree_k > 0.99),
        "agreement": round(float(agree_k), 6),
    }

    # --- 5. differentiable raster (Pallas forward) fwd+bwd ------------
    from rnr_tpu.ops.edge_grad import rasterize_opt

    nf = 12000
    ctr = rng.uniform(-0.9, 0.9, (nf, 1, 2)).astype(np.float32)
    off = rng.uniform(-0.03, 0.03, (nf, 3, 2)).astype(np.float32)
    zz = rng.uniform(1.5, 3.0, (nf, 1, 1)).astype(np.float32)
    faces_opt = jnp.asarray(np.concatenate(
        [ctr + off, np.broadcast_to(zz, (nf, 3, 1))], axis=-1
    )[None])
    tex_opt = jnp.asarray(
        rng.uniform(0, 1, (1, nf, 2, 2, 2, 3)).astype(np.float32)
    )
    ro_fwd = jax.jit(lambda fc, t: rasterize_opt(
        fc, t, 512, anti_aliasing=False, near=0.1, far=100.0)["rgb"])
    out_f = ro_fwd(faces_opt, tex_opt)
    _sync(out_f)
    t0 = time.perf_counter()
    for _ in range(5):
        out_f = ro_fwd(faces_opt, tex_opt)
    _sync(out_f)
    t_rof = (time.perf_counter() - t0) / 5
    ro_bwd = jax.jit(jax.grad(
        lambda fc, t: jnp.sum(rasterize_opt(
            fc, t, 512, anti_aliasing=False, near=0.1, far=100.0
        )["rgb"] ** 2), argnums=(0, 1)))
    gf, gt = ro_bwd(faces_opt, tex_opt)
    _sync(gf)
    t0 = time.perf_counter()
    for _ in range(5):
        gf, gt = ro_bwd(faces_opt, tex_opt)
    _sync(gf)
    t_rob = (time.perf_counter() - t0) / 5
    rob_finite = bool(
        np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(gt)).all()
    )
    print(f"rasterize_opt 512^2/12k fwd {t_rof*1e3:7.1f} ms  "
          f"fwd+bwd {t_rob*1e3:7.1f} ms  grads finite: {rob_finite}")
    gates["rasterize_opt_diff"] = {
        "pass": rob_finite,
        "fwd_ms": round(t_rof * 1e3, 2),
        "fwdbwd_ms": round(t_rob * 1e3, 2),
        "config": "512^2, 12000 faces, rgb+alpha coverage grads",
    }

    write_record()
    assert all(g.get("pass") for g in gates.values()), gates


def _shmap_gate(gates, jax, jnp, _sync):
    """sh_shade wrapped in jax.shard_map on a 1-device mesh, on hardware.

    The multi-chip program now keeps the Pallas kernels via shard_map
    (parallel/sharding.py, ops/shmap.py); virtual-CPU tests pin the
    numerics in interpret mode but cannot exercise Mosaic codegen inside
    a shard_map body — this gate does, on the one real chip.
    """
    from rnr_tpu.models.rays import ray_render_sh
    from rnr_tpu.parallel import make_mesh
    from rnr_tpu.parallel.sharding import batch_sharding, replicated

    S2 = 512
    rngd = np.random.default_rng(5)
    d = rngd.standard_normal((1, S2, S2, 3, 26)).astype(np.float32)
    d /= np.linalg.norm(d, axis=3, keepdims=True)
    d = jnp.asarray(d)
    lt = jnp.asarray(
        rngd.uniform(0, 2, (1, S2, S2, 26, 3)).astype(np.float32))
    al = jnp.asarray(
        (rngd.uniform(size=(1, S2, S2, 1)) > 0.3).astype(np.float32))
    cf = jnp.asarray(rngd.standard_normal((121, 3)).astype(np.float32))
    alb = jnp.asarray(
        rngd.uniform(0, 1, (1, S2, S2, 3)).astype(np.float32))
    kw = dict(num_ray_diffuse=13, albedo_diffuse=alb,
              separate_albedo=True)

    mesh = make_mesh(1, dp=1)

    def loss(lt_, cf_, backend):
        return jnp.sum(ray_render_sh(
            alb, d, al, lt_, cf_, 10, backend=backend, **kw)["out"] ** 2)

    ref_v, (ref_gl, ref_gc) = jax.jit(jax.value_and_grad(
        lambda a, b: loss(a, b, "xla"), argnums=(0, 1)))(lt, cf)
    _sync(ref_gl)

    fn = jax.jit(jax.value_and_grad(
        lambda a, b: loss(a, b, "pallas"), argnums=(0, 1)))
    lt_s = jax.device_put(lt, batch_sharding(mesh, lt.ndim))
    cf_s = jax.device_put(cf, replicated(mesh))
    with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
        v, (gl, gc) = fn(lt_s, cf_s)
    _sync(gl)
    rel = float(max(
        abs(float(v) - float(ref_v)) / (abs(float(ref_v)) + 1e-9),
        np.max(np.abs(np.asarray(gl) - np.asarray(ref_gl)))
        / (np.max(np.abs(np.asarray(ref_gl))) + 1e-9),
        np.max(np.abs(np.asarray(gc) - np.asarray(ref_gc)))
        / (np.max(np.abs(np.asarray(ref_gc))) + 1e-9),
    ))
    t0 = time.perf_counter()
    for _ in range(3):
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            v, (gl, gc) = fn(lt_s, cf_s)
    _sync(gl)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"sh_shade under shard_map (1-dev mesh)  fwd+bwd {ms:7.1f} ms"
          f"  rel err vs xla {rel:.2e}", flush=True)
    gates["sh_shade_shard_map"] = {
        "pass": bool(rel < 1e-2),
        "rel_err_vs_xla": round(rel, 6),
        "fwdbwd_ms": round(ms, 2),
    }


def _sh_gate(gates, jax, jnp, _sync):
    from rnr_tpu.models.rays import ray_render_sh

    S2 = 512
    rngd = np.random.default_rng(1)
    d6 = rngd.standard_normal((1, S2, S2, 3, 26)).astype(np.float32)
    d6 /= np.linalg.norm(d6, axis=3, keepdims=True)
    d6 = jnp.asarray(d6)
    lt6 = jnp.asarray(
        rngd.uniform(0, 2, (1, S2, S2, 26, 3)).astype(np.float32))
    al6 = jnp.asarray(
        (rngd.uniform(size=(1, S2, S2, 1)) > 0.3).astype(np.float32))
    cf6 = jnp.asarray(rngd.standard_normal((121, 3)).astype(np.float32))
    alb6 = jnp.asarray(
        rngd.uniform(0, 1, (1, S2, S2, 3)).astype(np.float32))
    kw6 = dict(num_ray_diffuse=13, albedo_diffuse=alb6,
               separate_albedo=True)

    def run_sh(backend):
        f = jax.jit(lambda: ray_render_sh(
            alb6, d6, al6, lt6, cf6, 10, backend=backend, **kw6)["out"])
        out = f()
        _sync(out)
        # min of per-call synced timings — same discipline as the grad
        # cell below; the mean-of-5-one-sync pattern reported 45 ms for
        # a kernel whose fwd+bwd is 35 ms (r5 queue run: queue-drain
        # variance lands in whichever call the sync follows)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f()
            _sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"sh fwd[{backend}] per-call ms "
              f"{[round(t * 1e3, 1) for t in ts]}", flush=True)
        return np.asarray(out), min(ts)

    out_p, t_p = run_sh("pallas")
    out_x, t_x = run_sh("xla")
    rel_sh = float(np.max(np.abs(out_p - out_x))
                   / (np.max(np.abs(out_x)) + 1e-9))

    # fwd+bwd split cells, with the XLA backward as the reference column
    # (round-3 lesson: a single pallas fwd+bwd number with no reference
    # and no split let a 665 ms measurement artifact ship unquestioned —
    # VERDICT r3 item 2)
    def run_sh_grad(backend):
        g = jax.jit(jax.grad(lambda lt, cf: jnp.sum(ray_render_sh(
            alb6, d6, al6, lt, cf, 10, backend=backend, **kw6
        )["out"] ** 2), argnums=(0, 1)))
        gl, gc = g(lt6, cf6)
        _sync(gl)
        # per-call timings with a sync each call: the mean-of-5-unsynced
        # pattern hid WHICH call was slow when this cell measured 577 ms
        # while the identical fresh-process probe measured 18.8 ms; the
        # steady-state (min) is the kernel property, the list is logged
        # for dispatch/drain forensics
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            gl, gc = g(lt6, cf6)
            _sync(gl)
            ts.append(time.perf_counter() - t0)
        print(f"sh grad[{backend}] per-call ms "
              f"{[round(t * 1e3, 1) for t in ts]}", flush=True)
        return np.asarray(gl), np.asarray(gc), min(ts)

    gl_p, gc_p, t_pb = run_sh_grad("pallas")
    gl_x, gc_x, t_xb = run_sh_grad("xla")
    sh_finite = bool(np.isfinite(gl_p).all() and np.isfinite(gc_p).all())
    grad_rel = float(max(
        np.max(np.abs(gl_p - gl_x)) / (np.max(np.abs(gl_x)) + 1e-9),
        np.max(np.abs(gc_p - gc_x)) / (np.max(np.abs(gc_x)) + 1e-9),
    ))
    # bwd-only via the raw VJP impl on pre-transposed operands
    from rnr_tpu.ops.sh_pallas import _sh_shade_bwd_impl

    rd_t = jnp.transpose(d6, (0, 4, 3, 1, 2))
    rl_t = jnp.transpose(lt6, (0, 3, 4, 1, 2))
    al_t = jnp.transpose(al6, (0, 3, 1, 2))
    gs_t = jnp.ones((1, 3, S2, S2), jnp.float32)
    bwd = jax.jit(lambda: _sh_shade_bwd_impl(
        rd_t, rl_t, al_t, cf6, gs_t, gs_t, 10, 13, False))
    _sync(bwd())
    t0 = time.perf_counter()
    for _ in range(5):
        out_b = bwd()
    _sync(out_b)
    t_bo = (time.perf_counter() - t0) / 5
    # a fwd+bwd that disagrees with its parts by >2x is a measurement
    # artifact, not a kernel property — fail the gate so it gets rerun
    consistent = t_pb < 2.0 * (t_p + t_bo) + 0.02
    print(f"sh_shade 512^2/26rays  fwd {t_p*1e3:7.1f} ms (xla "
          f"{t_x*1e3:.1f})  bwd-only {t_bo*1e3:7.1f}  fwd+bwd "
          f"{t_pb*1e3:7.1f} ms (xla {t_xb*1e3:.1f})  rel err "
          f"{rel_sh:.5f} grad rel {grad_rel:.2e} finite {sh_finite} "
          f"consistent {consistent}")
    gates["sh_shade"] = {
        "pass": bool(rel_sh < 1e-3 and grad_rel < 1e-2 and sh_finite
                     and consistent),
        "rel_err": round(rel_sh, 6),
        "grad_rel_err": round(grad_rel, 6),
        "fwd_ms": round(t_p * 1e3, 2),
        "xla_fwd_ms": round(t_x * 1e3, 2),
        "bwdonly_ms": round(t_bo * 1e3, 2),
        "fwdbwd_ms": round(t_pb * 1e3, 2),
        "xla_fwdbwd_ms": round(t_xb * 1e3, 2),
    }

def _sh_fan_gate(gates, jax, jnp, _sync):
    """sh_shade_fan (in-kernel ray-fan construction) vs sh_shade on the
    XLA-composed fan — parity + fwd / fwd+bwd timings on device."""
    from rnr_tpu.models.rays import RaySampler
    from rnr_tpu.ops.sh_pallas import sh_shade, sh_shade_fan

    S2 = 512
    rng = np.random.default_rng(7)
    m = rng.standard_normal((1, S2, S2, 3, 3))
    q, _ = np.linalg.qr(m)
    tbn = jnp.asarray(q.astype(np.float32))
    vdt = rng.standard_normal((1, S2, S2, 3)).astype(np.float32)
    vdt = jnp.asarray(vdt / np.linalg.norm(vdt, axis=-1, keepdims=True))
    al = jnp.asarray(
        (rng.uniform(size=(1, S2, S2, 1)) > 0.3).astype(np.float32))
    cf = jnp.asarray(rng.standard_normal((121, 3)).astype(np.float32))
    spec = RaySampler(num_azi=6, num_polar=2, interval_polar=5.0,
                      mode="reflect")
    diff = RaySampler(num_azi=6, num_polar=2, interval_polar=10.0,
                      mode="diffuse")
    rd_s, _, _ = spec(tbn, vdt, al, with_uv=False)
    rd_d, _, _ = diff(tbn, vdt, al, with_uv=False)
    # f32 rays for the parity oracle: the shipped base path quantizes
    # rays to bf16 (--rays_dtype), and the lmax=10 basis amplifies that
    # ~0.4% direction error to ~8% pointwise (measured on CPU) — the fan
    # kernel computes directions in f32 in-kernel, so it must be scored
    # against the f32 base, not the bf16-corrupted one.
    rays_dir32 = jnp.concatenate([rd_s, rd_d], axis=-1)
    rays_dir = rays_dir32.astype(jnp.bfloat16)
    lt = jnp.asarray(
        rng.uniform(0, 2, (1, S2, S2, 26, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    pivots = jnp.asarray(np.concatenate(
        [spec.pivots_dir.T, diff.pivots_dir.T], axis=0
    ).astype(np.float32))
    r_spec = spec.num_ray

    base = jax.jit(lambda lt_: sh_shade(rays_dir, lt_, al, cf, 10,
                                        r_spec))
    base32 = jax.jit(lambda lt_: sh_shade(rays_dir32, lt_, al, cf, 10,
                                          r_spec))
    fan = jax.jit(lambda lt_: sh_shade_fan(tbn, vdt, al, lt_, cf,
                                           pivots, 10, r_spec))
    a, b = base32(lt), fan(lt)
    a16 = base(lt)
    _sync(a[0]); _sync(b[0]); _sync(a16[0])
    rel = float(np.max(np.abs(np.asarray(a[0]) - np.asarray(b[0])))
                / (np.max(np.abs(np.asarray(a[0]))) + 1e-9))
    # documented, not gated: how far the shipped bf16-ray base path sits
    # from the f32 oracle (the fan kernel removes this quantization)
    rel_bf16_base = float(
        np.max(np.abs(np.asarray(a[0]) - np.asarray(a16[0])))
        / (np.max(np.abs(np.asarray(a[0]))) + 1e-9))

    def t5(f, *args):
        out = f(*args)
        _sync(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(*args)
        _sync(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / 5

    t_base, t_fan = t5(base, lt), t5(fan, lt)

    gb = jax.jit(jax.grad(lambda lt_, cf_: jnp.sum(
        sh_shade(rays_dir32, lt_, al, cf_, 10, r_spec)[0] ** 2),
        argnums=(0, 1)))
    gf = jax.jit(jax.grad(lambda lt_, cf_: jnp.sum(
        sh_shade_fan(tbn, vdt, al, lt_, cf_, pivots, 10, r_spec)[0] ** 2),
        argnums=(0, 1)))
    glb, gcb = gb(lt, cf)
    glf, gcf = gf(lt, cf)
    _sync(glb); _sync(glf)
    grad_rel = float(max(
        np.max(np.abs(np.asarray(glf, np.float32)
                      - np.asarray(glb, np.float32)))
        / (np.max(np.abs(np.asarray(glb, np.float32))) + 1e-9),
        np.max(np.abs(np.asarray(gcf) - np.asarray(gcb)))
        / (np.max(np.abs(np.asarray(gcb))) + 1e-9),
    ))
    # time the SHIPPED base path (bf16 rays), not the f32 parity oracle
    gb16 = jax.jit(jax.grad(lambda lt_, cf_: jnp.sum(
        sh_shade(rays_dir, lt_, al, cf_, 10, r_spec)[0] ** 2),
        argnums=(0, 1)))
    gb16(lt, cf)
    t_bb, t_bf = t5(lambda: gb16(lt, cf)), t5(lambda: gf(lt, cf))
    finite = bool(np.isfinite(np.asarray(glf, np.float32)).all()
                  and np.isfinite(np.asarray(gcf)).all())
    print(f"sh_shade_fan 512^2/26rays  fwd {t_fan*1e3:7.1f} ms (base "
          f"{t_base*1e3:.1f})  fwd+bwd {t_bf*1e3:7.1f} ms (base "
          f"{t_bb*1e3:.1f})  rel {rel:.5f} grad rel {grad_rel:.2e}",
          flush=True)
    # tolerances: the fan path computes directions in f32 while the base
    # path quantizes them to bf16 first — small systematic differences
    # are expected and bounded
    gates["sh_shade_fan"] = {
        "pass": bool(rel < 2e-2 and grad_rel < 2e-2 and finite),
        "rel_err_vs_f32base": round(rel, 6),
        "bf16_rays_base_rel_err": round(rel_bf16_base, 6),
        "grad_rel_err": round(grad_rel, 6),
        "fwd_ms": round(t_fan * 1e3, 2),
        "base_fwd_ms": round(t_base * 1e3, 2),
        "fwdbwd_ms": round(t_bf * 1e3, 2),
        "base_fwdbwd_ms": round(t_bb * 1e3, 2),
    }


def _slab_conv_gate(gates, jax, jnp, _sync):
    """conv3x3s (row-im2col slab, one wide dot per tile) vs the XLA conv
    on device — the r5 conv-wall candidate."""
    from rnr_tpu.ops.conv_pallas import conv3x3s

    rows = {}
    ok = True
    rng = np.random.default_rng(9)
    for s, c, o in ((512, 108, 64), (512, 64, 64), (256, 128, 128)):
        x = jnp.asarray(
            rng.standard_normal((1, s, s, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, o)) * 0.1).astype(np.float32))
        b = jnp.asarray(np.zeros(o, np.float32))

        def xla_ref(x_, w_):
            xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
            return jax.lax.conv_general_dilated(
                xp, w_.astype(x_.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        f = jax.jit(lambda x_: conv3x3s(x_, w, b, "reflect", False, 0.2,
                                        False))
        r = jax.jit(lambda x_: xla_ref(x_, w))
        yp, yx = f(x), r(x)
        _sync(yp)
        rel = float(np.max(np.abs(np.asarray(yp, np.float32)
                                  - np.asarray(yx)))
                    / (np.max(np.abs(np.asarray(yx))) + 1e-9))
        t0 = time.perf_counter()
        for _ in range(10):
            yp = f(x)
        _sync(yp)
        t_p = (time.perf_counter() - t0) / 10
        # wgrad parity
        gw_p = jax.jit(jax.grad(lambda w_: jnp.sum(
            conv3x3s(x, w_, b, "reflect", False, 0.2, False)
            .astype(jnp.float32) ** 2)))(w)
        # all-f32 operands in the grad oracle: bf16 x + f32 cotangent
        # breaks conv_general_dilated's VJP (see conv_pallas.py:324)
        gw_x = jax.jit(jax.grad(lambda w_: jnp.sum(
            xla_ref(x.astype(jnp.float32), w_) ** 2)))(w)
        _sync(gw_p)
        wrel = float(np.max(np.abs(np.asarray(gw_p) - np.asarray(gw_x)))
                     / (np.max(np.abs(np.asarray(gw_x))) + 1e-9))
        key = f"slab_s{s}_c{c}_o{o}"
        rows[key] = {"fwd_rel_err": round(rel, 6),
                     "wgrad_rel_err": round(wrel, 6),
                     "fwd_ms": round(t_p * 1e3, 3),
                     "pass": bool(rel < 3e-2 and wrel < 3e-2)}
        ok = ok and rows[key]["pass"]
        print(f"conv3x3_slab[{key}] fwd {t_p*1e3:6.2f} ms rel {rel:.4f} "
              f"wgrad rel {wrel:.4f}", flush=True)

    # 4x4 slab pair: down4s + convt4s vs the XLA ops
    from rnr_tpu.ops.conv_pallas import (
        _xla_convt4, _xla_down4, convt4s, down4s,
    )

    xd = jnp.asarray(
        rng.standard_normal((1, 256, 256, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wd = jnp.asarray(
        (rng.standard_normal((4, 4, 64, 128)) / 32.0).astype(np.float32))
    yd = np.asarray(jax.jit(
        lambda x_: down4s(x_, wd, "reflect"))(xd).astype(jnp.float32))
    ydx = np.asarray(_xla_down4(xd, wd, "reflect"), np.float32)
    rel_d = float(np.max(np.abs(yd - ydx)) / (np.max(np.abs(ydx)) + 1e-9))
    xt = jnp.asarray(
        rng.standard_normal((1, 64, 64, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wtt = jnp.asarray(
        (rng.standard_normal((4, 4, 128, 64)) / 32.0).astype(np.float32))
    yt = np.asarray(jax.jit(
        lambda x_: convt4s(x_, wtt))(xt).astype(jnp.float32))
    ytx = np.asarray(_xla_convt4(xt, wtt), np.float32)
    rel_t = float(np.max(np.abs(yt - ytx)) / (np.max(np.abs(ytx)) + 1e-9))
    pair_ok = rel_d < 3e-2 and rel_t < 3e-2
    rows["down4s_convt4s"] = {"down4s_rel_err": round(rel_d, 6),
                              "convt4s_rel_err": round(rel_t, 6),
                              "pass": bool(pair_ok)}
    ok = ok and pair_ok
    print(f"down4s rel {rel_d:.4f}  convt4s rel {rel_t:.4f} "
          f"({'OK' if pair_ok else 'FAIL'})", flush=True)
    gates["conv3x3_slab"] = {"pass": bool(ok), **rows}


def _conv_gate(gates, jax, jnp, _sync):
    """Pallas 3x3 / down4 / convt4 vs the XLA conv oracles, on device.

    Channel counts are chosen to hit the lane-misaligned cases that the
    original im2col-concat formulation could not compile (C = 108 input
    layer, C = 64 top level) plus one lane-multiple case (C = 128).
    """
    from rnr_tpu.ops.conv_pallas import (
        _xla_convt4, _xla_down4, conv3x3, convt4, down4,
    )

    rng = np.random.default_rng(7)
    rows = {}
    ok = True

    def xla_conv3x3(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32),
            (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b[None, None, None, :]

    for c, o in ((108, 64), (64, 64), (128, 128)):
        x = jnp.asarray(
            rng.standard_normal((1, 128, 256, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, o)) / np.sqrt(9 * c))
            .astype(np.float32))
        b = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))

        f_p = jax.jit(lambda x_, w_, b_: conv3x3(
            x_, w_, b_, pad_mode="same", fuse_act=False))
        loss_p = jax.jit(jax.grad(
            lambda w_, b_: jnp.sum(conv3x3(
                x, w_, b_, pad_mode="same").astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        loss_x = jax.jit(jax.grad(
            lambda w_, b_: jnp.sum(
                xla_conv3x3(x, w_, b_) ** 2), argnums=(0, 1)))

        yp = np.asarray(f_p(x, w, b), np.float32)
        yx = np.asarray(xla_conv3x3(x, w, b), np.float32)
        rel = float(np.max(np.abs(yp - yx)) / (np.max(np.abs(yx)) + 1e-9))
        gw_p, _ = loss_p(w, b)
        gw_x, _ = loss_x(w, b)
        relg = float(jnp.max(jnp.abs(gw_p - gw_x))
                     / (jnp.max(jnp.abs(gw_x)) + 1e-9))
        # per-call min-of-5 with a synced warmup call: the r4 record's
        # first cell read 95.6 ms vs 5.7/8.2 for its same-size siblings
        # (pending device work from the parity fetches above polluted an
        # unsynced mean) — the steady-state min is the kernel property
        yp_t = f_p(x, w, b)
        _sync(yp_t)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            yp_t = f_p(x, w, b)
            _sync(yp_t)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        cell_ok = rel < 0.02 and relg < 0.02
        ok = ok and cell_ok
        rows[f"conv3x3_c{c}_o{o}"] = {
            "fwd_rel_err": round(rel, 5), "wgrad_rel_err": round(relg, 5),
            "fwd_ms": round(dt * 1e3, 3), "pass": bool(cell_ok),
        }
        print(f"conv3x3 c{c} o{o}: fwd rel {rel:.4f} wgrad rel {relg:.4f} "
              f"{dt*1e3:6.2f} ms ({'OK' if cell_ok else 'FAIL'})",
              flush=True)

    x4 = jnp.asarray(
        rng.standard_normal((1, 128, 256, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w4 = jnp.asarray(
        (rng.standard_normal((4, 4, 64, 128)) / 32.0).astype(np.float32))
    yd = np.asarray(
        jax.jit(down4)(x4, w4).astype(jnp.float32), np.float32)
    ydx = np.asarray(_xla_down4(x4, w4), np.float32)
    rel_d = float(np.max(np.abs(yd - ydx)) / (np.max(np.abs(ydx)) + 1e-9))
    wt = jnp.asarray(
        (rng.standard_normal((4, 4, 128, 64)) / 32.0).astype(np.float32))
    x5 = jnp.asarray(
        rng.standard_normal((1, 64, 128, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    yt = np.asarray(
        jax.jit(convt4)(x5, wt).astype(jnp.float32), np.float32)
    ytx = np.asarray(_xla_convt4(x5, wt), np.float32)
    rel_t = float(np.max(np.abs(yt - ytx)) / (np.max(np.abs(ytx)) + 1e-9))
    pair_ok = rel_d < 0.02 and rel_t < 0.02
    ok = ok and pair_ok
    rows["down4_convt4"] = {
        "down4_rel_err": round(rel_d, 5),
        "convt4_rel_err": round(rel_t, 5), "pass": bool(pair_ok),
    }
    print(f"down4 rel {rel_d:.4f}  convt4 rel {rel_t:.4f} "
          f"({'OK' if pair_ok else 'FAIL'})", flush=True)
    gates["unet_convs"] = {"pass": bool(ok), **rows}


if __name__ == "__main__":
    main()

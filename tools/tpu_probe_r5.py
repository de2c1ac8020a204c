"""Round-5 on-device probes.

Section A — the conv-wall CONTROL (VERDICT r4 item 1): pure Pallas GEMM
chains at exactly the 3x3 conv kernel's occupancy (M = TH*WPA slab rows,
bf16 operands, f32 accumulation, T back-to-back dots per grid cell like
the 9 taps), swept over (K, N).  If the (K=64, N=64) control also lands
at ~22 TF/s, the "conv wall" is a real MXU-occupancy property of the
shape; if it lands much higher, the conv kernel's schedule is leaving
throughput on the table.  XLA twins of each shape are timed next to the
Pallas cells.

Section B — ray-fan stage isolation (VERDICT r4 item 3): the XLA fan
(einsum formulation of models/rays.py) vs an elementwise reformulation,
fwd-only chains at 512^2 x 26 rays.

Section C — sh_shade vs sh_shade_fan (fan construction fused in-kernel):
fwd and fwd+bwd chains at canonical shapes.

All timings use the scalar-fetch sync discipline (CLAUDE.md): N
dispatches then one float(jnp.sum(small_leaf)).

Usage: timeout 3000 python tools/tpu_probe_r5.py [--out tools/out/probe_r5.json]
Env:   R5_SECTIONS=A,B,C to subset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS: dict = {"cells": {}}


def sync(x):
    return float(jnp.sum(x if x.ndim == 0 else x.reshape(-1)[:8]))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


# ---------------------------------------------------------------------------
# Section A: GEMM occupancy control
# ---------------------------------------------------------------------------

def _gemm_chain_kernel(rows, k, n_, taps):
    def kernel(x_ref, w_ref, out_ref):
        acc = jnp.zeros((rows, n_), jnp.float32)
        for t in range(taps):
            acc = acc + jnp.dot(
                x_ref[...], w_ref[t],
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("rows", "taps"))
def gemm_chain_pallas(x, w, rows, taps):
    """x [M, K], w [T, K, N]; per M-tile: T dots, accumulated."""
    m, k = x.shape
    n_ = w.shape[-1]
    kernel = _gemm_chain_kernel(rows, k, n_, taps)
    return pl.pallas_call(
        kernel,
        grid=(m // rows,),
        in_specs=[
            pl.BlockSpec((rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, n_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_), jnp.bfloat16),
    )(x, w)


@jax.jit
def gemm_chain_xla(x, w):
    acc = jnp.zeros((x.shape[0], w.shape[-1]), jnp.float32)
    for t in range(w.shape[0]):
        acc = acc + jnp.dot(x, w[t], preferred_element_type=jnp.float32)
    return acc.astype(jnp.bfloat16)


def section_a():
    # conv-kernel geometry: TH=16 rows x WPA=520 cols of a 512-wide image
    # tile -> 8320 slab rows; 9 taps per tile in the real kernel.
    rng = np.random.default_rng(0)
    # (K, N, taps): the real conv shapes first, then the occupancy sweep
    shapes = [
        (64, 64, 9),      # level-0 conv3x3 c64->o64 (the "wall" shape)
        (128, 64, 9),     # K doubled (row-slab im2col of C=64 would be 192)
        (192, 64, 9),     # K=3C row-slab
        (64, 128, 9),     # N doubled (tap pairing)
        (128, 128, 9),    # level-1 conv shape
        (192, 128, 9),    # row-slab + tap-pair target occupancy
        (256, 256, 9),
        (512, 512, 4),
    ]
    m_rows = 8320
    tiles = 16
    for k, n_, taps in shapes:
        # fit VMEM: x tile bf16 (2x buffered) + w + acc f32 + out
        rows = m_rows
        while (2 * rows * k * 2 + taps * k * n_ * 2 + rows * n_ * 4
               + 2 * rows * n_ * 2) > 13 * 1024 * 1024:
            rows //= 2
        m = rows * tiles
        x = jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((taps, k, n_)).astype(np.float32)
        ).astype(jnp.bfloat16)
        flops = 2.0 * m * k * n_ * taps
        for name, fn in (
            ("pallas", lambda: gemm_chain_pallas(x, w, rows, taps)),
            ("xla", lambda: gemm_chain_xla(x, w)),
        ):
            ms = timeit(lambda: fn(), iters=30)
            tfs = flops / (ms * 1e-3) / 1e12
            key = f"A_gemm_{name}_K{k}_N{n_}_T{taps}_rows{rows}"
            RESULTS["cells"][key] = {"ms": round(ms, 3),
                                     "tflops_s": round(tfs, 2)}
            print(key, RESULTS["cells"][key], flush=True)


# ---------------------------------------------------------------------------
# Section B: ray-fan stage formulations
# ---------------------------------------------------------------------------

def _fan_einsum(tbn, vdt, alpha, pivots_s, pivots_d):
    """The shipped models/rays.py formulation."""
    from rnr_tpu.ops.cameras import get_reflect_dir

    rdt_s = (get_reflect_dir(vdt[..., None], pivots_s, axis=-2)
             * alpha[..., None])
    rd_s = jnp.einsum("...ij,...jr->...ir", tbn, rdt_s)
    rd_d = jnp.einsum("...ij,jr->...ir", tbn, pivots_d)
    rd = jnp.concatenate([rd_s, rd_d], axis=-1)
    return rd / jnp.maximum(
        jnp.linalg.norm(rd, axis=-2, keepdims=True), 1e-12)


def _fan_elementwise(tbn, vdt, alpha, pivots_s, pivots_d):
    """Broadcast-only reformulation: no batched 3x3 einsum, every op is
    a lane-resident [N,H,W,R] elementwise."""
    pv = jnp.concatenate([pivots_s, pivots_d], axis=-1)     # [3, R]
    r_spec = pivots_s.shape[-1]
    vx, vy, vz = (vdt[..., 0:1], vdt[..., 1:2], vdt[..., 2:3])
    px, py, pz = pv[0][None, None, None], pv[1][None, None, None], \
        pv[2][None, None, None]
    dot = vx * px + vy * py + vz * pz
    rx = 2 * dot * px - vx
    ry = 2 * dot * py - vy
    rz = 2 * dot * pz - vz
    inv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz + 1e-24) * alpha
    spec = jnp.arange(pv.shape[-1]) < r_spec
    tx = jnp.where(spec, rx * inv, px)
    ty = jnp.where(spec, ry * inv, py)
    tz = jnp.where(spec, rz * inv, pz)
    wx = tbn[..., 0, 0:1] * tx + tbn[..., 0, 1:2] * ty + tbn[..., 0, 2:3] * tz
    wy = tbn[..., 1, 0:1] * tx + tbn[..., 1, 1:2] * ty + tbn[..., 1, 2:3] * tz
    wz = tbn[..., 2, 0:1] * tx + tbn[..., 2, 1:2] * ty + tbn[..., 2, 2:3] * tz
    inv_w = jax.lax.rsqrt(wx * wx + wy * wy + wz * wz + 1e-24)
    return jnp.stack([wx * inv_w, wy * inv_w, wz * inv_w], axis=-2)


def section_b():
    from rnr_tpu.models.rays import RaySampler

    rng = np.random.default_rng(1)
    n, h, w = 1, 512, 512
    m = rng.standard_normal((n, h, w, 3, 3))
    q, _ = np.linalg.qr(m)
    tbn = jnp.asarray(q.astype(np.float32))
    vdt = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    vdt = jnp.asarray(vdt / np.linalg.norm(vdt, axis=-1, keepdims=True))
    alpha = jnp.asarray(
        (rng.uniform(size=(n, h, w, 1)) > 0.2).astype(np.float32))
    spec = RaySampler(num_azi=6, num_polar=2, interval_polar=5.0,
                      mode="reflect")
    diff = RaySampler(num_azi=6, num_polar=2, interval_polar=10.0,
                      mode="diffuse")
    ps = jnp.asarray(spec.pivots_dir)
    pd = jnp.asarray(diff.pivots_dir)

    f1 = jax.jit(lambda: _fan_einsum(tbn, vdt, alpha, ps, pd))
    f2 = jax.jit(lambda: _fan_elementwise(tbn, vdt, alpha, ps, pd))
    # parity first (einsum path puts spec rays through the sampler's
    # normalize-then-alpha order; tolerate fp differences only)
    a, b = np.asarray(f1()), np.asarray(f2())
    RESULTS["cells"]["B_fan_formulation_maxdiff"] = float(
        np.abs(a - b).max())
    RESULTS["cells"]["B_fan_einsum_ms"] = round(timeit(f1), 3)
    RESULTS["cells"]["B_fan_elementwise_ms"] = round(timeit(f2), 3)
    # net_in layout variant: fan written straight into [N,H,W,R*3]
    f3 = jax.jit(lambda: jnp.swapaxes(
        _fan_elementwise(tbn, vdt, alpha, ps, pd), -1, -2
    ).reshape(n, h, w, -1).astype(jnp.bfloat16))
    f4 = jax.jit(lambda: jnp.swapaxes(
        _fan_einsum(tbn, vdt, alpha, ps, pd), -1, -2
    ).reshape(n, h, w, -1).astype(jnp.bfloat16))
    RESULTS["cells"]["B_fan_elementwise_netin_ms"] = round(timeit(f3), 3)
    RESULTS["cells"]["B_fan_einsum_netin_ms"] = round(timeit(f4), 3)
    for k, v in RESULTS["cells"].items():
        if k.startswith("B_"):
            print(k, v, flush=True)


# ---------------------------------------------------------------------------
# Section C: sh_shade vs sh_shade_fan
# ---------------------------------------------------------------------------

def section_c():
    from rnr_tpu.models.rays import RaySampler
    from rnr_tpu.ops.sh_pallas import sh_shade, sh_shade_fan

    rng = np.random.default_rng(2)
    n, h, w, c, lmax = 1, 512, 512, 3, 10
    m = rng.standard_normal((n, h, w, 3, 3))
    q, _ = np.linalg.qr(m)
    tbn = jnp.asarray(q.astype(np.float32))
    vdt = rng.standard_normal((n, h, w, 3)).astype(np.float32)
    vdt = jnp.asarray(vdt / np.linalg.norm(vdt, axis=-1, keepdims=True))
    alpha = jnp.asarray(
        (rng.uniform(size=(n, h, w, 1)) > 0.2).astype(np.float32))
    spec = RaySampler(num_azi=6, num_polar=2, interval_polar=5.0,
                      mode="reflect")
    diffs = RaySampler(num_azi=6, num_polar=2, interval_polar=10.0,
                       mode="diffuse")
    rd_s, _, _ = spec(tbn, vdt, alpha, with_uv=False)
    rd_d, _, _ = diffs(tbn, vdt, alpha, with_uv=False)
    rays_dir32 = jnp.concatenate([rd_s, rd_d], axis=-1)
    rays_dir = rays_dir32.astype(jnp.bfloat16)
    r_total = rays_dir.shape[-1]
    r_spec = spec.num_ray
    lt = jnp.asarray(
        rng.uniform(0, 2, (n, h, w, r_total, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    coeff = jnp.asarray(
        rng.standard_normal(((lmax + 1) ** 2, c)).astype(np.float32))
    pivots = jnp.asarray(np.concatenate(
        [spec.pivots_dir.T, diffs.pivots_dir.T], axis=0
    ).astype(np.float32))

    base_f = jax.jit(
        lambda lt_: sh_shade(rays_dir, lt_, alpha, coeff, lmax, r_spec))
    base32_f = jax.jit(
        lambda lt_: sh_shade(rays_dir32, lt_, alpha, coeff, lmax, r_spec))
    fan_f = jax.jit(
        lambda lt_: sh_shade_fan(tbn, vdt, alpha, lt_, coeff, pivots,
                                 lmax, r_spec))
    # parity vs the f32-rays base: the bf16-ray base carries ~8% of its
    # own quantization error through the lmax=10 basis (see tpu_smoke
    # _sh_fan_gate); the fan kernel builds directions in f32
    a = base32_f(lt)
    b = fan_f(lt)
    RESULTS["cells"]["C_fan_kernel_rel_err"] = float(
        np.abs(np.asarray(a[0]) - np.asarray(b[0])).max()
        / (np.abs(np.asarray(a[0])).max() + 1e-9))
    RESULTS["cells"]["C_sh_shade_fwd_ms"] = round(timeit(base_f, lt), 3)
    RESULTS["cells"]["C_sh_shade_fan_fwd_ms"] = round(timeit(fan_f, lt), 3)

    def loss_base(lt_, cf_):
        s, d = sh_shade(rays_dir, lt_, alpha, cf_, lmax, r_spec)
        return jnp.sum(s) + jnp.sum(d)

    def loss_fan(lt_, cf_):
        s, d = sh_shade_fan(tbn, vdt, alpha, lt_, cf_, pivots, lmax,
                            r_spec)
        return jnp.sum(s) + jnp.sum(d)

    gb = jax.jit(jax.grad(loss_base, argnums=(0, 1)))
    gf = jax.jit(jax.grad(loss_fan, argnums=(0, 1)))
    RESULTS["cells"]["C_sh_shade_fwdbwd_ms"] = round(
        timeit(lambda: gb(lt, coeff)), 3)
    RESULTS["cells"]["C_sh_shade_fan_fwdbwd_ms"] = round(
        timeit(lambda: gf(lt, coeff)), 3)
    # including the fan construction cost the base path pays in XLA
    fan_then_base = jax.jit(lambda lt_: sh_shade(
        jnp.concatenate([
            spec(tbn, vdt, alpha, with_uv=False)[0],
            diffs(tbn, vdt, alpha, with_uv=False)[0]], axis=-1
        ).astype(jnp.bfloat16),
        lt_, alpha, coeff, lmax, r_spec))
    RESULTS["cells"]["C_xlafan_plus_sh_shade_fwd_ms"] = round(
        timeit(fan_then_base, lt), 3)
    for k, v in RESULTS["cells"].items():
        if k.startswith("C_"):
            print(k, v, flush=True)


# ---------------------------------------------------------------------------
# Section D: tap-wise conv3x3 vs slab conv3x3s vs XLA
# ---------------------------------------------------------------------------

def section_d():
    from rnr_tpu.ops.conv_pallas import conv3x3, conv3x3s

    def xla_conv(x, w, b):
        # all-bf16 operands and output: preferred_element_type=f32 breaks
        # the VJP (f32 cotangent vs bf16 weights — conv_general_dilated
        # requires matching dtypes; see conv_pallas.py:324).  The MXU
        # accumulates bf16 convs in f32 internally either way.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return (jax.lax.conv_general_dilated(
            xp, w.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)[None, None, None, :])

    rng = np.random.default_rng(3)
    shapes = [(512, 108, 64), (512, 64, 64), (256, 128, 128),
              (128, 256, 256)]
    chain = 4
    for s, c, o in shapes:
        x = jnp.asarray(
            rng.standard_normal((1, s, s, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((3, 3, c, o)) * 0.1).astype(np.float32))
        b = jnp.asarray(np.zeros(o, np.float32))
        w2 = jnp.asarray(
            (rng.standard_normal((3, 3, o, o)) * 0.1).astype(np.float32))
        flops = 2.0 * s * s * 9 * (c * o + (chain - 1) * o * o)

        def make_chain(op):
            @jax.jit
            def f(x):
                y = op(x, w, b, "reflect", False, 0.2, False)
                for _ in range(chain - 1):
                    y = op(y, w2, b, "reflect", False, 0.2, False)
                return y
            return f

        @jax.jit
        def xla_chain(x):
            y = xla_conv(x, w, b)
            for _ in range(chain - 1):
                y = xla_conv(y, w2, b)
            return y

        for name, f in (("tap", make_chain(conv3x3)),
                        ("slab", make_chain(conv3x3s)),
                        ("xla", xla_chain)):
            ms = timeit(f, x, iters=20)
            tfs = flops / (ms * 1e-3) / 1e12
            key = f"D_conv_{name}_s{s}_c{c}_o{o}"
            RESULTS["cells"][key] = {"fwd_ms": round(ms, 3),
                                     "tflops_s": round(tfs, 2)}
            # fwd+bwd chain
            if name == "xla":
                def lfn(x, wa, wb):
                    y = xla_conv(x, wa, b)
                    for _ in range(chain - 1):
                        y = xla_conv(y, wb, b)
                    return jnp.sum(y.astype(jnp.float32))
            elif name == "tap":
                def lfn(x, wa, wb):
                    y = conv3x3(x, wa, b, "reflect", False, 0.2, False)
                    for _ in range(chain - 1):
                        y = conv3x3(y, wb, b, "reflect", False, 0.2,
                                    False)
                    return jnp.sum(y.astype(jnp.float32))
            else:
                def lfn(x, wa, wb):
                    y = conv3x3s(x, wa, b, "reflect", False, 0.2, False)
                    for _ in range(chain - 1):
                        y = conv3x3s(y, wb, b, "reflect", False, 0.2,
                                     False)
                    return jnp.sum(y.astype(jnp.float32))
            g = jax.jit(jax.grad(lfn, argnums=(0, 1, 2)))
            ms2 = timeit(lambda: g(x, w, w2), iters=10)
            tfs2 = 3 * flops / (ms2 * 1e-3) / 1e12
            RESULTS["cells"][key]["fwdbwd_ms"] = round(ms2, 3)
            RESULTS["cells"][key]["fwdbwd_tflops_s"] = round(tfs2, 2)
            print(key, RESULTS["cells"][key], flush=True)


# ---------------------------------------------------------------------------
# Section E: 4x4 stride-2 down conv — parity-tap vs slab vs XLA
# ---------------------------------------------------------------------------

def section_e():
    from rnr_tpu.ops.conv_pallas import _xla_down4, down4, down4s

    rng = np.random.default_rng(4)
    chain = 4
    for s, c, o in ((512, 64, 128), (256, 128, 256)):
        x = jnp.asarray(
            rng.standard_normal((1, s, s, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w1 = jnp.asarray(
            (rng.standard_normal((4, 4, c, o)) * 0.1).astype(np.float32))
        # chain alternates down + 1x1-ish reshape? keep it simple: o->o
        w2 = jnp.asarray(
            (rng.standard_normal((4, 4, o, o)) * 0.1).astype(np.float32))
        # FLOPs: down halves H,W each link
        flops = 0.0
        hh = s
        cc, oo = c, o
        for i in range(chain):
            hh //= 2
            flops += 2.0 * hh * hh * 16 * cc * oo
            cc, oo = o, o

        def make(op):
            @jax.jit
            def f(x):
                y = op(x, w1, "reflect", False)
                for _ in range(chain - 1):
                    y = op(y, w2, "reflect", False)
                return y
            return f

        @jax.jit
        def xla_chain(x):
            y = _xla_down4(x, w1, "reflect")
            for _ in range(chain - 1):
                y = _xla_down4(y, w2, "reflect")
            return y

        for name, f in (("tap", make(down4)), ("slab", make(down4s)),
                        ("xla", xla_chain)):
            ms = timeit(f, x, iters=20)
            tfs = flops / (ms * 1e-3) / 1e12
            key = f"E_down4_{name}_s{s}_c{c}_o{o}"
            RESULTS["cells"][key] = {"fwd_ms": round(ms, 3),
                                     "tflops_s": round(tfs, 2)}
            print(key, RESULTS["cells"][key], flush=True)

    # transpose conv: tap (parity outputs) vs slab vs XLA, decoder shapes
    from rnr_tpu.ops.conv_pallas import _xla_convt4, convt4, convt4s

    for s, c, o in ((64, 512, 256), (256, 128, 64)):
        x = jnp.asarray(
            rng.standard_normal((1, s, s, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w1 = jnp.asarray(
            (rng.standard_normal((4, 4, c, o)) * 0.1).astype(np.float32))
        flops = 2.0 * (2 * s) * (2 * s) * 4 * c * o  # 4 useful taps/outpx

        for name, op in (("tap", convt4), ("slab", convt4s),
                         ("xla", _xla_convt4)):
            if name == "xla":
                f = jax.jit(lambda x_: _xla_convt4(x_, w1))
            else:
                f = jax.jit(lambda x_, op=op: op(x_, w1))
            ms = timeit(f, x, iters=20)
            tfs = flops / (ms * 1e-3) / 1e12
            key = f"E_convt4_{name}_s{s}_c{c}_o{o}"
            RESULTS["cells"][key] = {"fwd_ms": round(ms, 3),
                                     "tflops_s": round(tfs, 2)}
            print(key, RESULTS["cells"][key], flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tools/out/probe_r5.json")
    args = ap.parse_args()
    sections = os.environ.get("R5_SECTIONS", "A,B,C,D,E").split(",")
    RESULTS["backend"] = jax.default_backend()
    print("backend:", RESULTS["backend"], flush=True)
    for s in sections:
        {"A": section_a, "B": section_b, "C": section_c,
         "D": section_d, "E": section_e}[s.strip()]()
        with open(args.out, "w") as f:
            json.dump(RESULTS, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

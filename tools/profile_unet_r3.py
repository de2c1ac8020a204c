"""Round-3 U-Net conv-wall profiler: per-shape conv timings on device.

Times every conv in the canonical 512^2 U-Net individually (fwd and
fwd+bwd), plus formulation variants (im2col matmul, SAME vs reflect,
f32 vs bf16), the non-conv tail ops, and rasterize_opt fwd+bwd at
512^2/12k faces.  Each op is chained CHAIN times inside one jit with a
data dependency so the ~3-6 ms dispatch floor amortizes away.

Writes tools/out/profile_unet_r3.json and prints a table.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

CHAIN = 8
STEPS = 3


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    results = {}
    key = jax.random.PRNGKey(0)

    def timeit(fn, *args):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])  # sync via scalar fetch
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
        return (time.perf_counter() - t0) / STEPS

    # ------------------------------------------------------------------
    # conv shapes of the canonical U-Net (b1, 512^2, nf0=64, dense fuse)
    # (name, H, W, Cin, Cout, k, stride, transpose)
    shapes = [
        ("in",        512, 512, 108,  64, 3, 1, False),
        ("enc0_prep", 512, 512,  64,  64, 3, 1, False),
        ("enc0_down", 512, 512,  64, 128, 4, 2, False),
        ("fuse_a",    256, 256, 128, 640, 3, 1, False),
        ("fuse_b",    256, 256, 640, 128, 3, 1, False),
        ("enc1_prep", 256, 256, 128, 128, 3, 1, False),
        ("enc1_down", 256, 256, 128, 256, 4, 2, False),
        ("enc2_prep", 128, 128, 256, 256, 3, 1, False),
        ("enc2_down", 128, 128, 256, 512, 4, 2, False),
        ("enc3_prep",  64,  64, 512, 512, 3, 1, False),
        ("enc3_down",  64,  64, 512, 512, 4, 2, False),
        ("enc4_prep",  32,  32, 512, 512, 3, 1, False),
        ("enc4_down",  32,  32, 512, 512, 4, 2, False),
        ("dec4_up",    16,  16, 512, 512, 4, 2, True),
        ("dec4_post",  32,  32, 512, 512, 3, 1, False),
        ("dec3_up",    32,  32,1024, 512, 4, 2, True),
        ("dec3_post",  64,  64, 512, 512, 3, 1, False),
        ("dec2_up",    64,  64,1024, 256, 4, 2, True),
        ("dec2_post", 128, 128, 256, 256, 3, 1, False),
        ("dec1_up",   128, 128, 512, 128, 4, 2, True),
        ("dec1_post", 256, 256, 128, 128, 3, 1, False),
        ("dec0_up",   256, 256, 256,  64, 4, 2, True),
        ("dec0_post", 512, 512,  64,  64, 3, 1, False),
        ("out",       512, 512, 128,  78, 3, 1, False),
    ]

    def conv_flops(h, w, cin, cout, k, s, tr):
        if tr:
            return 2.0 * h * w * k * k * cin * cout  # input-grid scatter
        return 2.0 * (h // s) * (w // s) * k * k * cin * cout

    def make_conv(cin, cout, k, s, tr, dtype, pad="SAME"):
        def f(x, wgt):
            if tr:
                return jax.lax.conv_transpose(
                    x, wgt, (s, s), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=dtype,
                )
            return jax.lax.conv_general_dilated(
                x, wgt, (s, s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype,
            )
        return f

    print("== per-conv timings (bf16, SAME pad) ==")
    conv_rows = {}
    for name, h, w, cin, cout, k, s, tr in shapes:
        dt = jnp.bfloat16
        x = jax.random.normal(key, (1, h, w, cin), dt)
        wgt = jax.random.normal(key, (k, k, cin, cout), dt) * 0.05
        conv = make_conv(cin, cout, k, s, tr, dt)

        @jax.jit
        def chain_fwd(x, wgt, conv=conv, cin=cin):
            y = x
            for _ in range(CHAIN):
                o = conv(y, wgt)
                # data dependency: fold output back into input shape
                y = x + jnp.mean(o).astype(x.dtype)
            return y

        @jax.jit
        def chain_bwd(x, wgt, conv=conv):
            def loss(x, wgt):
                y = x
                acc = 0.0
                for _ in range(CHAIN):
                    o = conv(y, wgt)
                    m = jnp.sum(o.astype(jnp.float32) ** 2)
                    acc = acc + m
                    y = x + (m * 1e-20).astype(x.dtype)
                return acc
            return jax.grad(loss, argnums=(0, 1))(x, wgt)

        t_f = timeit(chain_fwd, x, wgt) / CHAIN
        t_b = timeit(chain_bwd, x, wgt) / CHAIN
        gf = conv_flops(h, w, cin, cout, k, s, tr) / 1e9
        conv_rows[name] = {
            "fwd_ms": t_f * 1e3, "fwdbwd_ms": t_b * 1e3, "gflops": gf,
            "fwd_tfs": gf / t_f / 1e3, "fwdbwd_tfs": 3 * gf / t_b / 1e3,
        }
        print(f"{name:10s} {gf:7.1f} GF  fwd {t_f*1e3:7.2f} ms"
              f" ({gf/t_f/1e12*1e9:5.1f} TF/s)   fwd+bwd {t_b*1e3:7.2f} ms"
              f" ({3*gf/t_b/1e12*1e9:5.1f} TF/s)")
    results["convs"] = conv_rows

    # ------------------------------------------------------------------
    # variants on a representative low-channel big-spatial conv and the
    # fusion conv
    print("== variants ==")
    var_rows = {}

    def variant(name, fn, *args, gf=None):
        t = timeit(fn, *args) / CHAIN
        var_rows[name] = {"ms": t * 1e3}
        extra = f" ({gf/t/1e12*1e9:5.1f} TF/s)" if gf else ""
        print(f"{name:34s} {t*1e3:7.2f} ms{extra}")

    # enc0_prep f32
    x32 = jax.random.normal(key, (1, 512, 512, 64), jnp.float32)
    w32 = jax.random.normal(key, (3, 3, 64, 64), jnp.float32) * 0.05
    conv32 = make_conv(64, 64, 3, 1, False, jnp.float32)

    @jax.jit
    def chain32(x, wgt):
        y = x
        for _ in range(CHAIN):
            o = conv32(y, wgt)
            y = x + jnp.mean(o)
        return y
    variant("enc0_prep_f32_fwd", chain32, x32, w32, gf=19.3)

    # im2col matmul formulation of enc0_prep (bf16)
    xb = jax.random.normal(key, (1, 512, 512, 64), jnp.bfloat16)
    wb = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05

    @jax.jit
    def chain_im2col(x, wgt):
        wmat = wgt.reshape(9 * 64, 64)
        y = x
        for _ in range(CHAIN):
            xp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [
                xp[:, dy:dy + 512, dx:dx + 512, :]
                for dy in range(3) for dx in range(3)
            ]
            patches = jnp.concatenate(cols, axis=-1).reshape(512 * 512, 9 * 64)
            o = jnp.dot(patches, wmat, preferred_element_type=jnp.bfloat16)
            y = x + jnp.mean(o).astype(x.dtype)
        return y
    variant("enc0_prep_im2col_fwd", chain_im2col, xb, wb, gf=19.3)

    # fused 128-channel variant: what if nf0-level convs ran at 128ch?
    x128 = jax.random.normal(key, (1, 512, 512, 128), jnp.bfloat16)
    w128 = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16) * 0.05
    conv128 = make_conv(128, 128, 3, 1, False, jnp.bfloat16)

    @jax.jit
    def chain128(x, wgt):
        y = x
        for _ in range(CHAIN):
            o = conv128(y, wgt)
            y = x + jnp.mean(o).astype(x.dtype)
        return y
    variant("conv512sp_128ch_fwd", chain128, x128, w128, gf=77.3)

    # reflect-pad cost on enc0_prep
    convv = make_conv(64, 64, 3, 1, False, jnp.bfloat16, pad="VALID")

    @jax.jit
    def chain_refl(x, wgt):
        y = x
        for _ in range(CHAIN):
            xp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            o = convv(xp, wgt)
            y = x + jnp.mean(o).astype(x.dtype)
        return y
    variant("enc0_prep_reflect_fwd", chain_refl, xb, wb, gf=19.3)

    # dropout cost at 512^2 x 64
    @jax.jit
    def chain_dropout(x, k):
        y = x
        for i in range(CHAIN):
            k, sub = jax.random.split(k)
            mask = jax.random.bernoulli(sub, 0.9, y.shape)
            y = jnp.where(mask, y / 0.9, 0.0) + x * 1e-6
        return y
    variant("dropout_512sq64_per_app", chain_dropout, xb, key)

    # batch-act-norm cost at 512^2 x 64 (f32 stats)
    @jax.jit
    def chain_norm(x):
        y = x
        for _ in range(CHAIN):
            x32 = y.astype(jnp.float32)
            m = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
            v = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
            y = ((x32 - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)
            y = y + x * 1e-6
        return y
    variant("batchnorm_512sq64_per_app", chain_norm, xb)

    results["variants"] = var_rows

    # ------------------------------------------------------------------
    # whole U-Net fwd / fwd+bwd under both pad modes + remat (b1)
    print("== unet whole ==")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rnr_tpu.models.unet import RenderingNet

    unet_rows = {}
    for tag, pad_mode, train in [
        ("reflect_train", "reflect", True),
        ("same_train", "same", True),
    ]:
        net = RenderingNet(
            nf0=64, in_channels=108, out_channels=78, num_down_unet=5,
            use_gcn=True, norm="batch", compute_dtype="bfloat16",
            fuse_mode="dense", pad_mode=pad_mode,
        )
        xin = jax.random.normal(key, (1, 512, 512, 108), jnp.float32)
        vf = jax.random.normal(key, (1, 512), jnp.float32)
        vars_ = net.init({"params": key, "dropout": key}, xin, vf,
                         train=False)

        fwd = jax.jit(lambda v, x, f: net.apply(
            v, x, f, train=train, rngs={"dropout": key}))
        t_f = timeit(fwd, vars_, xin, vf)

        g = jax.jit(jax.grad(
            lambda v, x, f: jnp.sum(net.apply(
                v, x, f, train=train, rngs={"dropout": key}
            ).astype(jnp.float32) ** 2)
        ))
        t_b = timeit(g, vars_, xin, vf)
        unet_rows[tag] = {"fwd_ms": t_f * 1e3, "fwdbwd_ms": t_b * 1e3}
        print(f"unet[{tag}]  fwd {t_f*1e3:.1f} ms   fwd+bwd {t_b*1e3:.1f} ms")
    results["unet"] = unet_rows

    # ------------------------------------------------------------------
    # rasterize_opt fwd+bwd at 512^2 / 12k faces (VERDICT r2 item 3 artifact)
    print("== rasterize_opt on-device ==")
    from rnr_tpu.ops.edge_grad import rasterize_opt

    rng = np.random.default_rng(0)
    nf = 12000
    ctr = rng.uniform(-0.9, 0.9, (nf, 1, 2)).astype(np.float32)
    off = rng.uniform(-0.03, 0.03, (nf, 3, 2)).astype(np.float32)
    z = rng.uniform(1.5, 3.0, (nf, 1, 1)).astype(np.float32)
    faces_np = np.concatenate(
        [ctr + off, np.broadcast_to(z, (nf, 3, 1))], axis=-1
    )[None]
    faces = jnp.asarray(faces_np)
    tex = jnp.asarray(rng.uniform(0, 1, (1, nf, 2, 2, 2, 3)).astype(np.float32))

    ro_fwd = jax.jit(lambda f, t: rasterize_opt(
        f, t, 512, anti_aliasing=False, near=0.1, far=100.0)["rgb"])
    t_f = timeit(ro_fwd, faces, tex)
    ro_bwd = jax.jit(jax.grad(lambda f, t: jnp.sum(rasterize_opt(
        f, t, 512, anti_aliasing=False, near=0.1, far=100.0)["rgb"] ** 2),
        argnums=(0, 1)))
    t_b = timeit(ro_bwd, faces, tex)
    results["rasterize_opt_512_12k"] = {
        "fwd_ms": t_f * 1e3, "fwdbwd_ms": t_b * 1e3,
    }
    print(f"rasterize_opt 512^2/12k  fwd {t_f*1e3:.1f} ms"
          f"   fwd+bwd {t_b*1e3:.1f} ms")

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "out",
                            "profile_unet_r3.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

"""Round-3 on-device A/B suite: conv backend, rays dtype, remat modes.

One process (the TPU tunnel serves one client), sequential, everything
timed by scalar fetch.  Writes tools/out/tpu_bench_r3.json.

Sections (env-gated so a partial run still yields data):
  R3_UNET=1   U-Net fwd / fwd+bwd: xla vs pallas conv backend.
  R3_STEP=1   full 512^2 train step: {xla, pallas} x {f32, bf16 rays}.
  R3_BATCH=1  b2/b4 with remat none/wide/all (best backend from R3_STEP
              must be set via R3_BEST_CONV / R3_BEST_RAYS).
  R3_INFER=1  inference fps for the best config.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

STEPS = int(os.environ.get("R3_STEPS", 4))


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

    from __graft_entry__ import _build
    from rnr_tpu.train import create_rnr_state, make_rnr_train_step
    from rnr_tpu.train.steps import rnr_texture_flatten_init

    results: dict = {"backend": jax.default_backend()}
    key = jax.random.PRNGKey(0)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        float(jnp.asarray(leaf).ravel()[0])

    def timeit(fn, *args, steps=STEPS):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / steps

    # ------------------------------------------------------------- U-Net
    if int(os.environ.get("R3_UNET", 1)):
        from rnr_tpu.models.unet import RenderingNet

        rows = {}
        xin = jax.random.normal(key, (1, 512, 512, 108), jnp.float32)
        vf = jax.random.normal(key, (1, 512), jnp.float32)
        for backend in ("xla", "pallas"):
            for pad in ("reflect", "same"):
                net = RenderingNet(
                    nf0=64, in_channels=108, out_channels=78,
                    num_down_unet=5, use_gcn=True, norm="batch",
                    compute_dtype="bfloat16", fuse_mode="dense",
                    pad_mode=pad, conv_backend=backend,
                )
                vars_ = net.init(
                    {"params": key, "dropout": key}, xin, vf, train=False
                )
                fwd = jax.jit(lambda v, x, f, net=net: net.apply(
                    v, x, f, train=True, rngs={"dropout": key}))
                t_f = timeit(fwd, vars_, xin, vf)
                bwd = jax.jit(jax.grad(
                    lambda v, x, f, net=net: jnp.sum(net.apply(
                        v, x, f, train=True, rngs={"dropout": key}
                    ).astype(jnp.float32) ** 2)
                ))
                t_b = timeit(bwd, vars_, xin, vf)
                rows[f"{backend}_{pad}"] = {
                    "fwd_ms": round(t_f * 1e3, 2),
                    "fwdbwd_ms": round(t_b * 1e3, 2),
                }
                print(f"unet[{backend},{pad}] fwd {t_f*1e3:7.1f} ms  "
                      f"fwd+bwd {t_b*1e3:7.1f} ms", flush=True)
        results["unet"] = rows

    # --------------------------------------------------------- full step
    def build_step(batch_n, remat, conv_backend, rays_dtype,
                   sh_kernel="auto"):
        cfg, model, batch = _build(
            img_size=512, tex_size=512, lmax=10, num_sample=4096,
            nf0=64, num_down=5, gcn_blocks=20, gcn_v=7500,
            num_azi=6, num_polar=2, batch=batch_n, remat=remat,
            rays_dtype=rays_dtype, conv_backend=conv_backend,
            gcn_dtype=os.environ.get("R3_GCN_DTYPE", "float32"),
            sh_kernel=sh_kernel,
        )
        state, tx = create_rnr_state(
            model, jax.random.PRNGKey(0), batch, cfg.train.lr
        )
        nprng = np.random.default_rng(1)
        statics = {
            "l_samples_init": jnp.asarray(
                nprng.uniform(0, 1, (4096, 3)).astype(np.float32)),
            "l_samples_mask": jnp.asarray(
                (nprng.uniform(size=4096) > 0.3).astype(np.float32)),
            "tex_flatten_init": rnr_texture_flatten_init(
                model, state.params),
        }
        step = make_rnr_train_step(model, tx)
        return model, state, batch, statics, step

    def time_step(batch_n, remat, conv_backend, rays_dtype,
                  sh_kernel="auto"):
        model, state, batch, statics, step = build_step(
            batch_n, remat, conv_backend, rays_dtype, sh_kernel
        )
        rng = jax.random.key(
            2, impl=os.environ.get("R3_PRNG", "threefry2x32"))
        for _ in range(2):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, statics, sub)
        loss0 = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, statics, sub)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        return dt, loss0, (model, state, batch)

    if int(os.environ.get("R3_STEP", 1)):
        rows = {}
        # R3_STEP_CELLS="xla:float32,pallas:bfloat16" restricts the grid
        # (cold 512^2 full-step compiles are ~5 min each through the
        # tunnel; a deadline-bound queue can't always afford all four).
        cells_env = os.environ.get("R3_STEP_CELLS")
        if cells_env:
            step_cells = [tuple(c.split(":")) for c in
                          cells_env.split(",") if c]
        else:
            step_cells = [(cb, rd) for cb in ("xla", "pallas")
                          for rd in ("float32", "bfloat16")]
        gcn_suffix = ("+gcnbf16" if os.environ.get(
            "R3_GCN_DTYPE", "float32") == "bfloat16" else "")
        for cell in step_cells:
                conv_backend, rays_dtype = cell[0], cell[1]
                sh_kernel = cell[2] if len(cell) > 2 else "auto"
                sh_suffix = f"+sh_{sh_kernel}" if sh_kernel != "auto" \
                    else ""
                tag = f"{conv_backend}_{rays_dtype}{gcn_suffix}{sh_suffix}"
                try:
                    dt, loss0, _ = time_step(
                        1, False, conv_backend, rays_dtype, sh_kernel
                    )
                    rows[tag] = {
                        "ms": round(dt * 1e3, 1),
                        "fps": round(1.0 / dt, 3),
                        "loss_finite": bool(np.isfinite(loss0)),
                    }
                    print(f"step[{tag}] {dt*1e3:7.1f} ms "
                          f"({1/dt:.2f} fps)", flush=True)
                except Exception as e:  # keep gathering other cells
                    rows[tag] = {"error": repr(e)[:300]}
                    print(f"step[{tag}] FAILED {e!r}", flush=True)
        results["step_b1"] = rows

    if int(os.environ.get("R3_BATCH", 1)):
        best_conv = os.environ.get("R3_BEST_CONV", "xla")
        best_rays = os.environ.get("R3_BEST_RAYS", "bfloat16")
        rows = {}
        # R3_BATCH_CELLS="2:none,4:wide" restricts the grid (same cold
        # compile-cost rationale as R3_STEP_CELLS).
        bc_env = os.environ.get("R3_BATCH_CELLS")
        if bc_env:
            def _remat(s):
                return {"none": False, "false": False,
                        "all": True, "true": True}.get(s.lower(), s)
            batch_cells = [
                (int(c.split(":")[0]), _remat(c.split(":")[1]))
                for c in bc_env.split(",") if c
            ]
        else:
            batch_cells = [(2, False), (2, "wide"), (4, False),
                           (4, "wide"), (4, True)]
        for batch_n, remat in batch_cells:
            tag = f"b{batch_n}_remat_{remat}"
            try:
                dt, loss0, _ = time_step(
                    batch_n, remat, best_conv, best_rays
                )
                rows[tag] = {
                    "ms": round(dt * 1e3, 1),
                    "fps": round(batch_n / dt, 3),
                }
                print(f"step[{tag}] {dt*1e3:7.1f} ms "
                      f"({batch_n/dt:.2f} fps)", flush=True)
            except Exception as e:
                rows[tag] = {"error": repr(e)[:300]}
                print(f"step[{tag}] FAILED {e!r}", flush=True)
        results["batch"] = rows

    if int(os.environ.get("R3_INFER", 1)):
        from rnr_tpu.train.steps import make_rnr_eval_step

        best_conv = os.environ.get("R3_BEST_CONV", "xla")
        best_rays = os.environ.get("R3_BEST_RAYS", "bfloat16")
        model, state, batch, statics, _ = build_step(
            1, False, best_conv, best_rays
        )
        eval_step = make_rnr_eval_step(model)
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        v_feature = model.apply(
            variables, batch["gcn_pos"],
            method=lambda m, p_: m.compute_v_feature(p_),
        )
        out = eval_step(state, batch, v_feature=v_feature)
        sync(out["img"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = eval_step(state, batch, v_feature=v_feature)
        sync(out["img"])
        dt = (time.perf_counter() - t0) / STEPS
        results["infer"] = {
            "config": f"{best_conv}/{best_rays}",
            "ms": round(dt * 1e3, 2), "fps": round(1.0 / dt, 2),
        }
        print(f"infer[{best_conv}/{best_rays}] {dt*1e3:7.1f} ms "
              f"({1/dt:.1f} fps)", flush=True)

    os.makedirs(os.path.join(os.path.dirname(__file__), "out"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out",
                        os.environ.get("BENCH_JSON", "tpu_bench_r3.json"))
    # merge so the queue can run sections in separate invocations
    # without clobbering earlier results; dict-valued sections (step_b1,
    # batch) merge row-wise so a partial cell rerun keeps earlier rows —
    # the best-config picker must see ALL measured cells
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    for k, v in results.items():
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k].update(v)
        else:
            merged[k] = v
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()

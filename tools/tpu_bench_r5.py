"""Round-5 on-device step benchmarks (env-gated sections).

  R5_STEP=1    full 512^2 b1 train step over the round-5 levers:
               conv {pallas3, slab3, xla} x fan-fuse {on, off}
               (cells via R5_STEP_CELLS="conv:fan,..." e.g.
               "slab3:fan,pallas3:fan,pallas3:nofan,xla:fan")
  R5_BATCH=1   b2 / b4(remat wide) at R5_BEST_CONV/R5_BEST_FAN
  R5_INFER=1   eval step fps at the best config
  R5_1024=1    1024^2 train + infer at the best config

Timings: scalar-fetch sync only (CLAUDE.md).  Results merge into
tools/out/tpu_bench_r5.json so sections can run as separate queue
phases.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "tools/out/tpu_bench_r5.json"
STEPS = int(os.environ.get("R5_STEPS", 4))


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

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        float(jnp.asarray(leaf).ravel()[0])

    def build_step(batch_n, remat, conv_backend, fan, img=512,
                   graph_refresh_every=1):
        cfg, model, batch = _build(
            img_size=img, tex_size=512, lmax=10, num_sample=4096,
            nf0=64, num_down=5, gcn_blocks=20, gcn_v=7500,
            num_azi=6, num_polar=2, batch=batch_n, remat=remat,
            rays_dtype=os.environ.get("R5_RAYS_DTYPE", "bfloat16"),
            conv_backend=conv_backend,
            gcn_dtype="float32", sh_fan_fuse=fan,
            graph_refresh_every=graph_refresh_every,
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

    def time_step(batch_n, remat, conv_backend, fan, img=512,
                  graph_refresh_every=1):
        model, state, batch, statics, step = build_step(
            batch_n, remat, conv_backend, fan, img, graph_refresh_every
        )
        rng = jax.random.key(2, impl="threefry2x32")
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

    if int(os.environ.get("R5_STEP", 1)):
        cells_env = os.environ.get(
            "R5_STEP_CELLS",
            "slab3:fan,slab:fan,pallas3:fan,pallas3:nofan,xla:fan")
        rows = {}
        for cell in cells_env.split(","):
            # cell syntax: "<conv>:<fan|nofan>[:r<K>]" — the optional
            # third part sets graph_refresh_every=K (GCN block-graph
            # reuse; r2 measured equal quality at K=4)
            parts = cell.split(":")
            conv, fan_s = parts[0], parts[1]
            refresh = int(parts[2][1:]) if len(parts) > 2 else 1
            fan = fan_s == "fan"
            dt, loss0, _ = time_step(1, False, conv, fan,
                                     graph_refresh_every=refresh)
            # non-default rays dtype (R5_RAYS_DTYPE) gets its own cell
            # key so the merge can't overwrite the bf16 measurement
            rdt = os.environ.get("R5_RAYS_DTYPE", "bfloat16")
            key = cell if rdt == "bfloat16" else f"{cell}:{rdt}"
            rows[key] = {"ms": round(dt * 1e3, 1),
                         "fps": round(1.0 / dt, 3),
                         "loss_finite": bool(np.isfinite(loss0))}
            print(f"step_b1[{key}] {dt*1e3:7.1f} ms "
                  f"({1.0/dt:5.2f} fps)", flush=True)
        results["step_b1"] = rows

    best_conv = os.environ.get("R5_BEST_CONV", "pallas3")
    best_fan = os.environ.get("R5_BEST_FAN", "fan") == "fan"
    best_refresh = int(os.environ.get("R5_BEST_REFRESH", 1))

    if int(os.environ.get("R5_BATCH", 1)):
        rows = {}
        for bn, remat in ((2, False), (4, "wide")):
            dt, _, _ = time_step(bn, remat, best_conv, best_fan,
                                 graph_refresh_every=best_refresh)
            rows[f"b{bn}_remat_{remat}"] = {
                "ms": round(dt * 1e3, 1), "fps": round(bn / dt, 3)}
            print(f"batch[b{bn}] {dt*1e3:7.1f} ms "
                  f"({bn/dt:5.2f} fps)", flush=True)
        results["batch"] = rows

    if int(os.environ.get("R5_INFER", 1)):
        from rnr_tpu.train.steps import make_rnr_eval_step

        rows = {}
        for conv in dict.fromkeys([best_conv, "xla"]):
            cfg, model, batch = _build(
                img_size=512, tex_size=512, lmax=10, num_sample=4096,
                nf0=64, num_down=5, gcn_blocks=20, gcn_v=7500,
                num_azi=6, num_polar=2, batch=1,
                rays_dtype="bfloat16", conv_backend=conv,
                sh_fan_fuse=best_fan,
            )
            state, _ = create_rnr_state(
                model, jax.random.PRNGKey(0), batch, cfg.train.lr)
            variables = {"params": state.params,
                         "constants": state.constants,
                         "spectral": state.spectral}
            v_feature = model.apply(
                variables, batch["gcn_pos"],
                method=lambda mm, p_: mm.compute_v_feature(p_))
            estep = make_rnr_eval_step(model)
            out = estep(state, batch, v_feature=v_feature)
            sync(out["img"])
            t0 = time.perf_counter()
            for _ in range(STEPS * 2):
                out = estep(state, batch, v_feature=v_feature)
            sync(out["img"])
            dt = (time.perf_counter() - t0) / (STEPS * 2)
            rays = float(jnp.sum(batch["alpha_map"][0])) * 26
            rows[conv] = {"ms": round(dt * 1e3, 1),
                          "fps": round(1.0 / dt, 3),
                          "rays_per_s": round(rays / dt)}
            print(f"infer[{conv}] {dt*1e3:7.1f} ms "
                  f"({1.0/dt:5.2f} fps)", flush=True)
        results["infer"] = rows

    if int(os.environ.get("R5_1024", 0)):
        rows = {}
        dt, _, _ = time_step(1, "wide", best_conv, best_fan, img=1024,
                             graph_refresh_every=best_refresh)
        rows["train"] = {"ms": round(dt * 1e3, 1),
                         "fps": round(1.0 / dt, 3)}
        print(f"1024 train {dt*1e3:.1f} ms", flush=True)
        results["r1024"] = rows

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    for k, v in results.items():
        # merge at the cell level so a later single-cell run (e.g. the
        # followon's p3s4 arm) extends the A/B table instead of
        # replacing it
        if isinstance(v, dict) and isinstance(merged.get(k), dict):
            merged[k].update(v)
        else:
            merged[k] = v
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()

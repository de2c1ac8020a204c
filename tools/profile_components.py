"""Per-component timing of the RNR step on the current backend.

Times each stage of the flagship forward in isolation (gcn / texture /
ray sampling / unet / ray render / full fwd / full train step) so
optimization effort goes where the milliseconds are.

Usage: python tools/profile_components.py [--img 512] [--steps 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, steps=3, warmup=1, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    _force(out)
    return (time.perf_counter() - t0) / steps


def _force(x):
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel") else leaves[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--gcn_blocks", type=int, default=20)
    ap.add_argument("--gcn_v", type=int, default=7500)
    args = ap.parse_args()

    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build
    from rnr_tpu.train import create_rnr_state, make_rnr_train_step
    from rnr_tpu.train.steps import rnr_texture_flatten_init
    from rnr_tpu.models.gcn import DenseDeepGCN, GCNConfig, knn_graph
    from rnr_tpu.models.texture import TextureMapper
    from rnr_tpu.models.rays import RaySampler, ray_render

    cfg, model, batch = _build(
        img_size=args.img, tex_size=512, lmax=10, num_sample=4096,
        nf0=64, num_down=5, gcn_blocks=args.gcn_blocks, gcn_v=args.gcn_v,
        num_azi=6, num_polar=2,
    )
    key = jax.random.PRNGKey(0)
    state, tx = create_rnr_state(model, key, batch, cfg.train.lr)
    print(f"backend={jax.default_backend()} img={args.img}")

    variables = {
        "params": state.params, "constants": state.constants,
        "spectral": state.spectral,
    }

    # --- GCN alone ---
    gcn = DenseDeepGCN(
        GCNConfig(n_blocks=args.gcn_blocks, kernel_size=16, n_filters=64,
                  out_channels=512)
    )
    gcn_vars = {"params": state.params["gcn"],
                "spectral": state.spectral.get("gcn", {})}
    gcn_fn = jax.jit(
        lambda v, p: gcn.apply(v, p, train=False, mutable=["spectral"])[0]
    )
    t = timeit(gcn_fn, gcn_vars, batch["gcn_pos"], steps=args.steps)
    print(f"gcn_forward            {t * 1e3:9.1f} ms")

    # knn alone (one block's graph build)
    knn_fn = jax.jit(lambda x: knn_graph(x, 16 * args.gcn_blocks))
    feat = jax.random.normal(key, (args.gcn_v, 64))
    t = timeit(knn_fn, feat, steps=args.steps)
    print(f"knn_topk(k={16 * args.gcn_blocks:4d})      {t * 1e3:9.1f} ms")

    # --- texture ---
    tm = TextureMapper(texture_size=512, texture_num_ch=24, mipmap_level=4,
                       apply_sh=True)
    tex_fn = jax.jit(
        lambda p, uv, shb: tm.apply({"params": p}, uv, shb, sh_start_ch=6)
    )
    t = timeit(tex_fn, state.params["texture_mapper"], batch["uv_map"],
               batch["sh_basis_map"], steps=args.steps)
    print(f"texture_sample         {t * 1e3:9.1f} ms")

    # --- rays ---
    rs = RaySampler(num_azi=6, num_polar=2, interval_polar=5)
    rs_fn = jax.jit(lambda t_, v, a: rs(t_, v, a))
    t = timeit(rs_fn, batch["TBN_map"], batch["view_dir_map_tangent"],
               batch["alpha_map"], steps=args.steps)
    print(f"ray_sampler            {t * 1e3:9.1f} ms")

    rays_dir, rays_uv, _ = rs_fn(
        batch["TBN_map"], batch["view_dir_map_tangent"], batch["alpha_map"]
    )
    n, h, w = batch["alpha_map"].shape[:3]
    rays_lt = jax.random.uniform(key, (n, h, w, rs.num_ray, 3))
    lp = jax.random.uniform(key, (1, 256, 512, 3))
    alb = jax.random.uniform(key, (n, h, w, 3))
    rr_fn = jax.jit(
        lambda a, uv, lt, l: ray_render(a, uv, lt, l)["out"]
    )
    t = timeit(rr_fn, alb, rays_uv, rays_lt, lp, steps=args.steps)
    print(f"ray_render(13 rays)    {t * 1e3:9.1f} ms")

    # --- backward passes of the differentiable hot ops ---
    tex_grad = jax.jit(
        jax.grad(
            lambda p, uv, shb: jnp.sum(
                tm.apply({"params": p}, uv, shb, sh_start_ch=6) ** 2
            )
        )
    )
    t = timeit(tex_grad, state.params["texture_mapper"], batch["uv_map"],
               batch["sh_basis_map"], steps=args.steps)
    print(f"texture_backward       {t * 1e3:9.1f} ms")

    rr_grad = jax.jit(
        jax.grad(
            lambda a, uv, lt, l: jnp.sum(ray_render(a, uv, lt, l)["out"] ** 2),
            argnums=(0, 2, 3),
        )
    )
    t = timeit(rr_grad, alb, rays_uv, rays_lt, lp, steps=args.steps)
    print(f"ray_render_backward    {t * 1e3:9.1f} ms")

    # --- direct-SH shading (the actual training path) ---
    from rnr_tpu.models.rays import ray_render_sh

    coeff = jax.random.uniform(key, (121, 3))
    rays_dir_full = jnp.concatenate([rays_dir, rays_dir], axis=-1)
    rays_lt_full = jax.random.uniform(key, (n, h, w, 2 * rs.num_ray, 3))
    sh_fn = jax.jit(
        lambda a, d, al, lt, c: ray_render_sh(
            a, d, al, lt, c, 10, num_ray_diffuse=rs.num_ray,
            albedo_diffuse=a, separate_albedo=True,
        )["out"]
    )
    t = timeit(sh_fn, alb, rays_dir_full, batch["alpha_map"],
               rays_lt_full, coeff, steps=args.steps)
    print(f"ray_render_sh_fwd      {t * 1e3:9.1f} ms")
    sh_grad = jax.jit(
        jax.grad(
            lambda a, d, al, lt, c: jnp.sum(
                ray_render_sh(a, d, al, lt, c, 10,
                              num_ray_diffuse=rs.num_ray,
                              albedo_diffuse=a,
                              separate_albedo=True)["out"] ** 2
            ),
            argnums=(0, 3, 4),
        )
    )
    t = timeit(sh_grad, alb, rays_dir_full, batch["alpha_map"],
               rays_lt_full, coeff, steps=args.steps)
    print(f"ray_render_sh_bwd      {t * 1e3:9.1f} ms")

    # --- U-Net (rendering net) fwd/bwd ---
    rn_in = jax.random.uniform(
        key, (n, h, w, cfg.render_net_in_channels), jnp.float32
    )
    v_fea = jax.random.uniform(key, (n, 512))
    rn_fn = jax.jit(
        lambda v, x, f: model.apply(
            v, x, f,
            method=lambda m, x_, f_: m.render_net(x_, f_, train=False),
        )
    )
    rn_vars = {"params": state.params, "constants": state.constants,
               "spectral": state.spectral}
    t = timeit(rn_fn, rn_vars, rn_in, v_fea, steps=args.steps)
    print(f"unet_forward           {t * 1e3:9.1f} ms")
    rn_grad = jax.jit(
        jax.grad(
            lambda v, x, f: jnp.sum(
                model.apply(
                    v, x, f,
                    method=lambda m, x_, f_: m.render_net(
                        x_, f_, train=False
                    ),
                ) ** 2
            )
        )
    )
    t = timeit(rn_grad, rn_vars, rn_in, v_fea, steps=args.steps)
    print(f"unet_fwd+bwd           {t * 1e3:9.1f} ms")

    # --- full forward / train step ---
    fwd = jax.jit(
        lambda v, b: model.apply(v, b, lighting_idx=0, train=False,
                                 mutable=["spectral"])[0]["img"]
    )
    t = timeit(fwd, variables, batch, steps=args.steps)
    print(f"full_forward           {t * 1e3:9.1f} ms")

    import jax.numpy as jnp
    nprng = np.random.default_rng(1)
    statics = {
        "l_samples_init": jnp.asarray(
            nprng.uniform(0, 1, (4096, 3)).astype(np.float32)),
        "l_samples_mask": jnp.asarray(
            (nprng.uniform(size=4096) > 0.3).astype(np.float32)),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    step = make_rnr_train_step(model, tx)

    # the train step donates its incoming state — thread the new state
    # through a cell so repeated timing calls don't reuse a dead buffer
    cur = {"state": state}

    def run_step(_s, b, st, r):
        ns, m = step(cur["state"], b, st, r)
        cur["state"] = ns
        return m["loss"]

    t = timeit(run_step, state, batch, statics, key, steps=args.steps)
    print(f"full_train_step        {t * 1e3:9.1f} ms")

    # --- losses+grads WITHOUT the optimizer update / metrics ---
    # full_train_step minus this cell = Adam update + masked metrics;
    # this cell minus full_forward ~= backward + loss terms
    from rnr_tpu.train.steps import make_rnr_loss_fn

    loss_fn = make_rnr_loss_fn(model)

    @jax.jit
    def grads_cell(params, st, b, stt, r):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, st, b, stt, r)
        return loss, grads

    t = timeit(grads_cell, cur["state"].params, cur["state"], batch,
               statics, key, steps=args.steps)
    print(f"loss_and_grads         {t * 1e3:9.1f} ms")

    @jax.jit
    def loss_cell(params, st, b, stt, r):
        return loss_fn(params, st, b, stt, r)[0]

    t = timeit(loss_cell, cur["state"].params, cur["state"], batch,
               statics, key, steps=args.steps)
    print(f"loss_forward           {t * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()

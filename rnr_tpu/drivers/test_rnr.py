"""Free-viewpoint (re)lighting inference driver.

Counterpart of reference `test_rnr.py`: loads a training checkpoint +
config snapshot, rasterizes each test view on the fly (full G-buffer in
one XLA program — no precompute dependency), runs the RNR forward under
one or many lightings (novel probes supported via --lp_dir), composites an
optional probe background, writes PNGs and prints per-stage timings
(t_prep / t_raster / t_network_render fused, or the reference's full
granularity with --per_stage_timing: t_prep / t_raster / t_preproc /
t_sh / t_texture / t_rays / t_network / t_render — a superset of the
reference's six buckets, test_rnr.py:280-374; all synchronized by
scalar fetches).

Usage:
  python -m rnr_tpu.drivers.test_rnr --data_root DATA \
      --checkpoint_dir LOGDIR [--lighting_idx 0] [--lp_dir _/light_probe]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from rnr_tpu.drivers.common import (
    resolve, cond_mkdir, setup_jax, save_png, load_sphere_samples,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", required=True,
                   help="training log dir holding params.json + *.ckpt")
    p.add_argument("--checkpoint_name", type=str, default="model_final.ckpt")
    p.add_argument("--calib_fp", type=str, default="_/calib.mat")
    # reference-compat (test_rnr.py:35): a directory containing
    # calib.mat; overrides --calib_fp when given
    p.add_argument("--calib_dir", type=str, default=None)
    p.add_argument("--obj_high_fp", type=str, default="_/mesh.obj")
    p.add_argument("--obj_gcn_fp", type=str, default="_/mesh_7500v.obj")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--img_gamma", type=float, default=1.0)
    p.add_argument("--sampling_pattern", type=str, default="all")
    p.add_argument("--lighting_idx", type=int, default=None,
                   help="render under this learned lighting (default: all)")
    p.add_argument("--lp_dir", type=str, default=None,
                   help="directory of novel light probes to relight with")
    # SH band limit for projecting novel probes at inference; None = the
    # checkpoint's training lmax (reference test_rnr.py:28 --sh_lmax,
    # default 10)
    p.add_argument("--sh_lmax", type=int, default=None)
    # reference-compat alias (test_rnr.py:26 --lighting_type): "SH"
    # projects --lp_dir probes through the direct-SH path (== --lp_sh
    # true), "train" renders under the trained lighting (== no lp_dir)
    p.add_argument("--lighting_type", type=str, default=None,
                   choices=["SH", "train"])
    p.add_argument("--lp_sh", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"],
                   help="project novel probes onto SH and relight through "
                        "the fast direct-SH path (reference "
                        "test_rnr.py:153-163); false = raw probe gather")
    p.add_argument("--per_stage_timing", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"],
                   help="time texture/rays/unet/render as separate "
                        "programs (reference test_rnr.py:280-374 "
                        "granularity) instead of the fused step")
    p.add_argument("--sphere_samples_fp", type=str,
                   default="./sphere_samples_4096.mat")
    # --save_img_bg is the reference's name for the same switch
    # (test_rnr.py:46); --force_recompute is accepted and ignored
    # (G-buffers are computed on the fly every frame, nothing cached)
    p.add_argument("--save_img_bg", default=None,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--force_recompute", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--save_lp_background", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    # reference-script compatibility: --gpu_id selects CUDA devices in
    # the reference; accepted and ignored here (TPU/platform flags
    # control placement).  --calib_format only has one valid value in
    # the reference (dataio.py:45-52).
    p.add_argument("--gpu_id", type=str, default=None)
    p.add_argument("--calib_format", type=str, default="convert",
                   choices=["convert"])
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="tile-shard each frame over the first N devices")
    p.add_argument("--mesh_dp", type=int, default=1)
    return p


def _reconcile_sh_bands(sh_coeffs, nb_train: int):
    """Match a probe's SH projection to the checkpoint's basis count.

    The render path evaluates the training-lmax basis, so a lower
    --sh_lmax projection relights band-limited (the missing high bands
    are zero-padded) and a higher one truncates to the trained bands.
    sh_coeffs: [L, B, C] -> [L, nb_train, C].
    """
    import jax.numpy as jnp

    if sh_coeffs.shape[1] < nb_train:
        pad = jnp.zeros(
            (sh_coeffs.shape[0], nb_train - sh_coeffs.shape[1],
             sh_coeffs.shape[2]), sh_coeffs.dtype,
        )
        return jnp.concatenate([sh_coeffs, pad], axis=1)
    return sh_coeffs[:, :nb_train]


def main(argv=None) -> None:
    opt = build_argparser().parse_args(argv)
    setup_jax(opt.platform)

    import cv2
    import scipy.io
    import jax
    import jax.numpy as jnp

    from rnr_tpu.config import RNRConfig, load_config
    from rnr_tpu.data import Mesh, ViewDataset, LightProbeDataset, load_obj
    from rnr_tpu.models.rnr import RNRModel
    from rnr_tpu.models.lighting import LightingLP
    from rnr_tpu.ops.gbuffer import make_mesh_buffers, render_gbuffer
    from rnr_tpu.ops.spherical import spherical_mapping
    from rnr_tpu.ops.interpolate import interpolate_bilinear
    from rnr_tpu.train import create_rnr_state, load_checkpoint
    from rnr_tpu.train.steps import make_rnr_eval_step

    if opt.calib_dir:
        opt.calib_fp = os.path.join(
            resolve(opt.calib_dir, opt.data_root), "calib.mat")
    opt.calib_fp = resolve(opt.calib_fp, opt.data_root)
    if opt.save_img_bg is not None:
        opt.save_lp_background = opt.save_img_bg
    opt.obj_high_fp = resolve(opt.obj_high_fp, opt.data_root)
    opt.obj_gcn_fp = resolve(opt.obj_gcn_fp, opt.data_root)
    opt.lp_dir = resolve(opt.lp_dir, opt.data_root)

    # config + checkpoint (reference rebuilds modules from params.txt,
    # test_rnr.py:53-79)
    cfg: RNRConfig = load_config(
        RNRConfig, os.path.join(opt.checkpoint_dir, "params.json")
    )
    l_dir = load_sphere_samples(
        resolve(opt.sphere_samples_fp, opt.data_root)
    )
    model = RNRModel(cfg=cfg, l_dir=l_dir)

    calib = scipy.io.loadmat(opt.calib_fp)
    global_RT = calib["global_RT"].astype(np.float32)
    mesh = Mesh(opt.obj_high_fp, global_RT=global_RT)
    mesh_buf = make_mesh_buffers(mesh)
    gcn_pos = load_obj(opt.obj_gcn_fp).v

    ds = ViewDataset(
        root_dir=opt.data_root, calib_path=opt.calib_fp,
        img_dir=None, load_img=False,
        img_size=(opt.img_size, opt.img_size),
        sampling_pattern=opt.sampling_pattern,
    )

    # rebuild state structure and restore
    ds.buffer_one()
    v0 = ds.views_all[0]
    t0 = time.time()
    gb0 = _gbuffer(render_gbuffer, mesh_buf, v0, opt.img_size)
    batch0 = _to_batch(gb0, gcn_pos)
    state, _ = create_rnr_state(
        model, jax.random.PRNGKey(0), batch0, cfg.train.lr
    )
    state = load_checkpoint(
        os.path.join(opt.checkpoint_dir, opt.checkpoint_name), state
    )
    print(f"restored checkpoint ({time.time() - t0:.1f}s)")

    eval_step = make_rnr_eval_step(model)
    if opt.mesh_devices:
        from rnr_tpu.parallel import make_mesh, make_sharded_rnr_eval_step

        mesh = make_mesh(opt.mesh_devices, dp=opt.mesh_dp)
        eval_step = make_sharded_rnr_eval_step(model, mesh)
        print("tile-sharded inference over mesh", mesh.devices.shape)

    # the GCN feature is view-independent: compute once for the sequence
    v_feature = None
    if cfg.use_gcn:
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        v_feature = model.apply(
            variables, jnp.asarray(gcn_pos),
            method=lambda m, p_: m.compute_v_feature(p_),
        )

    # reference-compat --lighting_type mapping
    if opt.lighting_type == "SH":
        opt.lp_sh = True
    elif opt.lighting_type == "train":
        opt.lp_dir = None
        if opt.lighting_idx is None:
            # the checkpoint's trained lighting index, like the
            # reference's int(params['lighting_idx']) (test_rnr.py:239)
            opt.lighting_idx = cfg.lighting.lighting_idx or 0

    # lightings to render under: (name, lp probe | None, sh coeff | None)
    lps = []
    if opt.lp_dir is not None and os.path.isdir(opt.lp_dir):
        lp_ds = LightProbeDataset(opt.lp_dir, img_gamma=opt.img_gamma)
        lp_ds.buffer_all()
        probes = np.stack([lp_ds[i]["lp_img"] for i in range(len(lp_ds))])
        sh_coeffs = None
        if opt.lp_sh:
            # fit the probes to SH once and relight through the direct-SH
            # path, like the reference projects novel probes through
            # LightingSH (test_rnr.py:153-163)
            lp_model = LightingLP(l_dir=l_dir, lps=probes)
            lp_vars = lp_model.init(jax.random.PRNGKey(0))
            sh_coeffs = lp_model.apply(
                lp_vars,
                method=lambda m: m.fit_sh(
                    cfg.lighting.sh_lmax if opt.sh_lmax is None
                    else opt.sh_lmax
                ),
            )
            sh_coeffs = _reconcile_sh_bands(
                sh_coeffs, (cfg.lighting.sh_lmax + 1) ** 2
            )
        for i in range(len(lp_ds)):
            lps.append((
                "novel%02d" % i,
                jnp.asarray(probes[i][None]),
                None if sh_coeffs is None else sh_coeffs[i],
            ))
    elif opt.lighting_idx is not None:
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        lp = model.apply(
            variables, opt.lighting_idx, True,
            method=lambda m, i, l: m.lighting(i, is_lp=l),
        )
        lps.append((f"learned{opt.lighting_idx}", lp, None))
    else:
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        for i in range(cfg.lighting.num_lighting):
            lp = model.apply(
                variables, i, True,
                method=lambda m, idx, l: m.lighting(idx, is_lp=l),
            )
            lps.append((f"learned{i}", lp, None))

    out_dir = opt.out_dir or os.path.join(
        opt.checkpoint_dir, f"test_seq_{opt.sampling_pattern}"
    )
    for name, _, _ in lps:
        cond_mkdir(os.path.join(out_dir, name))

    # Timing uses scalar fetches to synchronize: block_until_ready can
    # return early on the axon backend (CLAUDE.md pitfall), so every
    # bucket boundary fetches a device scalar instead.
    def sync(x):
        return float(jnp.sum(x[(0,) * (x.ndim - 1)][..., :1]))

    staged = _make_staged(model, state) if opt.per_stage_timing else None

    print(f"rendering {len(ds)} views under {len(lps)} lightings")
    for i in range(len(ds)):
        t0 = time.time()
        view = ds.read_view(i)
        batch_host_done = time.time()
        stage_times = {}
        if staged is not None:
            # reference-granularity G-buffer buckets (test_rnr.py:280-374):
            # t_raster = projection + z-buffer alone; t_preproc = the map
            # interpolation/TBN/view-dir work; t_sh = per-pixel SH basis.
            # Differencing two fused programs keeps each measured program
            # realistic (XLA fusion intact within it).
            from rnr_tpu.ops.gbuffer import render_raster

            tr0 = time.time()
            raster_only = _gbuffer(render_raster, mesh_buf, view,
                                   opt.img_size)
            sync(raster_only.alpha_map)
            t_raster = time.time() - tr0
            tr0 = time.time()
            gb_nosh = _gbuffer(render_gbuffer, mesh_buf, view,
                               opt.img_size, with_sh=False)
            sync(gb_nosh["alpha_map"])
            t_nosh = time.time() - tr0
            tr0 = time.time()
            gb = _gbuffer(render_gbuffer, mesh_buf, view, opt.img_size)
            sync(gb["alpha_map"])
            t_full = time.time() - tr0
            stage_times["t_preproc"] = max(t_nosh - t_raster, 0.0)
            stage_times["t_sh"] = max(t_full - t_nosh, 0.0)
        else:
            gb = _gbuffer(render_gbuffer, mesh_buf, view, opt.img_size)
            sync(gb["alpha_map"])
            t_raster = time.time() - batch_host_done
        if "raster_overflow" in gb and int(np.asarray(
                gb["raster_overflow"]).sum()):
            print(f"WARNING view {i}: raster tile-binning overflow — "
                  "render incomplete, raise max_faces_per_tile")
        batch = _to_batch(gb, gcn_pos)
        t_prep = batch_host_done - t0

        times = dict(stage_times)
        t0 = time.time()
        for name, lp, sh_coeff in lps:
            if staged is not None:
                out, stage_times = staged(
                    batch, lp, sh_coeff, v_feature
                )
                for k, v in stage_times.items():
                    times[k] = times.get(k, 0.0) + v
            else:
                out = eval_step(state, batch, lp_override=lp, relight=True,
                                v_feature=v_feature, sh_override=sh_coeff)
            img = np.asarray(out["img"][0])
            alpha = np.asarray(gb["alpha_map"][0])[..., None]
            img = img * alpha
            if opt.save_lp_background:
                # probe lookup along the camera rays (test_rnr.py:380-393)
                vd = jnp.asarray(np.asarray(gb["view_dir_map"][0]))
                uv = spherical_mapping(-jnp.moveaxis(vd, -1, 0))
                lp0 = lp[0]
                bgx = jnp.clip(uv[0] * lp0.shape[1], None, lp0.shape[1] - 1)
                bgy = jnp.clip(uv[1] * lp0.shape[0], None, lp0.shape[0] - 1)
                bg = np.asarray(interpolate_bilinear(lp0, bgx, bgy))
                img = img + bg * (1.0 - alpha)
            save_png(
                os.path.join(out_dir, name, view["img_fn"].split(".")[0] + ".png"),
                img,
            )
        t_net = time.time() - t0
        stage_str = "".join(f"  {k} {v:.3f}" for k, v in times.items())
        print(
            f"view {i:04d}  t_prep {t_prep:.3f}  t_raster {t_raster:.3f}  "
            f"t_network_render {t_net:.3f}{stage_str}"
        )
    print("wrote", out_dir)


def _make_staged(model, state):
    """Per-stage timed forward (reference test_rnr.py:280-374 buckets).

    Splits the fused inference program into separately-jitted stages —
    texture sampling, ray fans, U-Net, SH shading + ray composition —
    each synchronized by a scalar fetch, so the printed buckets reflect
    real device time per component.  Slower overall than the fused step
    (loses XLA cross-stage fusion); for diagnostics only.
    """
    import jax
    import jax.numpy as jnp
    import time

    variables = {
        "params": state.params, "constants": state.constants,
        "spectral": state.spectral,
    }
    c = model.cfg

    @jax.jit
    def stage_texture(batch):
        return model.apply(
            variables, batch["uv_map"], batch["sh_basis_map"],
            method=lambda m, uv, shb: m.texture_mapper(
                uv, shb, sh_start_ch=6
            ),
        )

    @jax.jit
    def stage_rays(batch):
        def run(m, tbn, vdt, alpha):
            ds_, us_, _ = m.ray_sampler(tbn, vdt, alpha)
            dd_, ud_, _ = m.ray_sampler_diffuse(tbn, vdt, alpha)
            return (jnp.concatenate([ds_, dd_], -1),
                    jnp.concatenate([us_, ud_], -1))
        return model.apply(
            variables, batch["TBN_map"], batch["view_dir_map_tangent"],
            batch["alpha_map"], method=run,
        )

    @jax.jit
    def stage_network(batch, neural_img, rays_dir, v_feature):
        def run(m, b, ni, rd, vf):
            n, h, w = b["alpha_map"].shape[:3]
            r_total = rd.shape[-1]
            if vf is not None:
                vf = jnp.broadcast_to(vf, (n, vf.shape[-1]))
            net_in = jnp.concatenate(
                [jnp.swapaxes(rd, -1, -2).reshape(n, h, w, r_total * 3),
                 b["normal_map"], b["view_dir_map"], ni], axis=-1)
            lt = m.render_net(net_in, vf, train=False)
            rays_lt = lt.reshape(n, h, w, r_total, 3)
            return (rays_lt * 0.5 + 0.5) * c.rays.lt_max_val
        return model.apply(
            variables, batch, neural_img, rays_dir, v_feature, method=run,
        )

    @jax.jit
    def stage_render_sh(batch, neural_img, rays_dir, rays_lt, sh_coeff):
        from rnr_tpu.models.rays import ray_render_sh
        return ray_render_sh(
            neural_img[..., 3:6], rays_dir, batch["alpha_map"], rays_lt,
            sh_coeff, c.lighting.sh_lmax,
            num_ray_diffuse=c.rays.num_azi * c.rays.num_polar + 1,
            albedo_diffuse=neural_img[..., 0:3], separate_albedo=True,
        )

    @jax.jit
    def stage_render_lp(batch, neural_img, rays_uv, rays_lt, lp):
        from rnr_tpu.models.rays import ray_render
        return ray_render(
            neural_img[..., 3:6], rays_uv, rays_lt, lp,
            num_ray_diffuse=c.rays.num_azi * c.rays.num_polar + 1,
            albedo_diffuse=neural_img[..., 0:3], separate_albedo=True,
        )

    def sync(x):
        return float(jnp.sum(jnp.ravel(x)[:1]))

    def run(batch, lp, sh_coeff, v_feature):
        times = {}
        t0 = time.time()
        neural_img = stage_texture(batch)
        sync(neural_img)
        times["t_texture"] = time.time() - t0

        t0 = time.time()
        rays_dir, rays_uv = stage_rays(batch)
        sync(rays_dir)
        times["t_rays"] = time.time() - t0

        t0 = time.time()
        rays_lt = stage_network(batch, neural_img, rays_dir, v_feature)
        sync(rays_lt)
        times["t_network"] = time.time() - t0

        t0 = time.time()
        if sh_coeff is not None:
            rendered = stage_render_sh(
                batch, neural_img, rays_dir, rays_lt, sh_coeff
            )
        else:
            rendered = stage_render_lp(
                batch, neural_img, rays_uv, rays_lt, lp
            )
        sync(rendered["out"])
        times["t_render"] = time.time() - t0
        return {"img": rendered["out"]}, times

    return run


def _gbuffer(render_fn, mesh_buf, view, img_size, **kw):
    import jax.numpy as jnp

    return render_fn(
        mesh_buf,
        jnp.asarray(view["proj"][None]),
        jnp.asarray(view["pose"][None]),
        jnp.asarray(view["dist_coeffs"][None, :5]),
        None,
        None,
        img_size,
        **kw,
    )


def _to_batch(gb, gcn_pos):
    import jax.numpy as jnp

    return {
        "uv_map": gb["uv_map"],
        "sh_basis_map": gb["sh_basis_map"][..., :9],
        "normal_map": gb["normal_map"],
        "view_dir_map": gb["view_dir_map"],
        "view_dir_map_tangent": gb["view_dir_map_tangent"],
        "TBN_map": gb["TBN_map"],
        "alpha_map": gb["alpha_map"][..., None],
        "img_gt": jnp.zeros_like(gb["normal_map"]),
        "gcn_pos": jnp.asarray(gcn_pos),
    }


if __name__ == "__main__":
    main()

"""Relightable Neural Renderer training driver.

Counterpart of reference `train_rnr.py`: full RNR training with SH
lighting estimation, GCN light-transport prior, specular+diffuse ray fans
and the four-loss objective, plus per-iteration metrics, a relighting
validation channel and periodic checkpoints.  One jit-compiled step, one
Adam over everything.

Adds `--synthetic` for data-free smoke runs and `--platform cpu`.

Usage:
  python -m rnr_tpu.drivers.train_rnr --data_root DATA --lighting_idx 0 \
      --lighting_relight_idx 1 [--sampling_pattern skipinv_10] ...
  python -m rnr_tpu.drivers.train_rnr --synthetic --max_iter 10
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np

from rnr_tpu.drivers.common import (
    resolve, cond_mkdir, setup_jax, save_png, load_sphere_samples,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # general / paths (train_rnr.py:30-46)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--logging_root", type=str, default=None)
    p.add_argument("--calib_fp", type=str, default="_/calib.mat")
    p.add_argument("--obj_high_fp", type=str, default="_/mesh.obj")
    p.add_argument("--obj_low_fp", type=str, default="_/mesh_7500v.obj")
    p.add_argument("--obj_gcn_fp", type=str, default="_/mesh_7500v.obj")
    p.add_argument("--tex_fp", type=str, default="_/tex.png")
    # view data
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--img_gamma", type=float, default=1.0)
    # texture
    p.add_argument("--texture_size", type=int, default=512)
    p.add_argument("--texture_num_ch", type=int, default=24)
    p.add_argument("--mipmap_level", type=int, default=4)
    p.add_argument("--init_tex", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--fix_tex", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--apply_sh", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    # lighting
    p.add_argument("--lp_dir", type=str, default=None)
    p.add_argument("--sphere_samples_fp", type=str,
                   default="./sphere_samples_4096.mat")
    p.add_argument("--sh_lmax", type=int, default=10)
    p.add_argument("--fix_lighting", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--init_lighting", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--lighting_idx", default=None, type=int)
    p.add_argument("--lighting_relight_idx", default=None, type=int)
    # render net
    p.add_argument("--nf0", type=int, default=64)
    p.add_argument("--gcn_compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="EdgeConv gather/matmul dtype (graphs stay f32)")
    p.add_argument("--rays_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of the per-ray tensors (bf16 "
                        "halves their HBM traffic; reductions stay f32)")
    p.add_argument("--sh_fan_fuse", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"],
                   help="construct the ray fan inside the Pallas SH "
                        "kernel (f32 directions, no rays_dir read)")
    def _remat_arg(x):
        v = str(x).lower()
        if v in ("wide", "all", "none"):
            return False if v == "none" else v
        if v in ("true", "1", "false", "0"):
            return v in ("true", "1")
        raise argparse.ArgumentTypeError(
            f"--unet_remat must be false|true|all|wide|none, got {x!r}"
        )
    p.add_argument("--unet_remat", default=False, type=_remat_arg,
                   help="rematerialize U-Net blocks: false | all/true | "
                        "wide (two widest levels only — needed for "
                        "batch>=4 at 512^2 on one chip)")
    p.add_argument("--unet_fuse_mode", default="dense",
                   choices=["concat", "dense"],
                   help="GCN fusion structure: reference concat block or "
                        "the dense-collapsed TPU variant")
    p.add_argument("--unet_compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="U-Net conv compute dtype (params stay f32)")
    p.add_argument("--unet_conv_backend", default="auto",
                   choices=["auto", "xla", "pallas", "pallas3", "slab3",
                            "slab", "p3s4", "pallas_interpret"],
                   help="U-Net conv backend (pallas = the fused "
                        "implicit-GEMM kernels for 3x3 AND the 4x4 "
                        "stride-2 pair; pallas3 = Pallas 3x3 only, XLA "
                        "4x4 — the 3x3 kernel beats the XLA emitter "
                        "~25%% in isolation, convdot_probe_r4; slab3 = "
                        "the row-im2col slab 3x3 kernel, one full-"
                        "occupancy [3C x 3O] dot per tile)")
    p.add_argument("--unet_pad_mode", default="reflect",
                   choices=["reflect", "same"],
                   help="U-Net conv padding: reflect = reference parity; "
                        "same = faster zero-padded convs")
    # gcn (train_rnr.py:84-95)
    p.add_argument("--in_channels", default=6, type=int,
                   help="GCN input channels (pos+feature; train_rnr.py:84)")
    p.add_argument("--kernel_size", default=16, type=int)
    p.add_argument("--n_filters", default=64, type=int)
    p.add_argument("--n_blocks", default=20, type=int)
    p.add_argument("--epsilon", default=0.2, type=float)
    p.add_argument("--stochastic", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--out_channels_gcn", default=512, type=int)
    # graph backbone structure (reference train_rnr.py:86-90); the
    # reference CLI default for --norm_type is 'batch' — rnr_tpu defaults
    # to 'none' (see PARITY.md "Known deltas")
    p.add_argument("--block_type", default="res", type=str,
                   choices=["res", "dense"])
    p.add_argument("--conv_type", default="edge", type=str,
                   choices=["edge", "mr"])
    p.add_argument("--act_type", default="relu", type=str,
                   choices=["relu", "leakyrelu", "prelu"])
    p.add_argument("--norm_type", default="none", type=str,
                   choices=["none", "batch", "instance"])
    p.add_argument("--bias", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--use_gcn", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--knn_approx", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--knn_recall", default=0.9, type=float)
    p.add_argument("--graph_refresh_every", default=1, type=int)
    p.add_argument("--strat_min_dilation", default=3, type=int,
                   help="dilation threshold for Pallas stratified-kNN "
                        "graphs; 0 = reference windowed top-k everywhere")
    p.add_argument("--stratum_width", default=16, type=int)
    # losses
    p.add_argument("--loss_lighting_weight", type=float, default=1.0)
    p.add_argument("--loss_lighting_uncovered_weight", type=float, default=0.1)
    p.add_argument("--loss_rays_lt_chrom_weight", type=float, default=1.0)
    p.add_argument("--loss_alb_weight", type=float, default=1.0)
    # training
    p.add_argument("--max_epoch", type=int, default=2000)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--sampling_pattern", type=str, default="all")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--sampling_pattern_val", type=str, default="all")
    p.add_argument("--val_freq", type=int, default=1000)
    p.add_argument("--exp_name", type=str, default="")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--log_freq", type=int, default=100)
    p.add_argument("--ckp_freq", type=int, default=5000)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    # reference-script compatibility: --gpu_id selects CUDA devices in
    # the reference; accepted and ignored here (TPU/platform flags
    # control placement).  --calib_format only has one valid value in
    # the reference (dataio.py:45-52).
    p.add_argument("--gpu_id", type=str, default=None)
    p.add_argument("--calib_format", type=str, default="convert",
                   choices=["convert"])
    p.add_argument("--synthetic", action="store_true")
    # device-resident training set: stack the RAM-buffered views in HBM
    # once and gather batches with on-device indexing — zero per-iter
    # host->device traffic ("auto" enables it when the set fits in 4 GB
    # and the run is single-device; host batch path otherwise)
    p.add_argument("--device_view_buffer", type=str, default="auto",
                   choices=["auto", "on", "off"])
    # multi-chip
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="shard the step over the first N devices")
    p.add_argument("--mesh_dp", type=int, default=1)
    # multi-host (run the same command on every host; see
    # parallel/distributed.py)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="HOST:PORT of process 0; enables multi-host")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--local_device_count", type=int, default=None,
                   help="force N virtual CPU devices per process "
                        "(multi-host testing without hardware)")
    return p


VIEW_KEYS = (
    "uv_map", "sh_basis_map", "normal_map", "view_dir_map",
    "view_dir_map_tangent", "TBN_map",
)


def make_rnr_batch(views: list[dict], gcn_pos: np.ndarray):
    import jax.numpy as jnp

    batch = {
        k: jnp.asarray(np.stack([np.asarray(v[k]) for v in views]))
        for k in VIEW_KEYS
    }
    batch["alpha_map"] = jnp.asarray(
        np.stack([np.asarray(v["alpha_map"]) for v in views])
    )[..., None]
    batch["img_gt"] = jnp.asarray(
        np.stack([np.asarray(v["img_gt"]) for v in views])
    )
    batch["gcn_pos"] = jnp.asarray(gcn_pos)
    return batch


def _synthetic_views(rng, n, s):
    views = []
    for _ in range(n):
        normal = rng.standard_normal((s, s, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        views.append(
            {
                "uv_map": rng.uniform(0, 1, (s, s, 2)).astype(np.float32),
                "sh_basis_map": rng.uniform(-1, 1, (s, s, 9)).astype(np.float32),
                "normal_map": normal,
                "view_dir_map": normal.copy(),
                "view_dir_map_tangent": np.broadcast_to(
                    np.asarray([0, 0, 1], np.float32), (s, s, 3)
                ).copy(),
                "TBN_map": np.broadcast_to(
                    np.eye(3, dtype=np.float32), (s, s, 3, 3)
                ).copy(),
                "alpha_map": np.ones((s, s), np.float32),
                "img_gt": rng.uniform(0, 1, (s, s, 3)).astype(np.float32),
            }
        )
    return views


def main(argv=None) -> None:
    opt = build_argparser().parse_args(argv)
    setup_jax(opt.platform)

    from rnr_tpu.parallel.distributed import (
        init_distributed, is_main_process, fetch_global,
    )

    distributed = init_distributed(
        opt.coordinator_address, opt.num_processes, opt.process_id,
        opt.local_device_count,
    )

    import jax

    if distributed:
        print(
            f"process {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    import jax.numpy as jnp
    from rnr_tpu.config import (
        RNRConfig, TextureConfig, LightingConfig, RaysConfig,
        GCNTrainConfig, RenderNetConfig, LossConfig, TrainConfig,
        save_config,
    )
    from rnr_tpu.models.rnr import RNRModel
    from rnr_tpu.models.lighting import LightingLP
    from rnr_tpu.ops.sh import evaluate_sh_basis, fit_sh_coeff
    from rnr_tpu.ops.interpolate import interpolate_bilinear
    from rnr_tpu.ops.spherical import spherical_mapping
    from rnr_tpu.train import (
        create_rnr_state, make_rnr_train_step, make_rnr_eval_step,
        save_checkpoint, load_checkpoint,
    )
    from rnr_tpu.train.steps import rnr_texture_flatten_init
    from rnr_tpu.ops.metrics import masked_err_metrics

    synthetic = opt.synthetic
    has_lighting_gt = opt.lighting_idx is not None
    lighting_idx = opt.lighting_idx if opt.lighting_idx is not None else 0
    has_relight = opt.lighting_relight_idx is not None

    # ------------- light directions -------------
    sphere_fp = resolve(opt.sphere_samples_fp, opt.data_root or ".")
    l_dir = load_sphere_samples(sphere_fp)  # [3, S]
    num_sample = l_dir.shape[1]

    # ------------- data -------------
    if synthetic:
        s = opt.img_size
        rng_np = np.random.default_rng(opt.seed)
        train_views = _synthetic_views(rng_np, 6, s)
        val_views = _synthetic_views(rng_np, 2, s)
        gcn_pos = rng_np.standard_normal((512, 3)).astype(np.float32)
        num_lighting = 2
        l_samples_init = rng_np.uniform(0, 1, (num_sample, 3)).astype(np.float32)
        l_samples_mask = (rng_np.uniform(size=num_sample) > 0.3).astype(np.float32)
        init_coeff = None
        lp_fit_coeff = None
        texture_init = None
        lp_relight = None
        relight_views = None
        log_root = opt.logging_root or "/tmp/rnr_tpu_logs/rnr_synth"
    else:
        import cv2
        import scipy.io
        from rnr_tpu.data import ViewDataset, LightProbeDataset, load_obj

        opt.calib_fp = resolve(opt.calib_fp, opt.data_root)
        opt.obj_high_fp = resolve(opt.obj_high_fp, opt.data_root)
        opt.obj_low_fp = resolve(opt.obj_low_fp, opt.data_root)
        opt.obj_gcn_fp = resolve(opt.obj_gcn_fp, opt.data_root)
        opt.tex_fp = resolve(opt.tex_fp, opt.data_root)
        opt.lp_dir = resolve(opt.lp_dir, opt.data_root)
        high_name = os.path.basename(opt.obj_high_fp).split(".")[0]
        low_name = os.path.basename(opt.obj_low_fp).split(".")[0]
        precomp_high = os.path.join(opt.data_root, f"precomp_{high_name}")
        precomp_low = os.path.join(opt.data_root, f"precomp_{low_name}")

        img_dir = os.path.join(opt.data_root, f"rgb{lighting_idx}")
        ds = ViewDataset(
            root_dir=opt.data_root, calib_path=opt.calib_fp, img_dir=img_dir,
            img_size=(opt.img_size, opt.img_size),
            sampling_pattern=opt.sampling_pattern, load_precompute=True,
            precomp_high_dir=precomp_high, precomp_low_dir=precomp_low,
            img_gamma=opt.img_gamma,
        )
        print("buffering train views...")
        ds.buffer_all()
        train_views = ds.views_all
        ds_val = ViewDataset(
            root_dir=opt.data_root, calib_path=opt.calib_fp, img_dir=img_dir,
            img_size=(opt.img_size, opt.img_size),
            sampling_pattern=opt.sampling_pattern_val, load_precompute=True,
            precomp_high_dir=precomp_high, precomp_low_dir=precomp_low,
            img_gamma=opt.img_gamma,
        )
        print("buffering val views...")
        ds_val.buffer_all()
        val_views = ds_val.views_all

        # relighting ground truth (train_rnr.py:198-209)
        relight_views = None
        img_relight_dir = os.path.join(
            opt.data_root, f"rgb{opt.lighting_relight_idx}"
        )
        if has_relight and os.path.isdir(img_relight_dir):
            ds_rel = ViewDataset(
                root_dir=opt.data_root, calib_path=opt.calib_fp,
                img_dir=img_relight_dir,
                img_size=(opt.img_size, opt.img_size),
                sampling_pattern=opt.sampling_pattern_val,
                img_gamma=opt.img_gamma,
            )
            ds_rel.buffer_all()
            relight_views = ds_rel.views_all

        gcn_mesh = load_obj(opt.obj_gcn_fp)
        gcn_pos = gcn_mesh.v

        # light probes -> LightingLP -> SH init (train_rnr.py:264-275)
        init_coeff = None
        lp_fit_coeff = None  # GT SH coeffs from probes (train_rnr.py:315)
        num_lighting = 1
        lp_relight = None
        if opt.lp_dir is not None and os.path.isdir(opt.lp_dir):
            lp_ds = LightProbeDataset(opt.lp_dir, img_gamma=opt.img_gamma)
            lp_ds.buffer_all()
            lps = np.stack(
                [
                    cv2.resize(d["lp_img"], (3200, 1600),
                               interpolation=cv2.INTER_AREA)
                    for d in (lp_ds[i] for i in range(len(lp_ds)))
                ]
            )
            lp_model = LightingLP(l_dir=l_dir, lps=lps)
            lp_vars = lp_model.init(jax.random.PRNGKey(0))
            init_coeff = np.array(  # writable copy (jax buffers are not)
                lp_model.apply(
                    lp_vars, method=lambda m: m.fit_sh(opt.sh_lmax)
                )
            )
            lp_fit_coeff = init_coeff.copy()
            num_lighting = lps.shape[0]

        # stitched probe -> lighting loss anchors (train_rnr.py:277-329)
        lp_stitch_dir = os.path.join(
            opt.data_root, f"light_probe_stitch_{opt.sampling_pattern}"
        )
        if not os.path.isdir(lp_stitch_dir):
            raise FileNotFoundError(
                f"stitched light probe dir {lp_stitch_dir} not found -- run "
                f"drivers.stitch_lp with --sampling_pattern "
                f"{opt.sampling_pattern} first (see scripts/preproc.sh)"
            )
        exr = os.path.join(lp_stitch_dir, f"{lighting_idx}.exr")
        hdr = os.path.join(lp_stitch_dir, f"{lighting_idx}.hdr")
        png = os.path.join(lp_stitch_dir, f"{lighting_idx}.png")
        if os.path.isfile(exr) or os.path.isfile(hdr):
            lp_stitch = cv2.imread(
                exr if os.path.isfile(exr) else hdr,
                cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH,
            )
        else:
            lp_stitch = cv2.imread(png, cv2.IMREAD_UNCHANGED)[
                :, :, :3
            ].astype(np.float32) / 255.0
        lp_stitch = np.nan_to_num(lp_stitch)
        lp_stitch = cv2.cvtColor(lp_stitch, cv2.COLOR_BGR2RGB) ** opt.img_gamma
        lp_mask = cv2.imread(
            os.path.join(lp_stitch_dir, "mask", f"{lighting_idx}.png")
        ).astype(np.float32) / 255.0
        for c in range(3):
            covered = lp_mask[:, :, c] == 1
            if covered.any():
                lp_stitch[~covered, c] = lp_stitch[covered, c].mean()

        uv = np.asarray(spherical_mapping(jnp.asarray(l_dir)))
        x = np.clip(uv[0] * lp_stitch.shape[1], None, lp_stitch.shape[1] - 1)
        y = np.clip(uv[1] * lp_stitch.shape[0], None, lp_stitch.shape[0] - 1)
        l_samples_init = np.asarray(
            interpolate_bilinear(jnp.asarray(lp_stitch), jnp.asarray(x),
                                 jnp.asarray(y))
        )
        l_samples_mask = (
            np.asarray(
                interpolate_bilinear(jnp.asarray(lp_mask), jnp.asarray(x),
                                     jnp.asarray(y))
            )[:, 0]
            == 1
        ).astype(np.float32)

        # initialize lighting from the stitch (train_rnr.py:321-329)
        num_lighting = max(
            num_lighting,
            lighting_idx + 1,
            (opt.lighting_relight_idx + 1) if has_relight else 0,
        )
        if opt.init_lighting:
            basis = np.asarray(evaluate_sh_basis(opt.sh_lmax, jnp.asarray(l_dir.T)))
            stitch_coeff = np.asarray(
                fit_sh_coeff(jnp.asarray(l_samples_init), jnp.asarray(basis))
            )
            if init_coeff is None:
                # every lighting starts from the stitched estimate; rows
                # other than lighting_idx only matter for relight previews
                init_coeff = np.tile(
                    stitch_coeff[None].astype(np.float32), (num_lighting, 1, 1)
                )
            elif init_coeff.shape[0] < num_lighting:
                pad = np.tile(
                    stitch_coeff[None].astype(np.float32),
                    (num_lighting - init_coeff.shape[0], 1, 1),
                )
                init_coeff = np.concatenate([init_coeff, pad], axis=0)
            init_coeff[lighting_idx] = stitch_coeff
            num_lighting = init_coeff.shape[0]

        texture_init = None
        if opt.init_tex and os.path.isfile(opt.tex_fp):
            tex = cv2.cvtColor(cv2.imread(opt.tex_fp), cv2.COLOR_BGR2RGB)
            texture_init = cv2.resize(
                tex, (opt.texture_size, opt.texture_size),
                interpolation=cv2.INTER_AREA,
            ).astype(np.float32) / 255.0

        log_root = opt.logging_root or os.path.join(
            opt.data_root, "logs", "rnr"
        )

    # ------------- model -------------
    cfg = RNRConfig(
        texture=TextureConfig(
            texture_size=opt.texture_size, texture_num_ch=opt.texture_num_ch,
            mipmap_level=opt.mipmap_level, init_tex=opt.init_tex,
            fix_tex=opt.fix_tex, apply_sh=opt.apply_sh,
        ),
        lighting=LightingConfig(
            sh_lmax=opt.sh_lmax, num_sample=num_sample,
            num_lighting=max(num_lighting, 2 if has_relight else 1),
            lighting_idx=opt.lighting_idx,
            lighting_relight_idx=opt.lighting_relight_idx,
            fix_lighting=opt.fix_lighting, init_lighting=opt.init_lighting,
        ),
        rays=RaysConfig(rays_dtype=opt.rays_dtype,
                        sh_fan_fuse=opt.sh_fan_fuse),
        gcn=GCNTrainConfig(
            kernel_size=opt.kernel_size, n_filters=opt.n_filters,
            n_blocks=opt.n_blocks, epsilon=opt.epsilon,
            in_channels=opt.in_channels,
            block_type=opt.block_type, conv_type=opt.conv_type,
            act_type=opt.act_type,
            norm_type=None if opt.norm_type == "none" else opt.norm_type,
            use_bias=opt.bias,
            stochastic=opt.stochastic, out_channels=opt.out_channels_gcn,
            knn_approx=opt.knn_approx, knn_recall=opt.knn_recall,
            graph_refresh_every=opt.graph_refresh_every,
            compute_dtype=opt.gcn_compute_dtype,
            strat_min_dilation=opt.strat_min_dilation,
            stratum_width=opt.stratum_width,
        ),
        render_net=RenderNetConfig(nf0=opt.nf0, remat=opt.unet_remat,
                                   compute_dtype=opt.unet_compute_dtype,
                                   conv_backend=opt.unet_conv_backend,
                                   fuse_mode=opt.unet_fuse_mode,
                                   pad_mode=opt.unet_pad_mode),
        loss=LossConfig(
            loss_lighting_weight=opt.loss_lighting_weight,
            loss_lighting_uncovered_weight=opt.loss_lighting_uncovered_weight,
            loss_rays_lt_chrom_weight=opt.loss_rays_lt_chrom_weight,
            loss_alb_weight=opt.loss_alb_weight,
        ),
        train=TrainConfig(
            lr=opt.lr, batch_size=opt.batch_size, max_epoch=opt.max_epoch,
            max_iter=opt.max_iter, sampling_pattern=opt.sampling_pattern,
            sampling_pattern_val=opt.sampling_pattern_val,
            val_freq=opt.val_freq, log_freq=opt.log_freq,
            ckp_freq=opt.ckp_freq, img_size=opt.img_size,
            img_gamma=opt.img_gamma,
        ),
        use_gcn=opt.use_gcn,
    )
    model = RNRModel(
        cfg=cfg, l_dir=l_dir,
        init_lighting_coeff=init_coeff if not synthetic else None,
        texture_init=texture_init if not synthetic else None,
    )

    dir_name = (
        datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
        + "_" + opt.sampling_pattern
        + (("_" + opt.exp_name) if opt.exp_name else "")
    )
    log_dir = os.path.join(log_root, dir_name)
    # multi-host: every process computes the same replicated results;
    # only process 0 owns the filesystem outputs
    main_proc = is_main_process()
    if main_proc:
        cond_mkdir(log_dir)
        for sub in ("val_out", "val_gt", "val_err", "val_relight_out",
                    "val_relight_err", "val_relight_gt"):
            cond_mkdir(os.path.join(log_dir, sub))
        save_config(cfg, os.path.join(log_dir, "params.json"))

    key = jax.random.PRNGKey(opt.seed)
    bs = opt.batch_size
    sample_batch = make_rnr_batch(train_views[:bs], gcn_pos)
    state, tx = create_rnr_state(model, key, sample_batch, cfg.train.lr)
    if opt.checkpoint:
        state = load_checkpoint(opt.checkpoint, state)
        print("restored", opt.checkpoint)

    statics = {
        "l_samples_init": jnp.asarray(l_samples_init),
        "l_samples_mask": jnp.asarray(l_samples_mask),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    train_step = make_rnr_train_step(model, tx, lighting_idx)
    eval_step = make_rnr_eval_step(model, lighting_idx)

    if opt.mesh_devices:
        from rnr_tpu.parallel import make_mesh, make_sharded_rnr_train_step
        mesh = make_mesh(opt.mesh_devices, dp=opt.mesh_dp)
        train_step = make_sharded_rnr_train_step(model, tx, mesh, lighting_idx)
        print("training over mesh", mesh.devices.shape, mesh.axis_names)

    n_params = {
        part: sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree.leaves(state.params.get(part, {}))
        )
        for part in ("texture_mapper", "render_net", "gcn", "lighting")
    }
    print("parameters:", json.dumps(n_params))

    # relight probe (train_rnr.py:331-339)
    lp_relight_arr = None
    if has_relight:
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        lp_relight_arr = model.apply(
            variables, opt.lighting_relight_idx, True,
            method=lambda m, i, l: m.lighting(i, is_lp=l),
        )

    # lighting ground truth + probe reconstructions (train_rnr.py:313-316):
    # when lp probes exist, GT SH coeffs come from LightingLP.fit_sh and
    # the per-iteration lighting-estimation error is tracked against them
    def recon_probe(coeff):
        variables = {
            "params": state.params, "constants": state.constants,
            "spectral": state.spectral,
        }
        return np.asarray(
            model.apply(
                variables, jnp.asarray(coeff),
                method=lambda m, c_: m.lighting.reconstruct_lp(c_),
            )
        )

    has_lighting_gt = lp_fit_coeff is not None and lighting_idx < len(
        lp_fit_coeff
    )
    lighting_coeff_gt = None
    lp_gt = None
    lp_init = None
    if has_lighting_gt:
        lighting_coeff_gt = lp_fit_coeff[lighting_idx]
        lp_gt = recon_probe(lighting_coeff_gt)
    if init_coeff is not None and lighting_idx < len(init_coeff):
        lp_init = recon_probe(init_coeff[lighting_idx])

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir) if main_proc else None
    except Exception:
        writer = None

    from rnr_tpu.data.prefetch import prefetch

    # Device-resident view buffer (TPU-first): per-iteration host batch
    # assembly + device_put moves ~35 MB at 512^2 through the tunnel
    # every step (and the tunnel client pins host RSS per transfer —
    # the round-4 canonical gate died at 130 GB RSS from exactly this).
    # When the whole training set fits comfortably in HBM and the run
    # is single-device, stack it on device ONCE and gather batches with
    # device-side indexing instead.
    views_dev = None
    gcn_pos_dev = None
    if (opt.device_view_buffer != "off" and not opt.mesh_devices
            and not distributed):
        _dev_keys = VIEW_KEYS + ("alpha_map", "img_gt")
        view_bytes = sum(
            np.asarray(train_views[0][k]).nbytes for k in _dev_keys
        ) * len(train_views)
        if opt.device_view_buffer == "on" or view_bytes <= (4 << 30):
            views_dev = {
                k: jnp.asarray(
                    np.stack([np.asarray(v[k]) for v in train_views])
                )
                for k in VIEW_KEYS + ("img_gt",)
            }
            views_dev["alpha_map"] = jnp.asarray(np.stack(
                [np.asarray(v["alpha_map"]) for v in train_views]
            ))[..., None]
            gcn_pos_dev = jnp.asarray(gcn_pos)
            print(f"device view buffer: {len(train_views)} views, "
                  f"{view_bytes / 1e9:.2f} GB", flush=True)

    order_rng = np.random.default_rng(opt.seed)
    it = opt.start_epoch * len(train_views)
    history = []
    ran_val = False
    last_val = None
    for epoch in range(opt.start_epoch, opt.max_epoch):
        order = order_rng.permutation(len(train_views))

        if views_dev is not None:
            def epoch_batches(order=order):
                for start in range(0, len(order) - bs + 1, bs):
                    idx = jnp.asarray(order[start:start + bs])
                    b = {k: a[idx] for k, a in views_dev.items()}
                    b["gcn_pos"] = gcn_pos_dev
                    yield b

            # all-device gathers: nothing host-bound to overlap
            batches = epoch_batches()
        else:
            def epoch_batches(order=order):
                for start in range(0, len(order) - bs + 1, bs):
                    yield make_rnr_batch(
                        [train_views[j] for j in order[start:start + bs]],
                        gcn_pos,
                    )

            # host-side batch assembly overlaps device execution
            batches = prefetch(epoch_batches(), depth=2)

        for batch in batches:
            if opt.max_iter is not None and it >= opt.max_iter:
                _final(log_dir, state, history, it, write=main_proc,
                       val_metrics=last_val)
                return
            t0 = time.time()
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, statics, sub)
            # fetch metrics to host only at log boundaries so device steps
            # pipeline back-to-back (the reference syncs every iteration,
            # train_rnr.py:627-656)
            sync_now = (
                it % max(opt.log_freq // 10, 1) == 0
                or (opt.max_iter is not None and it == opt.max_iter - 1)
            )
            if sync_now:
                loss = float(metrics["loss"])
                history.append(loss)
                if writer:
                    for k in ("loss", "loss_rn", "loss_lighting",
                              "loss_rays_lt_chrom", "loss_alb"):
                        writer.add_scalar(k, float(metrics[k]), it)
                    writer.add_scalar(
                        "final_mae_valid", float(metrics["mae_valid"]), it
                    )
                    writer.add_scalar(
                        "final_psnr_valid", float(metrics["psnr_valid"]), it
                    )
                    # lighting-estimation error vs probe GT
                    # (train_rnr.py:631-633,650-654)
                    if has_lighting_gt:
                        est_coeff = np.asarray(
                            state.params["lighting"]["coeff"]
                        )[lighting_idx]
                        writer.add_scalar(
                            "lighting_sh_coeff_mae",
                            float(np.abs(lighting_coeff_gt - est_coeff).sum()),
                            it,
                        )
                        lp_est = recon_probe(est_coeff)
                        from rnr_tpu.utils.eval_metrics import psnr_np
                        writer.add_scalar(
                            "lp_mae_valid",
                            float(np.abs(lp_est - lp_gt).mean() * 255.0), it,
                        )
                        writer.add_scalar(
                            "lp_psnr_valid",
                            psnr_np(lp_est * 255.0, lp_gt * 255.0), it,
                        )
                print(
                    f"Iter {it:07d} Epoch {epoch:03d} loss {loss:.4f} "
                    f"rn {float(metrics['loss_rn']):.4f} "
                    f"light {float(metrics['loss_lighting']):.4f} "
                    f"chrom {float(metrics['loss_rays_lt_chrom']):.4f} "
                    f"alb {float(metrics['loss_alb']):.4f} "
                    f"psnr {float(metrics['psnr_valid']):.4f} "
                    f"t {time.time() - t0:.3f}s"
                )

            # tensorboard image grids (train_rnr.py:658-704).  NOTE the
            # outer condition must be process-uniform: fetch_global is a
            # cross-host collective, so EVERY process enters when any
            # does (a main-only gate would deadlock/mismatch gloo).
            if (writer or distributed) and it % opt.log_freq == 0:
                # metrics["img"] may span all hosts' devices
                img = np.clip(fetch_global(metrics["img"]), 0, 1)
                gt = np.clip(np.asarray(batch["img_gt"]), 0, 1)
                err = np.clip(np.abs(img - gt), 0, 1)
                grid = np.concatenate(
                    [np.concatenate([img[i], gt[i], err[i]], axis=1)
                     for i in range(img.shape[0])],
                    axis=0,
                )
                if writer:
                    writer.add_image("output_final_vs_gt", grid, it,
                                     dataformats="HWC")
                    rows = []
                    if lp_init is not None:
                        rows.append(np.clip(lp_init, 0, 1))
                    est_coeff = np.asarray(
                        state.params["lighting"]["coeff"]
                    )[lighting_idx]
                    lp_est_img = recon_probe(est_coeff)
                    rows.append(np.clip(lp_est_img, 0, 1))
                    if lp_gt is not None:
                        rows.append(np.clip(lp_gt, 0, 1))
                        rows.append(
                            np.clip(np.abs(lp_est_img - lp_gt), 0, 1)
                        )
                    writer.add_image(
                        "lp_init_est_gt", np.concatenate(rows, axis=0), it,
                        dataformats="HWC",
                    )

            if it and it % opt.val_freq == 0:
                last_val = _validate(
                    eval_step, state, val_views, relight_views, gcn_pos, bs,
                    log_dir, it, writer, lp_relight_arr,
                    first_val=not ran_val, write_images=main_proc,
                )
                ran_val = True
            it += 1
            if main_proc and it % opt.ckp_freq == 0:
                save_checkpoint(
                    os.path.join(log_dir, f"model_iter-{it}.ckpt"), state
                )
    _final(log_dir, state, history, it, write=main_proc,
           val_metrics=last_val)


def _validate(eval_step, state, val_views, relight_views, gcn_pos, bs,
              log_dir, it, writer, lp_relight, first_val=False,
              write_images=True):
    """Validation loop with reference observability (train_rnr.py:707-887):
    masked MAE/MSE/PSNR/SSIM (full + bb + valid variants), val_out /
    val_err PNGs every pass, val_gt once, relight out/err/gt and a
    relight image grid when a relight channel exists."""
    from rnr_tpu.utils.eval_metrics import compute_err_metrics_batch
    from rnr_tpu.parallel.distributed import fetch_global

    agg: dict = {}
    agg_rel: dict = {}

    def accumulate(dst, m):
        for k, v in m.items():
            if not k.endswith("_mean"):
                dst.setdefault(k, []).extend(np.ravel(v).tolist())

    relight_grid = None
    for start in range(0, len(val_views) - bs + 1, bs):
        views = val_views[start:start + bs]
        batch = make_rnr_batch(views, gcn_pos)
        out = eval_step(state, batch)
        img = fetch_global(out["img"])
        gt = np.asarray(batch["img_gt"])
        alpha = np.asarray(batch["alpha_map"])
        m = compute_err_metrics_batch(
            img * alpha * 255.0, gt * alpha * 255.0, alpha,
            compute_ssim=True,
        )
        accumulate(agg, m)
        err = np.clip(np.abs(img - gt), 0.0, 1.0)
        for i in range(bs) if write_images else ():
            stem = f"{it:08d}_{start + i:05d}.png"
            save_png(os.path.join(log_dir, "val_out", stem), img[i])
            save_png(os.path.join(log_dir, "val_err", stem), err[i])
            if first_val:
                save_png(
                    os.path.join(log_dir, "val_gt", f"{start + i:05d}.png"),
                    gt[i],
                )
        if lp_relight is not None:
            out_r = eval_step(state, batch, lp_override=lp_relight,
                              relight=True)
            img_r = fetch_global(out_r["img"])
            for i in range(bs) if write_images else ():
                save_png(
                    os.path.join(log_dir, "val_relight_out",
                                 f"{it:08d}_{start + i:05d}.png"),
                    img_r[i],
                )
            if relight_views is not None:
                gt_r = np.stack(
                    [np.asarray(v["img_gt"]) for v in
                     relight_views[start:start + bs]]
                )
                mr = compute_err_metrics_batch(
                    img_r * alpha * 255.0, gt_r * alpha * 255.0, alpha,
                    compute_ssim=True,
                )
                accumulate(agg_rel, mr)
                err_r = np.clip(np.abs(img_r - gt_r), 0.0, 1.0)
                for i in range(bs) if write_images else ():
                    stem = f"{it:08d}_{start + i:05d}.png"
                    save_png(
                        os.path.join(log_dir, "val_relight_err", stem),
                        err_r[i],
                    )
                    if first_val:
                        save_png(
                            os.path.join(log_dir, "val_relight_gt",
                                         f"{start + i:05d}.png"),
                            gt_r[i],
                        )
                if relight_grid is None:
                    relight_grid = np.concatenate(
                        [np.concatenate(
                            [np.clip(img_r[i], 0, 1), np.clip(gt_r[i], 0, 1),
                             err_r[i]], axis=1)
                         for i in range(bs)],
                        axis=0,
                    )
            elif relight_grid is None:
                relight_grid = np.concatenate(
                    [np.clip(img_r[i], 0, 1) for i in range(bs)], axis=0
                )

    summary = {}

    def report(tag, acc, prefix):
        if not acc:
            return
        means = {k: float(np.mean(v)) for k, v in acc.items()}
        print(
            f"Val{tag} @ {it}: mae {means['mae_valid']:.4f} "
            f"psnr {means['psnr_valid']:.4f} ssim {means['ssim_valid']:.4f}"
        )
        summary.update({prefix + k: v for k, v in means.items()})
        if writer:
            for k in ("mae_valid", "psnr_valid", "ssim_valid", "mae_bb",
                      "psnr_bb", "ssim_bb", "mse_valid"):
                if k in means:
                    writer.add_scalar(f"{prefix}{k}_val", means[k], it)

    report("", agg, "final_")
    report(" relight", agg_rel, "final_relight_")
    if writer and relight_grid is not None:
        writer.add_image("relight_final_est_gt", relight_grid, it,
                         dataformats="HWC")
    return summary


def _final(log_dir, state, history, total_iters=None, write=True,
           val_metrics=None):
    from rnr_tpu.train import save_checkpoint

    summary = {
        "first_loss": history[0] if history else None,
        "last_loss": history[-1] if history else None,
        "iters": total_iters if total_iters is not None else len(history),
    }
    if val_metrics:
        summary["val"] = val_metrics
    if write:
        save_checkpoint(os.path.join(log_dir, "model_final.ckpt"), state)
        with open(os.path.join(log_dir, "summary.json"), "w") as f:
            json.dump(summary, f)
    print("final:", json.dumps(summary))


if __name__ == "__main__":
    main()

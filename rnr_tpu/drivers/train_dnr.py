"""Deferred Neural Rendering training driver.

Counterpart of reference `train_dnr.py`: neural texture + U-Net trained
with an alpha-masked, border-cropped L1 on precomputed uv/SH/alpha maps.
Adds `--synthetic` (random G-buffers) for smoke-testing the full loop
without scene data, and `--platform cpu` for host runs.

Usage:
  python -m rnr_tpu.drivers.train_dnr --data_root DATA [--img_dir _/rgb0]
      [--max_iter N] [--texture_num_ch 30] ...
  python -m rnr_tpu.drivers.train_dnr --synthetic --max_iter 20
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np

from rnr_tpu.drivers.common import resolve, cond_mkdir, setup_jax, save_png


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--logging_root", type=str, default=None)
    p.add_argument("--obj_fp", type=str, default="_/mesh.obj")
    p.add_argument("--calib_fp", type=str, default="_/calib.mat")
    p.add_argument("--img_dir", type=str, default="_/rgb0")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--img_gamma", type=float, default=1.0)
    p.add_argument("--texture_size", type=int, default=512)
    p.add_argument("--texture_num_ch", type=int, default=30)
    p.add_argument("--mipmap_level", type=int, default=4)
    # optional RGB image copied into the level-0 texture's first
    # channels at init (reference train_dnr.py:19 --tex_fp)
    p.add_argument("--tex_fp", type=str, default=None)
    # epoch counter offset when resuming (reference train_dnr.py:53)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--apply_sh", default=True,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--nf0", type=int, default=64)
    p.add_argument("--unet_conv_backend", default="auto",
                   choices=["auto", "xla", "pallas", "pallas3",
                            "pallas_interpret"],
                   help="conv backend (auto = Pallas 3x3 + XLA 4x4 on "
                        "TPU, xla elsewhere — the measured best)")
    p.add_argument("--unet_pad_mode", default="reflect",
                   choices=["reflect", "same"])
    p.add_argument("--max_epoch", type=int, default=2000)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--sampling_pattern", type=str, default="all")
    p.add_argument("--sampling_pattern_val", type=str, default="skip_10")
    p.add_argument("--val_freq", type=int, default=1000)
    p.add_argument("--log_freq", type=int, default=100)
    p.add_argument("--ckp_freq", type=int, default=5000)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--exp_name", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    # reference-script compatibility: --gpu_id selects CUDA devices in
    # the reference; accepted and ignored here (TPU/platform flags
    # control placement).  --calib_format only has one valid value in
    # the reference (dataio.py:45-52).
    p.add_argument("--gpu_id", type=str, default=None)
    p.add_argument("--calib_format", type=str, default="convert",
                   choices=["convert"])
    p.add_argument("--synthetic", action="store_true",
                   help="train on random G-buffers (smoke test)")
    return p


def _synthetic_views(rng, n, s):
    views = []
    for _ in range(n):
        views.append(
            {
                "uv_map": rng.uniform(0, 1, (s, s, 2)).astype(np.float32),
                "sh_basis_map": rng.uniform(-1, 1, (s, s, 9)).astype(np.float32),
                "alpha_map": np.ones((s, s), np.float32),
                "img_gt": rng.uniform(0, 1, (s, s, 3)).astype(np.float32),
            }
        )
    return views


def make_batch(views: list[dict]):
    import jax.numpy as jnp

    return {
        "uv_map": jnp.asarray(np.stack([v["uv_map"] for v in views])),
        "sh_basis_map": jnp.asarray(
            np.stack([v["sh_basis_map"] for v in views])
        ),
        "alpha_map": jnp.asarray(
            np.stack([v["alpha_map"] for v in views])
        )[..., None],
        "img_gt": jnp.asarray(np.stack([v["img_gt"] for v in views])),
    }


def main(argv=None) -> None:
    opt = build_argparser().parse_args(argv)
    setup_jax(opt.platform)

    import jax
    from rnr_tpu.config import (
        DNRConfig, TextureConfig, RenderNetConfig, LossConfig, TrainConfig,
    )
    from rnr_tpu.train import (
        create_dnr_state, make_dnr_train_step, make_dnr_eval_step,
        save_checkpoint, load_checkpoint,
    )
    from rnr_tpu.ops.metrics import masked_err_metrics, ssim
    from rnr_tpu.config import save_config

    cfg = DNRConfig(
        texture=TextureConfig(
            texture_size=opt.texture_size,
            texture_num_ch=opt.texture_num_ch,
            mipmap_level=opt.mipmap_level,
            apply_sh=opt.apply_sh,
        ),
        render_net=RenderNetConfig(nf0=opt.nf0,
                                   conv_backend=opt.unet_conv_backend,
                                   pad_mode=opt.unet_pad_mode),
        loss=LossConfig(),
        train=TrainConfig(
            lr=opt.lr, batch_size=opt.batch_size, max_epoch=opt.max_epoch,
            max_iter=opt.max_iter, sampling_pattern=opt.sampling_pattern,
            sampling_pattern_val=opt.sampling_pattern_val,
            val_freq=opt.val_freq, log_freq=opt.log_freq,
            ckp_freq=opt.ckp_freq, img_size=opt.img_size,
            img_gamma=opt.img_gamma,
        ),
    )

    # ---------------- data ----------------
    if opt.synthetic:
        rng_np = np.random.default_rng(opt.seed)
        train_views = _synthetic_views(rng_np, 8, opt.img_size)
        val_views = _synthetic_views(rng_np, 2, opt.img_size)
        log_root = opt.logging_root or "/tmp/rnr_tpu_logs/dnr_synth"
    else:
        from rnr_tpu.data import ViewDataset, BatchLoader

        opt.calib_fp = resolve(opt.calib_fp, opt.data_root)
        opt.img_dir = resolve(opt.img_dir, opt.data_root)
        obj_name = os.path.basename(
            resolve(opt.obj_fp, opt.data_root)
        ).split(".")[0]
        precomp = os.path.join(opt.data_root, f"precomp_{obj_name}")
        ds = ViewDataset(
            root_dir=opt.data_root, calib_path=opt.calib_fp,
            img_dir=opt.img_dir, img_size=(opt.img_size, opt.img_size),
            sampling_pattern=opt.sampling_pattern, load_precompute=True,
            precomp_high_dir=precomp, precomp_low_dir=precomp,
            img_gamma=opt.img_gamma,
        )
        print("buffering train views...")
        ds.buffer_all()
        train_views = ds.views_all
        ds_val = ViewDataset(
            root_dir=opt.data_root, calib_path=opt.calib_fp,
            img_dir=opt.img_dir, img_size=(opt.img_size, opt.img_size),
            sampling_pattern=opt.sampling_pattern_val, load_precompute=True,
            precomp_high_dir=precomp, precomp_low_dir=precomp,
            img_gamma=opt.img_gamma,
        )
        print("buffering val views...")
        ds_val.buffer_all()
        val_views = ds_val.views_all
        log_root = opt.logging_root or os.path.join(
            opt.data_root, "logs", "dnr"
        )

    dir_name = (
        datetime.datetime.now().strftime("%m-%d_%H-%M-%S")
        + "_" + opt.sampling_pattern
        + (("_" + opt.exp_name) if opt.exp_name else "")
    )
    log_dir = os.path.join(log_root, dir_name)
    cond_mkdir(log_dir)
    for sub in ("val_out", "val_gt", "val_err"):
        cond_mkdir(os.path.join(log_dir, sub))
    save_config(cfg, os.path.join(log_dir, "params.json"))

    # ---------------- state ----------------
    texture_init = None
    if opt.tex_fp:
        import cv2

        tex_fp = resolve(opt.tex_fp, opt.data_root) if opt.data_root \
            else opt.tex_fp
        tex = cv2.cvtColor(cv2.imread(tex_fp), cv2.COLOR_BGR2RGB)
        texture_init = cv2.resize(
            tex, (opt.texture_size, opt.texture_size),
            interpolation=cv2.INTER_AREA,
        ).astype(np.float32) / 255.0

    key = jax.random.PRNGKey(opt.seed)
    sample_batch = make_batch(train_views[: opt.batch_size])
    mods, state, tx = create_dnr_state(cfg, key, sample_batch, cfg.train.lr,
                                       texture_init=texture_init)
    if opt.checkpoint:
        state = load_checkpoint(opt.checkpoint, state)
        print("restored checkpoint", opt.checkpoint)
    train_step = make_dnr_train_step(cfg, mods, tx)
    eval_step = make_dnr_eval_step(cfg, mods)

    n_params = sum(
        int(np.prod(np.shape(x))) for x in jax.tree.leaves(state.params)
    )
    print(f"DNR parameters: {n_params:,}")

    # ---------------- loop ----------------
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir)
    except Exception:
        writer = None

    order_rng = np.random.default_rng(opt.seed)
    # resuming at --start_epoch also advances the global iteration
    # counter (reference train_dnr.py:232: iter = start_epoch * len(ds))
    # so checkpoints/logs continue instead of overwriting the first run's
    it = opt.start_epoch * len(train_views)
    bs = opt.batch_size
    history = []
    for epoch in range(opt.start_epoch, opt.max_epoch):
        order = order_rng.permutation(len(train_views))
        for start in range(0, len(order) - bs + 1, bs):
            if opt.max_iter is not None and it >= opt.max_iter:
                _final(log_dir, state, history, it)
                return
            t0 = time.time()
            key, sub = jax.random.split(key)
            batch = make_batch([train_views[j] for j in order[start:start + bs]])
            state, metrics = train_step(state, batch, sub)
            # periodic host sync keeps the device pipeline full
            if it % max(opt.log_freq // 10, 1) == 0 or (
                opt.max_iter is not None and it == opt.max_iter - 1
            ):
                loss = float(metrics["loss"])
                history.append(loss)
                if writer:
                    writer.add_scalar("loss_g", loss, it)
                    writer.add_scalar("final_mae_valid", float(metrics["mae_valid"]), it)
                    writer.add_scalar("final_psnr_valid", float(metrics["psnr_valid"]), it)
                print(
                    f"Iter {it:07d} Epoch {epoch:03d} loss {loss:.4f} "
                    f"mae_valid {float(metrics['mae_valid']):.4f} "
                    f"psnr_valid {float(metrics['psnr_valid']):.4f} "
                    f"t {time.time() - t0:.3f}s"
                )

            if it and it % opt.val_freq == 0:
                _validate(eval_step, state, val_views, bs, log_dir, it,
                          writer, cfg)
            it += 1
            if it % opt.ckp_freq == 0:
                save_checkpoint(
                    os.path.join(log_dir, f"model_iter-{it}.ckpt"), state
                )
    _final(log_dir, state, history, it)


def _validate(eval_step, state, val_views, bs, log_dir, it, writer, cfg):
    from rnr_tpu.ops.metrics import masked_err_metrics

    maes, psnrs = [], []
    for start in range(0, len(val_views) - bs + 1, bs):
        batch = make_batch(val_views[start:start + bs])
        out = eval_step(state, batch)
        m = masked_err_metrics(
            np.asarray(out) * np.asarray(batch["alpha_map"]) * 255.0,
            np.asarray(batch["img_gt"]) * np.asarray(batch["alpha_map"]) * 255.0,
            np.asarray(batch["alpha_map"]),
        )
        maes.append(float(m["mae_valid"]))
        psnrs.append(float(m["psnr_valid"]))
        for i in range(bs):
            save_png(
                os.path.join(log_dir, "val_out",
                             f"{it:08d}_{start + i:05d}.png"),
                np.asarray(out)[i],
            )
    if writer and maes:
        writer.add_scalar("final_mae_valid_val", np.mean(maes), it)
        writer.add_scalar("final_psnr_valid_val", np.mean(psnrs), it)
    print(f"Val @ {it}: mae {np.mean(maes):.4f} psnr {np.mean(psnrs):.4f}")


def _final(log_dir, state, history, total_iters=None):
    from rnr_tpu.train import save_checkpoint

    save_checkpoint(os.path.join(log_dir, "model_final.ckpt"), state)
    summary = {
        "first_loss": history[0] if history else None,
        "last_loss": history[-1] if history else None,
        "iters": total_iters if total_iters is not None else len(history),
    }
    with open(os.path.join(log_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print("final:", json.dumps(summary))
    return 0


if __name__ == "__main__":
    main()

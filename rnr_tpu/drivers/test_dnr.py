"""DNR inference driver.

Counterpart of reference `test_dnr.py`: loads a DNR checkpoint, rasterizes
test views on the fly (uv/SH/alpha maps), runs texture + U-Net and writes
PNGs.

Usage:
  python -m rnr_tpu.drivers.test_dnr --data_root DATA --checkpoint_dir LOG
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from rnr_tpu.drivers.common import resolve, cond_mkdir, setup_jax, save_png


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_name", type=str, default="model_final.ckpt")
    p.add_argument("--calib_fp", type=str, default="_/calib.mat")
    # reference-compat (test_dnr.py): calib directory override and
    # the (meaningless here) recompute switch
    p.add_argument("--calib_dir", type=str, default=None)
    p.add_argument("--force_recompute", default=False,
                   type=lambda x: str(x).lower() in ["true", "1"])
    p.add_argument("--obj_fp", type=str, default="_/mesh.obj")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--sampling_pattern", type=str, default="all")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    # reference-script compatibility: --gpu_id is accepted and ignored
    # (CUDA device selection; TPU placement uses --platform/mesh
    # flags).  --calib_format has one valid value (dataio.py:45-52).
    p.add_argument("--gpu_id", type=str, default=None)
    p.add_argument("--calib_format", type=str, default="convert",
                   choices=["convert"])
    return p


def main(argv=None) -> None:
    opt = build_argparser().parse_args(argv)
    setup_jax(opt.platform)

    import scipy.io
    import jax
    import jax.numpy as jnp

    from rnr_tpu.config import DNRConfig, load_config
    from rnr_tpu.data import Mesh, ViewDataset
    from rnr_tpu.ops.gbuffer import make_mesh_buffers, render_gbuffer
    from rnr_tpu.train import create_dnr_state, load_checkpoint
    from rnr_tpu.train.steps import make_dnr_eval_step

    if opt.calib_dir:
        opt.calib_fp = os.path.join(
            resolve(opt.calib_dir, opt.data_root), "calib.mat")
    opt.calib_fp = resolve(opt.calib_fp, opt.data_root)
    opt.obj_fp = resolve(opt.obj_fp, opt.data_root)

    cfg: DNRConfig = load_config(
        DNRConfig, os.path.join(opt.checkpoint_dir, "params.json")
    )

    calib = scipy.io.loadmat(opt.calib_fp)
    mesh = Mesh(opt.obj_fp, global_RT=calib["global_RT"].astype(np.float32))
    mesh_buf = make_mesh_buffers(mesh)

    ds = ViewDataset(
        root_dir=opt.data_root, calib_path=opt.calib_fp, img_dir=None,
        load_img=False, img_size=(opt.img_size, opt.img_size),
        sampling_pattern=opt.sampling_pattern,
    )

    def gbuffer_batch(view):
        gb = render_gbuffer(
            mesh_buf,
            jnp.asarray(view["proj"][None]),
            jnp.asarray(view["pose"][None]),
            jnp.asarray(view["dist_coeffs"][None, :5]),
            None, None, opt.img_size,
        )
        return {
            "uv_map": gb["uv_map"],
            "sh_basis_map": gb["sh_basis_map"][..., :9],
            "alpha_map": gb["alpha_map"][..., None],
            "img_gt": jnp.zeros_like(gb["normal_map"]),
        }, gb

    v0 = ds.read_view(0)
    batch0, _ = gbuffer_batch(v0)
    mods, state, _ = create_dnr_state(
        cfg, jax.random.PRNGKey(0), batch0, cfg.train.lr
    )
    state = load_checkpoint(
        os.path.join(opt.checkpoint_dir, opt.checkpoint_name), state
    )
    eval_step = make_dnr_eval_step(cfg, mods)

    out_dir = opt.out_dir or os.path.join(
        opt.checkpoint_dir, f"test_seq_{opt.sampling_pattern}"
    )
    cond_mkdir(out_dir)
    for i in range(len(ds)):
        t0 = time.time()
        view = ds.read_view(i)
        batch, gb = gbuffer_batch(view)
        out = eval_step(state, batch)
        img = np.asarray(out[0]) * np.asarray(batch["alpha_map"][0])
        save_png(
            os.path.join(out_dir, view["img_fn"].split(".")[0] + ".png"), img
        )
        print(f"view {i:04d}  t_total {time.time() - t0:.3f}")
    print("wrote", out_dir)


if __name__ == "__main__":
    main()

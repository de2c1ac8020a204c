"""End-to-end TPU training demo on a synthetic sphere scene.

Runs the REAL driver pipeline on hardware: scene generation ->
precompute -> stitch_lp -> train_rnr (N iters) -> test_rnr render, and
prints the validation PSNR trajectory — the framework's learning
capability demonstrated end to end on a TPU chip.

Usage: python tools/tpu_train_demo.py [--iters 300] [--img 128]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--root", type=str, default=None)
    args = ap.parse_args()

    from test_pipeline_e2e import make_scene
    from rnr_tpu.drivers import precompute, stitch_lp, train_rnr, test_rnr

    root = args.root or tempfile.mkdtemp(prefix="rnr_demo_")
    print("scene root:", root)
    make_scene(root, num_view=24, hw=args.img)

    precompute.main(
        ["--data_root", root, "--img_size", str(args.img),
         "--sampling_pattern", "all"]
    )
    # the stitch output dir is keyed by the TRAIN sampling pattern
    # (reference: train_rnr.py:283)
    stitch_lp.main(
        ["--data_root", root, "--sampling_pattern", "skipinv_4",
         "--img_suffix", ".png", "--lp_h", "128", "--lp_w", "256"]
    )

    log_root = os.path.join(root, "logs_rnr")
    train_rnr.main(
        [
            "--data_root", root,
            "--logging_root", log_root,
            "--obj_high_fp", "_/mesh.obj", "--obj_low_fp", "_/mesh.obj",
            "--obj_gcn_fp", "_/mesh.obj",
            "--img_size", str(args.img),
            "--texture_size", "128", "--mipmap_level", "3",
            "--nf0", "32", "--n_blocks", "8", "--n_filters", "32",
            "--kernel_size", "8", "--out_channels_gcn", "128",
            "--sh_lmax", "4",
            "--sphere_samples_fp", "nonexistent.mat",
            "--lighting_idx", "0", "--lighting_relight_idx", "1",
            "--max_iter", str(args.iters),
            "--val_freq", str(max(args.iters // 4, 1)),
            "--ckp_freq", "100000",
            "--log_freq", "50",
            "--sampling_pattern", "skipinv_4",
            "--sampling_pattern_val", "skip_4",
        ]
    )
    run = sorted(os.listdir(log_root))[-1]
    ckpt_dir = os.path.join(log_root, run)
    with open(os.path.join(ckpt_dir, "summary.json")) as f:
        print("train summary:", json.load(f))

    out_dir = os.path.join(ckpt_dir, "render_demo")
    test_rnr.main(
        [
            "--data_root", root,
            "--checkpoint_dir", ckpt_dir,
            "--obj_high_fp", "_/mesh.obj", "--obj_gcn_fp", "_/mesh.obj",
            "--img_size", str(args.img),
            "--sampling_pattern", "skip_4",
            "--lighting_idx", "0",
            "--sphere_samples_fp", "nonexistent.mat",
            "--out_dir", out_dir,
        ]
    )
    frames = glob.glob(os.path.join(out_dir, "*", "*.png"))
    print(f"rendered {len(frames)} frames ->", out_dir)

    # quantify: PSNR of rendered frames vs ground truth
    import cv2
    import numpy as np
    from rnr_tpu.utils.eval_metrics import psnr_np

    scores = []
    for fp in sorted(frames):
        stem = os.path.basename(fp)
        gt_fp = os.path.join(root, "rgb0", stem)
        if not os.path.isfile(gt_fp):
            continue
        est = cv2.imread(fp).astype(np.float64)
        gt = cv2.imread(gt_fp).astype(np.float64)
        scores.append(psnr_np(est, gt))
    if scores:
        print(f"render-vs-gt PSNR over {len(scores)} frames: "
              f"mean {np.mean(scores):.2f} dB min {np.min(scores):.2f}")


if __name__ == "__main__":
    main()

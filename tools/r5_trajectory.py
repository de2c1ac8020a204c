"""One long canonical training trajectory (VERDICT r4 item 7).

Runs the real driver pipeline at canonical scale (512^2, full model
sizes, shipped defaults incl. relight channel) for N iterations with
periodic validation, in ONE subprocess-isolated arm (host-RSS
discipline), and commits the PSNR/SSIM trajectory as
tools/out/trajectory_r5.json — demonstrating whether the 2k-iteration
A/B regime is predictive of longer training.

Usage: python tools/r5_trajectory.py --iters 10000 --img 512
       (add --platform cpu --iters 30 --img 32 to smoke the harness)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

VAL_RE = re.compile(
    r"Val( relight)? @ (\d+): mae ([\d.]+) psnr ([\d.]+) ssim ([\d.]+)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--val_every", type=int, default=1000)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default="tools/out/trajectory_r5.json")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    root = args.root or "/tmp/rnr_r5_traj"
    platform_args = (["--platform", args.platform]
                     if args.platform else [])

    if args.child:
        from test_pipeline_e2e import make_scene
        from rnr_tpu.drivers import precompute, stitch_lp, train_rnr

        if not os.path.isdir(os.path.join(root, "rgb0")):
            make_scene(root, num_view=24, hw=args.img, n_lat=72,
                       n_lon=104)
            precompute.main(["--data_root", root, "--img_size",
                             str(args.img), "--sampling_pattern", "all",
                             *platform_args])
            stitch_lp.main(["--data_root", root, "--sampling_pattern",
                            "skipinv_4", "--img_suffix", ".png",
                            "--lp_h", "128", "--lp_w", "256"])
        size = (["--texture_size", "512", "--mipmap_level", "4",
                 "--nf0", "64", "--n_blocks", "20", "--n_filters", "64",
                 "--kernel_size", "16", "--out_channels_gcn", "512",
                 "--sh_lmax", "10"] if args.img >= 256 else
                ["--texture_size", "64", "--mipmap_level", "2",
                 "--nf0", "8", "--n_blocks", "2", "--n_filters", "8",
                 "--kernel_size", "4", "--out_channels_gcn", "32",
                 "--sh_lmax", "2"])
        train_rnr.main([
            "--data_root", root, "--obj_high_fp", "_/mesh.obj",
            "--obj_low_fp", "_/mesh.obj", "--obj_gcn_fp", "_/mesh.obj",
            "--img_size", str(args.img), *size,
            "--sphere_samples_fp", "nonexistent.mat",
            "--lighting_idx", "0", "--lighting_relight_idx", "1",
            # probe-file lighting init — without it the relight index
            # keeps the near-zero stitched init and relit renders are
            # black (see quality_gate.py)
            "--lp_dir", "_/lp",
            "--max_iter", str(args.iters),
            "--val_freq", str(args.val_every),
            "--ckp_freq", "1000000", "--log_freq", "200",
            "--sampling_pattern", "skipinv_4",
            "--sampling_pattern_val", "only_0",
            "--knn_approx", "true", "--knn_recall", "0.9",
            "--strat_min_dilation", "3", "--rays_dtype", "bfloat16",
            "--logging_root", os.path.join(root, "logs_trajectory"),
            *platform_args,
        ])
        return

    # parent: subprocess isolation + stdout parsing into the artifact
    log_path = os.path.join("/tmp", "r5_trajectory_child.log")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--iters", str(args.iters), "--img", str(args.img),
           "--val_every", str(args.val_every), "--root", root]
    if args.platform:
        cmd += ["--platform", args.platform]
    with open(log_path, "w") as lf:
        rc = subprocess.run(cmd, stdout=lf,
                            stderr=subprocess.STDOUT).returncode
    traj = {"iters": args.iters, "img": args.img, "rc": rc,
            "val": [], "relight": []}
    with open(log_path) as f:
        for line in f:
            m = VAL_RE.search(line)
            if m:
                row = {"iter": int(m.group(2)),
                       "mae": float(m.group(3)),
                       "psnr": float(m.group(4)),
                       "ssim": float(m.group(5))}
                (traj["relight"] if m.group(1) else traj["val"]).append(
                    row)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(traj, f, indent=1)
    print("TRAJECTORY", json.dumps(traj))
    # propagate failure so the queue does not flag a crashed child as a
    # completed phase (the r5q run died on a transient tunnel error at
    # the first validation and still reported rc=0)
    if rc != 0 or not traj["val"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

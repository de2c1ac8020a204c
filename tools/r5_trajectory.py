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

# values can be negative (relight PSNR on the synthetic-GT scene sits
# around 0 dB) or nan — `[\d.]+` alone silently drops those rows
_NUM = r"(-?[\d.]+(?:e-?\d+)?|-?nan|-?inf)"
VAL_RE = re.compile(
    r"Val( relight)? @ (\d+): mae {0} psnr {0} ssim {0}".format(_NUM))


def _latest_ckpt(log_root):
    """Newest model_iter-N.ckpt across run dirs -> (path, N)."""
    import glob

    best, best_it = None, -1
    for p in glob.glob(os.path.join(log_root, "*", "model_iter-*.ckpt")):
        m = re.search(r"model_iter-(\d+)\.ckpt$", p)
        if m and int(m.group(1)) > best_it:
            best, best_it = p, int(m.group(1))
    return best, best_it


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
    # transient-tunnel resilience: re-launch a crashed child up to N
    # times, resuming from the newest periodic checkpoint (the r5q 10k
    # run lost everything to one dropped relay response at iter 1000)
    ap.add_argument("--attempts", type=int, default=4)
    # re-parse an existing child log into the artifact without training
    # (used to regenerate artifacts written by a parent that ran with
    # the pre-fix VAL_RE, which dropped negative-PSNR relight rows)
    ap.add_argument("--parse_only", action="store_true")
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
        # resume from the newest periodic checkpoint of a previous
        # (crashed) attempt; 24 scene views - every 4th held out = 18
        # train views per epoch
        ckpt, it0 = _latest_ckpt(os.path.join(root, "logs_trajectory"))
        resume = (["--checkpoint", ckpt,
                   "--start_epoch", str(it0 // 18)] if ckpt else [])
        if ckpt:
            print(f"resuming from {ckpt} (iter {it0})", flush=True)
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
            "--ckp_freq", str(args.val_every), "--log_freq", "200",
            "--sampling_pattern", "skipinv_4",
            "--sampling_pattern_val", "only_0",
            "--knn_approx", "true", "--knn_recall", "0.9",
            "--strat_min_dilation", "3", "--rays_dtype", "bfloat16",
            "--logging_root", os.path.join(root, "logs_trajectory"),
            *resume, *platform_args,
        ])
        return

    # parent: subprocess isolation + stdout parsing into the artifact;
    # a crashed child (transient tunnel error) is re-launched and
    # resumes from its newest periodic checkpoint
    log_path = os.path.join("/tmp", "r5_trajectory_child.log")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--iters", str(args.iters), "--img", str(args.img),
           "--val_every", str(args.val_every), "--root", root]
    if args.platform:
        cmd += ["--platform", args.platform]
    if args.parse_only:
        rc, attempts = 0, 0
    else:
        open(log_path, "w").close()  # fresh log per parent invocation
        rc, attempts = 1, 0
        for attempt in range(max(1, args.attempts)):
            attempts = attempt + 1
            with open(log_path, "a") as lf:
                lf.write(f"\n=== attempt {attempts} ===\n")
                lf.flush()
                rc = subprocess.run(cmd, stdout=lf,
                                    stderr=subprocess.STDOUT).returncode
            if rc == 0:
                break
            print(f"attempt {attempts} rc={rc}; retrying from latest "
                  "checkpoint", flush=True)
    if args.parse_only and os.path.exists(args.out):
        prev = json.load(open(args.out))
        rc, attempts = prev.get("rc", rc), prev.get("attempts", attempts)
    traj = {"iters": args.iters, "img": args.img, "rc": rc,
            "attempts": attempts, "val": [], "relight": []}
    seen: dict = {}
    with open(log_path) as f:
        for line in f:
            m = VAL_RE.search(line)
            if m:
                row = {"iter": int(m.group(2)),
                       "mae": float(m.group(3)),
                       "psnr": float(m.group(4)),
                       "ssim": float(m.group(5))}
                # dedup resume-overlap validations by (channel, iter),
                # keeping the latest attempt's row
                seen[(bool(m.group(1)), row["iter"])] = row
    for (is_relight, _), row in sorted(seen.items(),
                                       key=lambda kv: kv[0][1]):
        (traj["relight"] if is_relight else traj["val"]).append(row)
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

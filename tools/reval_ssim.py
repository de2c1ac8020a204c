"""Recompute quality-gate SSIM columns from the arms' saved renders.

The driver's in-run SSIM was numerically invalid for unclipped
early-training relight outputs until the round-5 fix in
`rnr_tpu/ops/metrics.py` (the f32 Gaussian-window normalization error
times mu^2 swamped c2 at |x| ~ 1e4-1e5, and one validation printed
"ssim 16.6062").  The committed gate summaries therefore carry relight
SSIM values computed with the broken code (0.03 vs 0.81 across arms
whose relight PSNR differs by < 1 dB).

Rather than retrain, this tool recomputes every metric from each arm's
saved final validation PNGs (`val_out` / `val_relight_out` vs
`val_gt` / `val_relight_gt`, alpha from the scene's precomputed
alpha_map) with the FIXED metrics code.  The renders on disk are
display-referred (clipped to [0,1], 8-bit), so the recomputed values
are the SSIM/PSNR of what a user actually sees — consistent across
arms, which is what the cross-arm gate comparison needs.  The view
PSNR column doubles as a sanity check against the summary (it was
computed in the sane regime, so recomputed-vs-summary should agree to
within quantization).

Host-only (no TPU, no model): safe to run while the TPU queue is busy.

Usage:
  python tools/reval_ssim.py --root /tmp/rnr_qgate_r5 \
      --out tools/out/reval_ssim_r5.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _imread_rgb(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[:, :, ::-1]
    return img.astype(np.float32) / 255.0


def _final_stems(out_dir):
    """Newest validation iteration's image stems in a val_* dir."""
    stems = {}
    for p in glob.glob(os.path.join(out_dir, "*.png")):
        m = re.match(r"(\d+)_(\d+)\.png$", os.path.basename(p))
        if m:
            stems.setdefault(int(m.group(1)), []).append(
                (int(m.group(2)), p))
    if not stems:
        return None, []
    it = max(stems)
    return it, [p for _, p in sorted(stems[it])]


def _all_stems(out_dir):
    """All validation iterations' image stems: {iter: [paths]}."""
    stems: dict = {}
    for p in glob.glob(os.path.join(out_dir, "*.png")):
        m = re.match(r"(\d+)_(\d+)\.png$", os.path.basename(p))
        if m:
            stems.setdefault(int(m.group(1)), []).append(
                (int(m.group(2)), p))
    return {it: [p for _, p in sorted(v)] for it, v in stems.items()}


def _metrics_for(est_paths, gt_dir, alpha_dir):
    from rnr_tpu.utils.eval_metrics import compute_err_metrics_batch

    est, gt, alpha = [], [], []
    for p in est_paths:
        view = re.match(r"\d+_(\d+)\.png$", os.path.basename(p)).group(1)
        est.append(_imread_rgb(p))
        gt.append(_imread_rgb(os.path.join(gt_dir, f"{view}.png")))
        a = _imread_rgb(os.path.join(alpha_dir, f"{int(view):06d}.png"))
        alpha.append(a[..., :1] if a.ndim == 3 else a[..., None])
    est, gt, alpha = (np.stack(est), np.stack(gt), np.stack(alpha))
    m = compute_err_metrics_batch(
        est * alpha * 255.0, gt * alpha * 255.0, alpha,
        compute_ssim=True)
    return {"psnr_valid": m["psnr_valid_mean"],
            "ssim_valid": m["ssim_valid_mean"],
            "mae_valid": m["mae_valid_mean"]}


def reval_trajectory(run_dir, alpha_dir):
    """Display-referred metric trajectory over every saved val pass."""
    out = {}
    for channel, out_sub, gt_sub in (
        ("view", "val_out", "val_gt"),
        ("relight", "val_relight_out", "val_relight_gt"),
    ):
        rows = []
        gt_dir = os.path.join(run_dir, gt_sub)
        for it, paths in sorted(
                _all_stems(os.path.join(run_dir, out_sub)).items()):
            rows.append({"iter": it,
                         **_metrics_for(paths, gt_dir, alpha_dir)})
        if rows:
            out[channel] = rows
    return out


def reval_run(run_dir, alpha_dir):
    """Recompute metrics for one training-run dir -> dict or None."""
    from rnr_tpu.utils.eval_metrics import compute_err_metrics_batch

    out = {}
    for channel, out_sub, gt_sub in (
        ("view", "val_out", "val_gt"),
        ("relight", "val_relight_out", "val_relight_gt"),
    ):
        it, est_paths = _final_stems(os.path.join(run_dir, out_sub))
        if not est_paths:
            continue
        est, gt, alpha = [], [], []
        for p in est_paths:
            view = re.match(r"\d+_(\d+)\.png$", os.path.basename(p)).group(1)
            gt_p = os.path.join(run_dir, gt_sub, f"{view}.png")
            al_p = os.path.join(alpha_dir, f"{int(view):06d}.png")
            est.append(_imread_rgb(p))
            gt.append(_imread_rgb(gt_p))
            a = _imread_rgb(al_p)
            alpha.append(a[..., :1] if a.ndim == 3 else a[..., None])
        est, gt, alpha = (np.stack(est), np.stack(gt), np.stack(alpha))
        m = compute_err_metrics_batch(
            est * alpha * 255.0, gt * alpha * 255.0, alpha,
            compute_ssim=True)
        out[channel] = {
            "iter": it,
            "views": len(est_paths),
            "psnr_valid": m["psnr_valid_mean"],
            "ssim_valid": m["ssim_valid_mean"],
            "mae_valid": m["mae_valid_mean"],
        }
    return out or None


def main():
    # host-only tool: force CPU so the SSIM jnp calls never touch the
    # (possibly busy) TPU tunnel — JAX_PLATFORMS is ignored under the
    # container's sitecustomize, the config update is the only way
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rnr_qgate_r5")
    ap.add_argument("--alpha_dir", default=None,
                    help="precomputed alpha_map dir (default: "
                         "<root>/precomp_mesh/resol_<img>/alpha_map)")
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--out", default="tools/out/reval_ssim_r5.json")
    # trajectory mode: one run dir, metrics for EVERY saved val pass
    ap.add_argument("--trajectory_run", default=None,
                    help="run dir (containing val_out/) to re-score "
                         "per validation iteration instead of per arm")
    args = ap.parse_args()

    alpha_dir = args.alpha_dir or os.path.join(
        args.root, "precomp_mesh", f"resol_{args.img}", "alpha_map")
    if args.trajectory_run:
        result = {"run": args.trajectory_run, "img": args.img,
                  "basis": "clipped8",
                  **reval_trajectory(args.trajectory_run, alpha_dir)}
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        print("wrote", args.out)
        return
    result = {"root": args.root, "img": args.img, "basis": "clipped8",
              "note": ("metrics recomputed from saved 8-bit renders "
                       "with the fixed SSIM; display-referred "
                       "(outputs clipped to [0,1] before PNG)"),
              "arms": {}}
    # newest summary per tag wins: stale gate-config dirs (e.g. the
    # pre-lp-fit vacuous-relight runs under an older config hash) sort
    # before the current ones alphabetically, so order by mtime
    for summary_p in sorted(
            glob.glob(os.path.join(args.root, "logs_*", "*",
                                   "summary.json")),
            key=os.path.getmtime):
        run_dir = os.path.dirname(summary_p)
        tag_dir = os.path.basename(os.path.dirname(run_dir))
        m = re.match(r"logs_(.+)_([0-9a-f]{8})$", tag_dir)
        tag = m.group(1) if m else tag_dir
        r = reval_run(run_dir, alpha_dir)
        if r is None:
            continue
        summary = json.load(open(summary_p)).get("val", {})
        # sanity: view PSNR was computed in the sane regime, so the
        # display-referred recomputation should land within ~0.5 dB
        if "view" in r and "final_psnr_valid" in summary:
            r["view"]["summary_psnr_valid"] = summary["final_psnr_valid"]
            r["view"]["psnr_consistent"] = bool(
                abs(r["view"]["psnr_valid"] - summary["final_psnr_valid"])
                < 0.5)
        if "relight" in r and "final_relight_psnr_valid" in summary:
            r["relight"]["summary_psnr_valid"] = (
                summary["final_relight_psnr_valid"])
            r["relight"]["summary_ssim_valid"] = summary.get(
                "final_relight_ssim_valid")
        # keep the newest run per tag (dirs sort by timestamp name)
        result["arms"][tag] = r
        print(f"{tag}: " + json.dumps(r))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Quality gate: TPU-first GCN graph defaults vs reference-exact kNN.

Runs the REAL driver pipeline (scene -> precompute -> stitch -> train)
for each graph-construction ablation at realistic length and reports
final train loss + held-out validation PSNR/SSIM, providing the
documented evidence (VERDICT r1 item 9) that the TPU defaults
(ApproxTopK recall 0.9 + stratified Pallas candidates for high-dilation
blocks) do not cost quality vs the reference's exact windowed top-k.

Usage:
  timeout 5400 python tools/quality_gate.py --iters 2000 --img 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

ABLATIONS = {
    # TPU-first default: approx kNN for low-dilation windows + stratified
    # Pallas candidates for dilation >= 3
    "default_strat": ["--knn_approx", "true", "--knn_recall", "0.9",
                      "--strat_min_dilation", "3"],
    # round-1 default: approx windowed top-k everywhere
    "approx_windowed": ["--knn_approx", "true", "--knn_recall", "0.9",
                        "--strat_min_dilation", "0"],
    # reference-exact semantics
    "exact": ["--knn_approx", "false", "--strat_min_dilation", "0"],
    # stratified defaults + graph refresh every 4th block (the graphs
    # are already stochastic neighborhood priors; staleness candidates)
    "strat_refresh4": ["--knn_approx", "true", "--knn_recall", "0.9",
                       "--strat_min_dilation", "3",
                       "--graph_refresh_every", "4"],
    # --- round-3 precision/backend ablations (run vs default_strat) ---
    # bf16 ray-tensor storage (f32 accumulation everywhere reduced)
    "rays_bf16": ["--knn_approx", "true", "--knn_recall", "0.9",
                  "--strat_min_dilation", "3",
                  "--rays_dtype", "bfloat16"],
    # f32 U-Net/texture compute — isolates the shipped bf16 conv delta
    # (PARITY.md "known deltas"; VERDICT r2 item 4)
    "unet_f32": ["--knn_approx", "true", "--knn_recall", "0.9",
                 "--strat_min_dilation", "3",
                 "--unet_compute_dtype", "float32"],
    # Pallas implicit-GEMM conv backend for every 3x3 stride-1 conv
    "conv_pallas": ["--knn_approx", "true", "--knn_recall", "0.9",
                    "--strat_min_dilation", "3",
                    "--unet_conv_backend", "pallas"],
    # bf16 rays + pallas convs together (the round-3 perf defaults)
    "r3_fast": ["--knn_approx", "true", "--knn_recall", "0.9",
                "--strat_min_dilation", "3",
                "--rays_dtype", "bfloat16",
                "--unet_conv_backend", "pallas"],
    # reference-CLI-default GCN norm (train_rnr.py:89 norm_type='batch');
    # rnr_tpu ships norm none — this cell measures the delta (PARITY.md
    # "Known deltas")
    "gcn_norm_batch": ["--knn_approx", "true", "--knn_recall", "0.9",
                       "--strat_min_dilation", "3",
                       "--norm_type", "batch"],
    # --- round-5 arms ---
    # slab-formulation Pallas convs (one wide dot per tile)
    "conv_slab3": ["--knn_approx", "true", "--knn_recall", "0.9",
                   "--strat_min_dilation", "3",
                   "--rays_dtype", "bfloat16",
                   "--unet_conv_backend", "slab3"],
    # fan fusion OFF (isolates the in-kernel f32 fan construction the
    # defaults ship)
    "sh_fan_off": ["--knn_approx", "true", "--knn_recall", "0.9",
                   "--strat_min_dilation", "3",
                   "--rays_dtype", "bfloat16",
                   "--sh_fan_fuse", "false"],
    # shipped round-5 defaults at bench precision (bf16 rays + auto
    # convs + fan fusion on)
    "r5_fast": ["--knn_approx", "true", "--knn_recall", "0.9",
                "--strat_min_dilation", "3",
                "--rays_dtype", "bfloat16"],
    # --- relight-gap isolation arms (r5 followon) ---
    # seed replicate of r5_fast: measures the 2k-iter relight-PSNR
    # noise floor on the synthetic scene (whose relight GT is not
    # physically consistent with its probes — only cross-arm deltas
    # mean anything, and only above this floor)
    "r5_fast_seed1": ["--knn_approx", "true", "--knn_recall", "0.9",
                      "--strat_min_dilation", "3",
                      "--rays_dtype", "bfloat16", "--seed", "1"],
    # r5_fast with f32 ray tensors: isolates the bf16-ray-channel
    # factor if the exact-vs-fast relight delta exceeds the seed floor
    "rays_f32": ["--knn_approx", "true", "--knn_recall", "0.9",
                 "--strat_min_dilation", "3",
                 "--rays_dtype", "float32"],
}


def resolve_ablation(tag):
    """Arm tag -> driver flags.  The special tag "ship" gates EXACTLY
    the configuration bench.py will measure (tools/out/best_config.json
    through the same resolve_tuned_config whitelist), so a tuned default
    can never ship without canonical-scale quality evidence."""
    if tag != "ship":
        return ABLATIONS[tag]
    import bench

    tuned = bench.resolve_tuned_config()
    return ["--knn_approx", "true", "--knn_recall", "0.9",
            "--strat_min_dilation", "3",
            "--rays_dtype", tuned["rays_dtype"],
            "--gcn_compute_dtype", tuned["gcn_dtype"],
            "--unet_conv_backend", tuned["conv_backend"],
            "--sh_fan_fuse", str(tuned["sh_fan_fuse"]).lower(),
            "--graph_refresh_every", str(tuned["graph_refresh_every"])]


def _latest_summary(log_root):
    """Newest run's summary.json under log_root, or None."""
    if not os.path.isdir(log_root):
        return None
    for run in sorted(os.listdir(log_root), reverse=True):
        p = os.path.join(log_root, run, "summary.json")
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
    return None


def _gate_cfg(args):
    # "relight": "lp_fit" — the relight lighting is initialized from the
    # scene's real probe files (--lp_dir, LightingLP.fit_sh), like the
    # reference when probes exist.  The earlier marker True identified
    # runs WITHOUT --lp_dir, whose relight renders were black (the
    # relight index stayed at the near-zero stitched init) and whose
    # relight columns were therefore vacuous — the changed marker forces
    # those arms to re-train instead of resuming.
    return {"iters": args.iters, "img": args.img,
            "canonical": bool(args.canonical),
            "platform": args.platform, "relight": "lp_fit"}


def _arm_log_root(root, tag, cfg):
    """Per-arm log dir, namespaced by a hash of the gate config: a
    summary left by an earlier run with different --iters/--img/
    --canonical/--platform must not short-circuit the arm (ADVICE r4).
    Every config (including the default) gets the hash suffix, so runs
    from before the hashing change never resume — by design, since
    their configs are unverifiable."""
    import hashlib

    canon = json.dumps(cfg, sort_keys=True)
    h = hashlib.sha256(canon.encode()).hexdigest()[:8]
    return os.path.join(root, f"logs_{tag}_{h}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--root", type=str, default=None)
    # run exactly one arm in THIS process (used by the parent to isolate
    # each arm in a subprocess: the axon tunnel client leaks ~35 MB of
    # host RSS per training iteration — round-4's canonical gate died at
    # 130 GB RSS mid-arm-2, taking every later arm with it)
    ap.add_argument("--one_arm", type=str, default=None)
    # incremental output path: partial results survive a crashed arm
    ap.add_argument("--out", type=str, default=None)
    # canonical-scale gate (VERDICT r2 item 4): the shipped defaults'
    # model sizes — tex 512/24ch/4mip, SH lmax 10, nf0 64 x 5 downs, GCN
    # 20 blocks k=16 (reference train_rnr.sh:1-5); combine with
    # --img 512 for the full benchmark configuration
    ap.add_argument("--canonical", action="store_true")
    # round-3 precision/backend variants are opt-in (pass them via
    # --ablations); the default set is the graph-construction gate
    ap.add_argument("--ablations", type=str,
                    default="default_strat,approx_windowed,exact,"
                            "strat_refresh4")
    # forwarded to every driver invocation; pass "cpu" to validate the
    # gate pipeline off-TPU (the sitecustomize-registered axon backend
    # ignores JAX_PLATFORMS, so this must go through the drivers'
    # setup_jax config path)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    platform_args = (
        ["--platform", args.platform] if args.platform else []
    )

    from test_pipeline_e2e import make_scene
    from rnr_tpu.drivers import precompute, stitch_lp, train_rnr

    root = args.root or tempfile.mkdtemp(prefix="rnr_qgate_")
    print("scene root:", root, flush=True)
    if not os.path.isdir(os.path.join(root, "rgb0")):
        # dense enough that the stratified-kNN path actually engages
        # (needs V >= kernel_size * stratum_width = 128); canonical uses
        # a ~7.5k-vertex sphere matching the reference's mesh_7500v
        if args.canonical:
            make_scene(root, num_view=24, hw=args.img, n_lat=72, n_lon=104)
        else:
            make_scene(root, num_view=24, hw=args.img, n_lat=24, n_lon=36)
        precompute.main(
            ["--data_root", root, "--img_size", str(args.img),
             "--sampling_pattern", "all", *platform_args]
        )
        stitch_lp.main(
            ["--data_root", root, "--sampling_pattern", "skipinv_4",
             "--img_suffix", ".png", "--lp_h", "128", "--lp_w", "256"]
        )

    if args.canonical:
        size_args = [
            "--texture_size", "512", "--mipmap_level", "4",
            "--nf0", "64", "--n_blocks", "20", "--n_filters", "64",
            "--kernel_size", "16", "--out_channels_gcn", "512",
            "--sh_lmax", "10",
        ]
    else:
        size_args = [
            "--texture_size", "128", "--mipmap_level", "3",
            "--nf0", "32", "--n_blocks", "8", "--n_filters", "32",
            "--kernel_size", "8", "--out_channels_gcn", "128",
            "--sh_lmax", "4",
        ]
    common = [
        "--data_root", root, "--obj_high_fp", "_/mesh.obj",
        "--obj_low_fp", "_/mesh.obj", "--obj_gcn_fp", "_/mesh.obj",
        "--img_size", str(args.img), *size_args,
        "--sphere_samples_fp", "nonexistent.mat",
        # relight channel: every arm's final validation also scores
        # relighting PSNR/SSIM against the rgb1/ second-lighting ground
        # truth (reference train_rnr.py:549-555,834,878-881) — the
        # flagship capability must be quality-gated too (VERDICT r4 #2)
        "--lighting_idx", "0", "--lighting_relight_idx", "1",
        # real probe files -> LightingLP.fit_sh initializes EVERY
        # lighting index (reference train_rnr.py:264-275); without this
        # the relight index keeps the near-zero stitched init and every
        # relit render is black
        "--lp_dir", "_/lp",
        "--max_iter", str(args.iters),
        # one held-out validation pass at the very end
        "--val_freq", str(args.iters - 1),
        "--ckp_freq", "1000000", "--log_freq", "200",
        "--sampling_pattern", "skipinv_4",
        "--sampling_pattern_val", "only_0",
        *platform_args,
    ]

    def _cfg_for(tag):
        # the "ship" arm's flags come from best_config.json — hash them
        # into the log root so a changed tuned config re-trains instead
        # of resuming a summary trained at the previous config
        cfg = _gate_cfg(args)
        if tag == "ship":
            cfg = dict(cfg, ship_flags=resolve_ablation("ship"))
        return cfg

    if args.one_arm:
        tag = args.one_arm
        log_root = _arm_log_root(root, tag, _cfg_for(tag))
        print(f"=== {tag} ===", flush=True)
        train_rnr.main(common + ["--logging_root", log_root]
                       + resolve_ablation(tag))
        import resource
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(f"arm {tag} peak RSS {rss / 1e6:.2f} GB", flush=True)
        return

    import subprocess

    results = {}
    for tag in args.ablations.split(","):
        log_root = _arm_log_root(root, tag, _cfg_for(tag))
        if _latest_summary(log_root) is None:
            # fresh process per arm: one leaking/crashing arm cannot
            # take down the others, and host RSS resets between arms
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one_arm", tag, "--root", root,
                   "--iters", str(args.iters), "--img", str(args.img),
                   "--ablations", args.ablations]
            if args.canonical:
                cmd.append("--canonical")
            if args.platform:
                cmd += ["--platform", args.platform]
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                print(f"arm {tag} exited rc={rc}", flush=True)
        summary = _latest_summary(log_root)
        results[tag] = (summary if summary is not None
                        else {"error": "no summary.json (arm crashed)"})
        if args.out:
            # merge with an existing artifact so a partial re-run (e.g.
            # a subset of arms after a config fix) updates those arms in
            # place instead of dropping the others
            merged = {}
            if os.path.exists(args.out):
                try:
                    with open(args.out) as f:
                        merged = json.load(f)
                except Exception:
                    merged = {}
            merged.update(results)
            with open(args.out, "w") as f:
                json.dump(merged, f)
    print("QUALITY_GATE", json.dumps(results))


if __name__ == "__main__":
    main()

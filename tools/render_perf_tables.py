"""Render the README performance table from machine artifacts.

VERDICT r4 item 6: hand-copied prose numbers drifted from the canonical
artifacts every round.  This script renders the README's performance
block from `BENCH_r{N}.json` + `KERNELS_r{N}.json` + the newest
`tools/out/tpu_bench_r*.json` — and `--check` asserts the committed
README matches byte-for-byte (wired into tests/test_bench_config.py),
so a stale number is a test failure.

Usage:
  python tools/render_perf_tables.py           # rewrite README in place
  python tools/render_perf_tables.py --check   # exit 1 on drift
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN AUTOGEN:PERF (tools/render_perf_tables.py) -->"
END = "<!-- END AUTOGEN:PERF -->"


def _round_key(path):
    """Sort key by numeric round suffix (lexicographic order would put
    r10 before r9 for the unpadded tools/out names)."""
    m = re.search(r"_r(\d+)\.", os.path.basename(path))
    return (int(m.group(1)) if m else -1, path)


def _newest(pattern):
    paths = sorted(glob.glob(os.path.join(ROOT, pattern)), key=_round_key)
    return paths[-1] if paths else None


def _load(path):
    with open(path) as f:
        return json.load(f)


def render() -> str:
    bench_paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                         key=_round_key)
    bench = _load(bench_paths[-1])["parsed"]
    prev = (_load(bench_paths[-2])["parsed"]
            if len(bench_paths) > 1 else None)
    rnd = int(re.search(r"BENCH_r(\d+)", bench_paths[-1]).group(1))
    bench_src = os.path.basename(bench_paths[-1])
    # mid-round: the queue's bench.py preview is the same canonical
    # measurement, produced before the driver writes BENCH_r{N}.json —
    # prefer it when it is from a NEWER round than the newest BENCH
    pv = _newest("tools/out/bench_preview_r*.json")
    if pv:
        pr = int(re.search(r"bench_preview_r(\d+)", pv).group(1))
        # the preview is written via `bench.py | tail -1`; a bench crash
        # mid-pipe can leave truncated/non-JSON content (tail exits 0),
        # so fall back to the newest BENCH artifact on any parse error
        try:
            pv_bench = _load(pv)
            if pv_bench.get("value") is None:
                raise ValueError("preview has no measurement")
        except Exception as e:
            print(f"warning: ignoring corrupt preview {pv}: {e}",
                  file=sys.stderr)
            pv_bench = None
        if pr > rnd and pv_bench is not None:
            prev = bench
            bench = pv_bench
            rnd = pr
            bench_src = f"tools/out/{os.path.basename(pv)}"
    kern = _load(_newest("KERNELS_r*.json"))["gates"]
    tb = _load(_newest("tools/out/tpu_bench_r*.json"))

    ex = bench["extras"]
    pex = prev["extras"] if prev else {}

    def fps_ms(fps):
        return f"**{fps:.2f} frames/s** ({1000.0 / fps:.1f} ms)"

    b4 = None
    for k, v in tb.get("batch", {}).items():
        if k.startswith("b4"):
            b4 = v["fps"]

    rows = []
    rows.append((
        "Full RNR train step (fwd+bwd), batch 1",
        f"{fps_ms(bench['value'])} — {bench['vs_baseline']:.2f}x the "
        f"round-1 anchor",
        f"{prev['value']:.2f} frames/s" if prev else "—",
    ))
    b2 = ex.get("train_b2_frames_per_s")
    rows.append((
        "batch 2 / batch 4 (`--unet_remat wide` at b4)",
        f"**{b2:.2f}" + (f" / {b4:.2f}" if b4 else "") + " frames/s**",
        (f"{pex.get('train_b2_frames_per_s'):.2f}"
         if pex.get("train_b2_frames_per_s") else "—"),
    ))
    rows.append((
        "Inference (eval step, v_feature cached across the sequence)",
        f"**{ex['infer_frames_per_s']:.2f} frames/s** "
        f"({ex['infer_rays_per_s'] / 1e6:.1f}M rays/s)",
        (f"{pex.get('infer_frames_per_s'):.2f}"
         if pex.get("infer_frames_per_s") else "—"),
    ))
    ro = kern.get("rasterize_opt_diff")
    if ro:
        rows.append((
            "Differentiable rasterization `rasterize_opt` "
            "(512^2, 12k faces, rgb+alpha coverage grads)",
            f"fwd **{ro['fwd_ms']:.1f} ms**, fwd+bwd "
            f"**{ro['fwdbwd_ms']:.1f} ms**",
            "41.6 / 145.9 (r3)",
        ))
    rp = kern.get("rasterize_pallas")
    if rp:
        rows.append((
            "Pallas tile-binned rasterization (12k-face mesh)",
            f"**{rp['ms']:.1f} ms** "
            f"({rp['xla_oracle_ms'] / rp['ms']:.1f}x vs the XLA scan "
            f"oracle, face agreement {rp['face_index_agreement']:.5f})",
            "22.2 (r3)",
        ))
    gb = kern.get("render_gbuffer")
    if gb:
        rows.append((
            "Fused G-buffer render (14 maps)",
            f"{gb['ms']:.1f} ms",
            "44.1 (r3)",
        ))
    sh = kern.get("sh_shade")
    if sh:
        rows.append((
            "Fused Pallas SH shading (512^2 x 26 rays)",
            f"fwd+bwd **{sh['fwdbwd_ms']:.1f} ms vs "
            f"{sh['xla_fwdbwd_ms']:.1f} XLA** in-gate "
            f"(grad parity {sh['grad_rel_err']:.1e})",
            "fwd 28.8 (r3)",
        ))
    if ex.get("train_1024_frames_per_s"):
        rows.append((
            "1024x1024 (4x pixels, same model)",
            f"**{ex['train_1024_frames_per_s']:.2f} train / "
            f"{ex['infer_1024_frames_per_s']:.2f} infer frames/s**",
            (f"{pex.get('train_1024_frames_per_s'):.2f} / "
             f"{pex.get('infer_1024_frames_per_s'):.2f}"
             if pex.get("train_1024_frames_per_s") else "—"),
        ))

    hdr = ("| Measurement (512x512, canonical config: tex 512/24ch/4mip, "
           "SH lmax 10, 26 rays, U-Net nf0 64x5, GCN 20 blocks k=16 on "
           f"7500 verts) | Round {rnd} | Prior |")
    bc_path = os.path.join(ROOT, "tools/out/best_config.json")
    tuned_line = ""
    if os.path.exists(bc_path):
        bc = _load(bc_path)
        knobs = [f"{k}={bc[k]}" for k in (
            "conv_backend", "rays_dtype", "gcn_dtype", "sh_fan_fuse",
            "graph_refresh_every") if k in bc]
        tuned_line = ("Tuned defaults (`tools/out/best_config.json`): `"
                      + "`, `".join(knobs) + "`.")
    lines = [
        BEGIN,
        f"Source artifacts: `{bench_src}` "
        f"(canonical headline), `{os.path.basename(_newest('KERNELS_r*.json'))}` "
        f"(kernel gates, all_pass="
        f"{str(_load(_newest('KERNELS_r*.json'))['all_pass']).lower()}), "
        f"`tools/out/{os.path.basename(_newest('tools/out/tpu_bench_r*.json'))}` "
        f"(A/B cells).  " + tuned_line
        + "  Regenerate with `python tools/render_perf_tables.py`.",
        "",
        hdr,
        "|---|---|---|",
    ]
    for a, b, c in rows:
        lines.append(f"| {a} | {b} | {c} |")
    lines.append(END)
    return "\n".join(lines)


BEGIN_Q = "<!-- BEGIN AUTOGEN:QUALITY (tools/render_perf_tables.py) -->"
END_Q = "<!-- END AUTOGEN:QUALITY -->"

ARM_LABEL = {
    "r5_fast": "shipped defaults (pallas3 convs, bf16 rays, fan fuse)",
    "ship": "tuned bench config (tools/out/best_config.json)",
    "exact": "reference-exact kNN, f32, XLA convs",
    "sh_fan_off": "fan fusion off (materialized bf16 ray fan)",
    "conv_slab3": "slab-3×3 conv formulation",
    "r5_fast_seed1": "shipped defaults, seed 1 (relight noise floor)",
    "rays_f32": "shipped defaults with f32 ray tensors",
}


def render_quality() -> str:
    gate_path = _newest("tools/out/quality_gate_canonical_r*.json")
    gate = _load(gate_path)
    lines = [
        BEGIN_Q,
        f"Canonical 512² / 2k-iteration on-device quality gate "
        f"(`tools/out/{os.path.basename(gate_path)}`, one subprocess "
        f"per arm, lp-fit relighting channel).  Regenerate with "
        f"`python tools/render_perf_tables.py`.",
        "",
        "| Gate arm | View PSNR / SSIM | Relight PSNR / SSIM "
        "(unclipped float) | Relight PSNR / SSIM (display-referred)† |",
        "|---|---|---|---|",
    ]
    exact = gate.get("exact", {}).get("val") or {}
    reval_path = _newest("tools/out/reval_ssim_r*.json")
    reval = (_load(reval_path).get("arms", {}) if reval_path else {})
    exact_rv = reval.get("exact", {}).get("relight") or {}

    def cell(v, key):
        p, s = v.get(f"final_{key}psnr_valid"), v.get(
            f"final_{key}ssim_valid")
        if p is None:
            return "—"
        ref = exact.get(f"final_{key}psnr_valid")
        rel = ""
        if ref is not None and v is not exact:
            # multiplicative ratio is meaningless near 0 dB (the
            # synthetic relight GT regime) — quote the dB delta there
            rel = (f" ({p / ref:.3f}× exact)" if ref > 3.0
                   else f" (Δ{p - ref:+.2f} dB vs exact)")
        return f"{p:.4f} / {s:.4f}{rel}"

    def rv_cell(tag):
        rl = reval.get(tag, {}).get("relight")
        if not rl:
            return "—"
        rel = ""
        if exact_rv and tag != "exact":
            rel = (f" (Δ{rl['psnr_valid'] - exact_rv['psnr_valid']:+.2f}"
                   f" dB vs exact)")
        return (f"{rl['psnr_valid']:.4f} / {rl['ssim_valid']:.4f}{rel}")

    for tag, entry in gate.items():
        v = entry.get("val")
        if not v:
            lines.append(f"| `{tag}` | arm crashed | — | — |")
            continue
        lines.append(f"| `{tag}` — {ARM_LABEL.get(tag, tag)} | "
                     f"{cell(v, '')} | {cell(v, 'relight_')} | "
                     f"{rv_cell(tag)} |")

    lines += [
        "",
        "Relight PSNR on this gate hovers near 0 dB by construction: "
        "the synthetic scene's second-lighting images are an arbitrary "
        "shading pattern, not a physical render under the probe, so "
        "only cross-arm deltas are meaningful (on real captures the "
        "reference's own relight PSNRs are the BASELINE.md target).",
    ]
    if reval:
        lines += [
            "",
            "† Display-referred columns (`tools/reval_ssim.py`, "
            "artifact `tools/out/" + os.path.basename(reval_path)
            + "`) are recomputed from each arm's saved 8-bit renders "
            "(clipped to [0,1]) with the round-5 numerically-fixed "
            "SSIM; the unclipped-float relight SSIM recorded in the "
            "gate summaries predates that fix and is unreliable, and "
            "the ~1 dB unclipped-float PSNR spread across arms "
            "collapses once out-of-range overshoot is clipped away "
            "(shipped defaults land within 0.01 dB of exact).",
        ]

    # long-trajectory artifact (VERDICT r4 item 7)
    traj_path = (_newest("tools/out/trajectory_r5_lp.json")
                 or _newest("tools/out/trajectory_r*.json"))
    if traj_path:
        t = _load(traj_path)
        if t.get("val"):
            first, last = t["val"][0], t["val"][-1]
            rl = t["relight"][-1] if t.get("relight") else None
            lines += [
                "",
                f"Long trajectory (`tools/out/"
                f"{os.path.basename(traj_path)}`, {t['iters']} iters at "
                f"{t['img']}²): view PSNR {first['psnr']:.3f} @ "
                f"{first['iter']} → {last['psnr']:.3f} @ "
                f"{last['iter']}"
                + (f"; relight PSNR {rl['psnr']:.3f} @ {rl['iter']}"
                   if rl else "") + ".",
            ]
            rvt_path = _newest("tools/out/reval_traj_r*.json")
            if rvt_path:
                rvt = _load(rvt_path)
                rv = rvt.get("relight") or []
                vv = rvt.get("view") or []
                if rv and vv:
                    lines += [
                        "",
                        f"Display-referred† trajectory (`tools/out/"
                        f"{os.path.basename(rvt_path)}`): view PSNR "
                        f"{vv[0]['psnr_valid']:.3f} → "
                        f"{vv[-1]['psnr_valid']:.3f}, relight PSNR "
                        f"{rv[0]['psnr_valid']:.3f} @ {rv[0]['iter']} → "
                        f"{rv[-1]['psnr_valid']:.3f} @ {rv[-1]['iter']} "
                        f"(SSIM {rv[0]['ssim_valid']:.3f} → "
                        f"{rv[-1]['ssim_valid']:.3f}) — relighting "
                        f"quality on-screen improves through training; the "
                        f"declining unclipped-float relight PSNR above "
                        f"tracks growing out-of-range overshoot, not "
                        f"visible error.",
                    ]
    chk = os.path.join(ROOT, "tools/out/ship_gate_check.json")
    if os.path.exists(chk):
        c = _load(chk)
        lines += ["", f"Tuned-config shipping guard "
                      f"(`tools/r5_gate_check.py`): **{c['result']}**."]
    lines.append(END_Q)
    return "\n".join(lines)


BEGIN_S = "<!-- BEGIN AUTOGEN:STEPBREAKDOWN (tools/render_perf_tables.py) -->"
END_S = "<!-- END AUTOGEN:STEPBREAKDOWN -->"


def render_step_breakdown() -> str:
    """The PERFORMANCE.md 'where the step goes' table, from the newest
    tools/out/profile_components_r*.log (VERDICT r4 item 6: prose
    numbers must be machine-rendered, not hand-copied)."""
    prof_path = _newest("tools/out/profile_components_r*.log")
    prof = {}
    with open(prof_path) as f:
        for line in f:
            m = re.match(r"(\S.*?)\s+([\d.]+) ms", line)
            if m:
                prof[m.group(1)] = float(m.group(2))
    tb = _load(_newest("tools/out/tpu_bench_r*.json"))
    best = min(tb["step_b1"].items(), key=lambda kv: kv[1]["ms"])

    def g(key):
        return prof.get(key, float("nan"))

    rows = [
        ("U-Net (fwd+bwd)",
         f"{g('unet_fwd+bwd'):.1f}",
         f"conv-occupancy-bound (see the conv wall below); fwd alone "
         f"{g('unet_forward'):.1f}"),
        ("Texture sample + scatter-grad",
         f"{g('texture_sample'):.1f} + {g('texture_backward'):.1f}",
         "Pallas matmul-gather/scatter (was 97 autodiff XLA)"),
        ("GCN (20 blocks, k=16)",
         f"{g('gcn_forward'):.1f}",
         "stratified Pallas kNN (was 144 round-1); "
         "`graph_refresh_every` reuses block graphs"),
        ("Ray fans + net input",
         f"{g('ray_sampler'):.1f}",
         "VPU vector math; the fan still feeds the U-Net's ray "
         "channels"),
        ("SH shading fwd + bwd",
         f"{g('ray_render_sh_fwd'):.1f} + {g('ray_render_sh_bwd'):.1f}",
         "fused Pallas ladder (XLA path: 47.9 ms fwd+bwd in-gate)"),
        ("Losses + Adam",
         (f"{g('full_train_step') - g('loss_and_grads'):.1f}"
          if "loss_and_grads" in prof else "~15"),
         ("measured: full step − loss_and_grads cell (Adam update + "
          "masked metrics); " if "loss_and_grads" in prof else "")
         + "state donation (round 4) removes the double-resident update"),
    ]
    lines = [
        BEGIN_S,
        f"Source: `tools/out/{os.path.basename(prof_path)}` (isolated "
        f"stages overlap, so they sum past the {best[1]['ms']:.1f} ms "
        f"step of the best A/B cell `{best[0]}`, `tools/out/"
        f"{os.path.basename(_newest('tools/out/tpu_bench_r*.json'))}`). "
        f"Regenerate with `python tools/render_perf_tables.py`.",
        "",
        "| Stage | ~ms | Notes |",
        "|---|---|---|",
    ]
    for a, b, c in rows:
        lines.append(f"| {a} | {b} | {c} |")
    lines += [
        "",
        f"(The profile log's `ray_render_backward "
        f"{g('ray_render_backward'):.0f} ms` cell is the "
        "light-probe-sampling `ray_render` path — used by LP-lighting "
        "fits and no-grad relight validation, never by the canonical "
        "train step, which takes the SH-direct `ray_render_sh` path "
        "above.)",
        END_S,
    ]
    return "\n".join(lines)


def _splice(text, begin, end, block):
    pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end),
                         re.DOTALL)
    return pattern.sub(lambda _: block, text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        print("README.md is missing the AUTOGEN:PERF markers", file=sys.stderr)
        sys.exit(2)
    block = render()
    pattern = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END),
                         re.DOTALL)
    new_text = pattern.sub(lambda _: block, text)
    qblock = render_quality()
    if BEGIN_Q in new_text and END_Q in new_text:
        qpattern = re.compile(re.escape(BEGIN_Q) + r".*?" + re.escape(END_Q),
                              re.DOTALL)
        new_text = qpattern.sub(lambda _: qblock, new_text)
    else:
        # first render: insert the quality block right after the perf one
        new_text = new_text.replace(END, END + "\n\n" + qblock, 1)
    perf_md = os.path.join(ROOT, "docs", "PERFORMANCE.md")
    with open(perf_md) as f:
        ptext = f.read()
    sblock = render_step_breakdown()
    if BEGIN_S in ptext and END_S in ptext:
        new_ptext = _splice(ptext, BEGIN_S, END_S, sblock)
    else:
        new_ptext = ptext  # markers not placed yet — no-op until added
    if args.check:
        stale = []
        if new_text != text:
            stale.append("README.md")
        if new_ptext != ptext:
            stale.append("docs/PERFORMANCE.md")
        if stale:
            print(f"{', '.join(stale)} stale vs artifacts — run "
                  "python tools/render_perf_tables.py", file=sys.stderr)
            sys.exit(1)
        print("README + PERFORMANCE tables match artifacts")
        return
    with open(readme, "w") as f:
        f.write(new_text)
    if new_ptext != ptext:
        with open(perf_md, "w") as f:
            f.write(new_ptext)
    print("README + PERFORMANCE tables rendered")


if __name__ == "__main__":
    main()

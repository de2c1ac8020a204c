"""Regression tests for the round-5 evidence-tooling parsers.

These pin three silent-data-loss bugs found by review on 2026-08-20:
negative-PSNR validation rows dropped by the trajectory parser, stale
round selection by lexicographic artifact sort, and the val-PNG stem
grouping used by the display-referred reval."""

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    # tools insert their own sys.path entries on import; harmless here
    spec.loader.exec_module(mod)
    return mod


def test_trajectory_val_re_accepts_negative_and_nan():
    traj = _load_tool("r5_trajectory")
    lines = {
        "Val @ 1999: mae 75.3578 psnr 9.1310 ssim 0.4550":
            (False, 1999, 9.1310),
        "Val relight @ 1999: mae 210.35 psnr -0.3722 ssim 0.0278":
            (True, 1999, -0.3722),
        "Val relight @ 7000: mae 277.89 psnr -4.0439 ssim 0.7440":
            (True, 7000, -4.0439),
        "Val relight @ 1000: mae 1.2 psnr nan ssim -inf": (True, 1000),
        "Val @ 500: mae 3.4e-02 psnr 1e3 ssim 0.5": (False, 500, 1000.0),
    }
    for line, expect in lines.items():
        m = traj.VAL_RE.search(line)
        assert m, line
        assert bool(m.group(1)) == expect[0]
        assert int(m.group(2)) == expect[1]
        if len(expect) > 2:
            assert float(m.group(4)) == expect[2]


def test_render_tables_round_key_orders_numerically():
    rpt = _load_tool("render_perf_tables")
    paths = ["tools/out/tpu_bench_r10.json", "tools/out/tpu_bench_r9.json",
             "tools/out/tpu_bench_r5.json"]
    assert sorted(paths, key=rpt._round_key)[-1].endswith("r10.json")


def test_reval_stem_grouping(tmp_path):
    reval = _load_tool("reval_ssim")
    d = tmp_path / "val_out"
    d.mkdir()
    for name in ("00001000_00000.png", "00001000_00001.png",
                 "00002000_00000.png", "not_a_val_image.png"):
        (d / name).touch()
    stems = reval._all_stems(str(d))
    assert sorted(stems) == [1000, 2000]
    assert [os.path.basename(p) for p in stems[1000]] == [
        "00001000_00000.png", "00001000_00001.png"]
    it, paths = reval._final_stems(str(d))
    assert it == 2000 and len(paths) == 1

"""bench.py tuned-config resolution: file defaults vs env overrides.

The round-3 on-device queue writes tools/out/best_config.json with the
A/B-winning conv backend / rays dtype (tools/tpu_bench_r3.py); a
driver-run `python bench.py` must pick those up with no env set, and
BENCH_* env vars must still win over the file.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    # import bench.py from a COPY rooted in tmp_path so the test controls
    # the sibling tools/out/best_config.json without touching the repo's
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    bench_py = tmp_path / "bench.py"
    bench_py.write_text(src)
    (tmp_path / "tools" / "out").mkdir(parents=True)
    spec = importlib.util.spec_from_file_location("_bench_copy", bench_py)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_bench_copy"] = spec.loader.exec_module(mod) or mod
    for var in ("BENCH_CONV_BACKEND", "BENCH_RAYS_DTYPE", "BENCH_GCN_DTYPE",
                "BENCH_GCN_REFRESH", "BENCH_SH_FAN"):
        monkeypatch.delenv(var, raising=False)
    yield mod, tmp_path
    sys.modules.pop("_bench_copy", None)


def test_defaults_without_file(bench_mod):
    mod, _ = bench_mod
    got = mod.resolve_tuned_config()
    assert got == {"conv_backend": "xla", "rays_dtype": "float32",
                   "gcn_dtype": "float32", "sh_fan_fuse": True,
                   "graph_refresh_every": 1}


def test_file_supplies_defaults(bench_mod):
    mod, root = bench_mod
    with open(root / "tools" / "out" / "best_config.json", "w") as f:
        json.dump({"conv_backend": "pallas", "rays_dtype": "bfloat16"}, f)
    got = mod.resolve_tuned_config()
    assert got["conv_backend"] == "pallas"
    assert got["rays_dtype"] == "bfloat16"
    assert got["gcn_dtype"] == "float32"  # absent key keeps default


def test_env_overrides_file(bench_mod, monkeypatch):
    mod, root = bench_mod
    with open(root / "tools" / "out" / "best_config.json", "w") as f:
        json.dump({"conv_backend": "pallas", "rays_dtype": "bfloat16"}, f)
    monkeypatch.setenv("BENCH_CONV_BACKEND", "xla")
    monkeypatch.setenv("BENCH_RAYS_DTYPE", "float32")
    got = mod.resolve_tuned_config()
    assert got["conv_backend"] == "xla"
    assert got["rays_dtype"] == "float32"


def test_corrupt_file_falls_back(bench_mod):
    mod, root = bench_mod
    with open(root / "tools" / "out" / "best_config.json", "w") as f:
        f.write("{not json")
    got = mod.resolve_tuned_config()
    assert got["conv_backend"] == "xla"


def test_graph_refresh_parsed_and_clamped(bench_mod, monkeypatch):
    """Round 5: graph_refresh_every flows from best_config.json (or
    BENCH_GCN_REFRESH) with a [1, 20] whitelist clamp."""
    mod, root = bench_mod
    with open(root / "tools" / "out" / "best_config.json", "w") as f:
        json.dump({"graph_refresh_every": 4}, f)
    assert mod.resolve_tuned_config()["graph_refresh_every"] == 4
    monkeypatch.setenv("BENCH_GCN_REFRESH", "2")
    assert mod.resolve_tuned_config()["graph_refresh_every"] == 2
    monkeypatch.setenv("BENCH_GCN_REFRESH", "999")   # out of range
    assert mod.resolve_tuned_config()["graph_refresh_every"] == 1
    monkeypatch.setenv("BENCH_GCN_REFRESH", "junk")  # unparsable
    assert mod.resolve_tuned_config()["graph_refresh_every"] == 1


def test_ship_arm_resolves_from_best_config(monkeypatch):
    """The quality gate's dynamic "ship" arm trains exactly the tuned
    bench configuration (tools/quality_gate.py::resolve_ablation)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import quality_gate
        flags = quality_gate.resolve_ablation("ship")
    finally:
        sys.path.pop(0)
    # driver-flag pairs, including the tuned keys
    pairs = dict(zip(flags[::2], flags[1::2]))
    for k in ("--unet_conv_backend", "--rays_dtype", "--gcn_compute_dtype",
              "--sh_fan_fuse", "--graph_refresh_every"):
        assert k in pairs, flags
    import bench
    tuned = bench.resolve_tuned_config()
    assert pairs["--unet_conv_backend"] == tuned["conv_backend"]
    assert pairs["--graph_refresh_every"] == str(
        tuned["graph_refresh_every"])


def test_readme_perf_table_matches_artifacts():
    """VERDICT r4 item 6: the README performance block is rendered from
    BENCH_r*/KERNELS_r*/tools/out artifacts; drift is a failure."""
    import subprocess, sys, os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "render_perf_tables.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr + r.stdout

"""tools/r5_gate_check.py: tuned bench defaults cannot ship without
canonical gate evidence (>=0.95x exact on view AND relight PSNR)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FALLBACK = {"conv_backend": "pallas3", "rays_dtype": "bfloat16",
            "gcn_dtype": "float32", "sh_fan_fuse": True,
            "graph_refresh_every": 1}


_counter = [0]


def _run(tmp_path, best, gate):
    """Run r5_gate_check.py in a repo-shaped sandbox; return (verdict,
    resulting best_config)."""
    _counter[0] += 1
    root = tmp_path / f"repo{_counter[0]}"
    (root / "tools" / "out").mkdir(parents=True)
    shutil.copy(os.path.join(REPO, "tools", "r5_gate_check.py"),
                root / "tools" / "r5_gate_check.py")
    with open(root / "tools" / "out" / "best_config.json", "w") as f:
        json.dump(best, f)
    with open(root / "tools" / "out" /
              "quality_gate_canonical_r5.json", "w") as f:
        json.dump(gate, f)
    subprocess.run([sys.executable, "tools/r5_gate_check.py"],
                   cwd=root, capture_output=True, text=True)
    with open(root / "tools" / "out" / "ship_gate_check.json") as f:
        verdict = json.load(f)
    with open(root / "tools" / "out" / "best_config.json") as f:
        best_after = json.load(f)
    return verdict, best_after


def _gate(ship_view, ship_rel, exact_view=9.0, exact_rel=8.0):
    mk = lambda v, r: {"val": {"final_psnr_valid": v,
                               "final_relight_psnr_valid": r}}
    return {"ship": mk(ship_view, ship_rel),
            "exact": mk(exact_view, exact_rel)}


def test_passing_ship_config_kept(tmp_path):
    best = dict(FALLBACK, graph_refresh_every=4)
    verdict, after = _run(tmp_path, best, _gate(8.9, 7.9))
    assert verdict["result"] == "ok_gated"
    assert after["graph_refresh_every"] == 4


def test_relight_regression_reverts(tmp_path):
    best = dict(FALLBACK, graph_refresh_every=4)
    verdict, after = _run(tmp_path, best, _gate(8.9, 5.0))
    assert verdict["result"] == "reverted_quality"
    assert after["graph_refresh_every"] == 1


def test_near_zero_psnr_uses_db_slack(tmp_path):
    """Relight PSNR on the synthetic gate hovers near 0; a multiplicative
    band would be ~0.03 dB wide there.  The rule is a dB slack:
    max(0.5, 5%|exact|)."""
    best = dict(FALLBACK, graph_refresh_every=4)
    # exact relight -0.6: ship -0.9 is within the 0.5 dB slack...
    verdict, _ = _run(tmp_path, best, _gate(8.9, -0.9, exact_rel=-0.6))
    assert verdict["result"] == "ok_gated"
    # ...but ship -1.3 is not
    verdict, after = _run(tmp_path, best, _gate(8.9, -1.3, exact_rel=-0.6))
    assert verdict["result"] == "reverted_quality"
    assert after["graph_refresh_every"] == 1


def test_missing_ship_arm_reverts_non_fallback(tmp_path):
    best = dict(FALLBACK, conv_backend="slab")
    verdict, after = _run(tmp_path, best, {"exact": {"val": {}}})
    assert verdict["result"] == "reverted_no_gate_evidence"
    assert after["conv_backend"] == "pallas3"


def test_fallback_config_needs_no_ship_arm(tmp_path):
    verdict, after = _run(tmp_path, dict(FALLBACK), {})
    assert verdict["result"] == "ok_fallback_config"
    assert after["conv_backend"] == "pallas3"

"""Multi-host (2-process) training path over Gloo CPU collectives.

Verifies the SURVEY §2.7 multi-host mandate without multi-chip hardware:
two OS processes x 4 virtual CPU devices each form one (dp=2, sp=4)
global mesh; both run the full RNR sharded train step in lockstep;
process 0 owns every filesystem artifact.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_training(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "rnr_tpu.drivers.train_rnr",
            "--synthetic", "--platform", "cpu",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
            "--local_device_count", "4",
            "--mesh_devices", "8", "--mesh_dp", "2",
            "--batch_size", "2", "--img_size", "32",
            "--texture_size", "32", "--mipmap_level", "2",
            "--nf0", "8", "--texture_num_ch", "16", "--sh_lmax", "2",
            "--n_blocks", "4", "--kernel_size", "4",
            "--out_channels_gcn", "16",
            "--max_iter", "4", "--val_freq", "3", "--ckp_freq", "100",
            "--log_freq", "2",
            "--logging_root", str(tmp_path / f"logs{pid}"),
            "--sphere_samples_fp", "nonexistent.mat",
        ]
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        procs.append(
            subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # both processes computed the SAME replicated losses, in lockstep
    def losses(out):
        return [
            float(line.split("loss")[1].split()[0])
            for line in out.splitlines() if line.startswith("Iter ")
        ]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == 4
    np.testing.assert_allclose(l0, l1, rtol=1e-6)

    # process 0 owns the artifacts; process 1 wrote nothing
    runs0 = os.listdir(tmp_path / "logs0")
    assert len(runs0) == 1
    log_dir = tmp_path / "logs0" / runs0[0]
    with open(log_dir / "summary.json") as f:
        assert np.isfinite(json.load(f)["last_loss"])
    assert (log_dir / "model_final.ckpt").exists()
    assert os.listdir(log_dir / "val_out")
    assert not (tmp_path / "logs1").exists() or not os.listdir(
        tmp_path / "logs1"
    )

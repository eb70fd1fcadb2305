"""Multi-host (multi-process) runtime: 2 JAX processes over the distributed
runtime, global ('data','seq') mesh, cross-host chunk-halo transcode + DP
training (SURVEY.md §2.1, BASELINE.json "N>=2 hosts").

The heavy lifting lives in tools/multihost_probe.py (it must run in fresh
processes with their own JAX backends); this test drives it end-to-end.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "tools", "multihost_probe.py")


def test_two_process_transcode_and_train():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["AUDIODEC_MH_PORT"] = "23981"
    out = subprocess.run(
        [sys.executable, PROBE, "--nprocs", "2", "--devices-per-proc", "2"],
        env=env, capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost_probe: OK" in out.stdout

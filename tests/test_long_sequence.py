"""Scaled-down endurance gate (tools/long_sequence.py is the full 2,200-
frame artifact run): a 400-frame out-and-back sweep must keep tracking,
keep the async tail drained, and stay accurate — the failure modes long
runs expose (map-capacity growth, BoW growth, tail falling behind) bite
well before frame 400 when present."""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_long_sequence_400(tmp_path):
    out = tmp_path / "longrun.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "long_sequence.py"),
         "--frames", "400", "--out", str(out)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["ok_fraction"] > 0.9, res
    assert res["ate_rmse_7dof"] < 0.25, res
    # the tail must have kept up: whatever queued work remains at the end
    # drains in seconds, not minutes
    assert res["mapping_drain_s"] < 30.0, res
